"""Real video containers: MJPEG-in-AVI and Y4M (YUV4MPEG2) frame sampling.

The reference treats media as opaque blobs; a training-data pipeline needs
frame sampling as a first-class distributed op (decode N-th frames of each
video, emit per-frame features).  Both containers here are decodable with
zero external libraries:

- **AVI / MJPEG** — a RIFF form (the same chunk grammar as WAV): ``avih``
  carries frame count / dimensions / frame period, the ``movi`` LIST holds
  one complete baseline-JPEG image per ``00dc`` chunk.  Frames decode
  through :mod:`kats_spark.operators.jpeg` (pure-numpy T.81 sequential
  DCT).
- **Y4M** — a one-line ASCII header (``YUV4MPEG2 W.. H.. F<num>:<den>
  .. Cmono``) followed by ``FRAME\n`` + raw plane bytes per frame.  The
  uncompressed interchange format used by codec toolchains; ``Cmono``
  keeps one Y plane per frame.

Scale shape: frame sampling is per-blob work — ONE ``mapInPandas`` pass,
no shuffle, no payload duplication.  Sampling happens INSIDE the kernel
(seek to the n-th chunk) rather than exploding (media_id, frame_idx) rows
and re-joining payloads, which would copy each multi-MB blob once per
sampled frame through a shuffle.  On a real cluster the only knobs that
matter are input-split size vs blob size (one task ~ a few blobs) and the
Arrow batch size; both are scan-level settings, not plan changes.

Reference surface (behavioral, not code): the reference has no video
support at all; this extends the multimodal column family
(``operators/multimodal.py``) the way its TimeSeriesData extends pandas.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.operators.jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "encode_y4m",
    "decode_y4m_meta",
    "encode_avi_mjpeg",
    "decode_video_meta",
    "sample_frames",
    "frame_sample",
]


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2), Cmono
# --------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode ``frames`` (n, h, w) uint8 as a mono Y4M stream."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


def _parse_y4m_header(payload: bytes) -> tuple[dict, int]:
    nl = payload.index(b"\n")
    fields = payload[:nl].split(b" ")
    if fields[0] != b"YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    meta = {"fps_num": 25, "fps_den": 1, "colour": "420"}
    for f in fields[1:]:
        if not f:
            continue
        tag, val = f[:1], f[1:]
        if tag == b"W":
            meta["width"] = int(val)
        elif tag == b"H":
            meta["height"] = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            meta["fps_num"], meta["fps_den"] = int(num), int(den)
        elif tag == b"C":
            meta["colour"] = val.decode("ascii")
    if "width" not in meta or "height" not in meta:
        raise ValueError("Y4M header missing W/H")
    return meta, nl + 1


def _y4m_frame_size(meta: dict) -> int:
    w, h = meta["width"], meta["height"]
    c = meta["colour"]
    if c.startswith("mono"):
        return w * h
    if c.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2))
    if c.startswith("422"):
        return w * h + 2 * ((w // 2) * h)
    if c.startswith("444"):
        return 3 * w * h
    raise ValueError(f"unsupported Y4M colourspace {c}")


def decode_y4m_meta(payload: bytes) -> dict:
    """Container metadata without decoding frames: width/height/fps/n_frames."""
    meta, pos = _parse_y4m_header(payload)
    fsz = _y4m_frame_size(meta)
    n = 0
    while pos < len(payload):
        nl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        pos = nl + 1 + fsz
        n += 1
    meta["n_frames"] = n
    return meta


def _iter_y4m_frames(payload: bytes) -> Iterator[tuple[int, np.ndarray, dict]]:
    meta, pos = _parse_y4m_header(payload)
    fsz = _y4m_frame_size(meta)
    w, h = meta["width"], meta["height"]
    # our encoder's frame marker is the bare 6-byte "FRAME\n"; frames with
    # parameters would make this an estimate, corrected by the final idx
    meta["n_frames"] = (len(payload) - pos) // (6 + fsz)
    idx = 0
    while pos < len(payload):
        nl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        body = payload[nl + 1 : nl + 1 + fsz]
        if len(body) < fsz:
            raise ValueError("truncated Y4M frame")
        # luma plane only — chroma subsampling differs per colourspace but
        # the Y plane is always first and full-resolution
        y = np.frombuffer(body[: w * h], dtype=np.uint8).reshape(h, w)
        yield idx, y, meta
        pos = nl + 1 + fsz
        idx += 1


# --------------------------------------------------------------------------
# AVI / MJPEG (RIFF)
# --------------------------------------------------------------------------

def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded baseline-JPEG frames in a minimal spec-correct AVI."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE (benign)
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes,
                      0xFFFFFFFF, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk_avi(payload: bytes) -> tuple[dict, list[tuple[int, int]]]:
    """Return (meta, [(offset, size)] of 00dc frame chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    meta: dict = {}
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<10I", payload, body)
                meta["fps_num"] = 1_000_000
                meta["fps_den"] = vals[0] or 40_000
                meta["n_frames"] = vals[4]
                meta["width"] = vals[8]
                meta["height"] = vals[9]
            elif fourcc in (b"00dc", b"00db"):
                frames.append((body, size))
            pos = body + size + (size % 2)

    walk(12, len(payload))
    if "width" not in meta:
        raise ValueError("AVI missing avih header")
    return meta, frames


def decode_video_meta(payload: bytes) -> dict:
    """Dispatch on magic: container metadata for AVI or Y4M."""
    raw = bytes(payload)
    if raw[:9] == b"YUV4MPEG2":
        m = decode_y4m_meta(raw)
        m["container"] = "y4m"
        return m
    m, frames = _walk_avi(raw)
    m["n_frames"] = len(frames)  # trust the index over the header
    m["container"] = "avi"
    return m


def sample_frames(
    payload: bytes, every_n: int = 1, max_frames: int | None = None
) -> Iterator[tuple[int, np.ndarray, dict]]:
    """Yield (frame_idx, luma ndarray (h, w), meta) for every ``every_n``-th
    frame.  AVI frames decode their JPEG and convert to luma via the
    BT.601 integer transform the codec itself uses; Y4M yields the stored
    Y plane directly.  Seeks straight to sampled chunks — unsampled frames
    are never decoded."""
    raw = bytes(payload)
    emitted = 0
    if raw[:9] == b"YUV4MPEG2":
        for idx, y, meta in _iter_y4m_frames(raw):
            if idx % every_n:
                continue
            yield idx, y, meta
            emitted += 1
            if max_frames is not None and emitted >= max_frames:
                return
        return
    meta, frames = _walk_avi(raw)
    for idx in range(0, len(frames), every_n):
        off, size = frames[idx]
        rgb = decode_jpeg(raw[off : off + size]).astype(np.int32)
        # same fixed-point BT.601 luma as the encoder's forward transform,
        # so an exact-subspace round trip stays exact
        y = (77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2] + 128) >> 8
        yield idx, y.astype(np.uint8), meta
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


# --------------------------------------------------------------------------
# Distributed operator
# --------------------------------------------------------------------------

FRAME_SAMPLE_SCHEMA = (
    "media_id bigint, container string, frame_idx int, n_frames int, "
    "width int, height int, fps double, y_mean double, y_std double, "
    "y_min double, y_max double"
)


def frame_sample(
    df: DataFrame,
    every_n: int = 2,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int | None = None,
) -> DataFrame:
    """Per-frame luma stats for every ``every_n``-th frame of each video.

    One narrow ``mapInPandas`` pass (see module docstring for why sampling
    lives inside the kernel).  Undecodable payloads emit a single
    container='unsupported' row so corrupt blobs are countable, not
    silently dropped."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [c.split(" ")[0] for c in FRAME_SAMPLE_SCHEMA.split(", ")]
        names[0] = id_col
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for idx, y, meta in sample_frames(
                        bytes(payload), every_n=every_n, max_frames=max_frames
                    ):
                        v = y.astype(np.float64).ravel()
                        rows.append(
                            (mid, "y4m" if "colour" in meta else "avi",
                             idx, meta.get("n_frames"),
                             meta["width"], meta["height"],
                             meta["fps_num"] / meta["fps_den"],
                             float(v.mean()), float(v.std()),
                             float(v.min()), float(v.max()))
                        )
                except (ValueError, IndexError, struct.error):
                    rows.append((mid, "unsupported", None, None, None, None,
                                 None, None, None, None, None))
            yield pd.DataFrame(rows, columns=names)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA.replace("media_id", id_col)
    )


def make_test_video_avi(seed_codes: list[int], width: int = 16,
                        height: int = 16, fps: int = 25) -> bytes:
    """Deterministic exact-subspace MJPEG AVI: one uniform-gray frame per
    seed code, v = 128 + 3*((code % 33) - 16) — the quality-90 baseline
    JPEG round-trips these bit-exactly (DC divisible by the quantizer,
    zero AC, neutral chroma), so frame stats are oracle-computable."""
    frames = []
    for code in seed_codes:
        v = 128 + 3 * ((code % 33) - 16)
        img = np.full((height, width, 3), v, dtype=np.uint8)
        frames.append(encode_jpeg(img, quality=90))
    return encode_avi_mjpeg(frames, width, height, fps=fps)
