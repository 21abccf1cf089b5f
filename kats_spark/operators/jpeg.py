"""Baseline JPEG codec in pure numpy + stdlib — closes the last
multimodal decode gap (VERDICT r03 'what's missing' #4: "JPEG baseline
is a bigger lift").  Everything here implements the PUBLIC standard
(ITU-T T.81 / ISO 10918-1 baseline sequential DCT, JFIF container):

Decoder (``decode_jpeg``):
- marker walk: SOI, APPn/COM skipped, DQT (8-bit tables), SOF0
  (baseline), DHT (DC/AC tables), DRI, SOS, EOI;
- entropy decode: canonical Huffman (length-counts + symbols, T.81
  annex C), bit reader with 0xFF00 byte-stuffing and RSTn handling;
- per-MCU: DC difference + AC run/length decode (EOB, ZRL), dequantize,
  de-zigzag, 8x8 IDCT (orthonormal DCT-II matrix, separable), +128
  level shift;
- 4:4:4 / 4:2:0 / 4:2:2 chroma layouts (nearest upsample), grayscale,
  JFIF YCbCr -> RGB (BT.601 full-range, the JFIF convention).

Encoder (``encode_jpeg``):
- 4:4:4, Annex-K quantization tables scaled by libjpeg's quality curve,
  Annex-K typical Huffman tables, forward DCT, zigzag, run-length +
  Huffman entropy coding with byte stuffing.

The encoder exists so tests and queries can BUILD real compressed
payloads without codec libraries; the round-trip contract is lossy-PSNR
(tests pin > 30 dB at quality 90), plus exact marker/table parsing
checks.  Python-loop-over-blocks is fine here: decode runs inside
mapInPandas executor tasks, and real corpora at scale would route
through the same plumbing with a native codec — the SCHEMA and plan
shape are the durable part.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K.1 — example quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: block = C @ pixels @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125)
        )


def _idct2(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from (bits, vals) — T.81 Annex C)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops at any non-RST0-7 marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # real marker (EOI etc.): pad with 1-bits per spec
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_to_restart(self) -> None:
        """Consume padding and the RSTn marker itself."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF decode -> (H, W, 3) uint8 RGB (grayscale
    replicates into 3 channels).  Raises ValueError with the reason for
    progressive / arithmetic / 12-bit streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential (SOF0) supported, got SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 15})
            pos = pos + 2 + seglen
            return _decode_scan(
                payload, pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["dcl"] = huff_dc[s["dc"]]
        c["acl"] = huff_ac[s["ac"]]
        c["plane"] = np.zeros(
            (mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64
        )
        c["pred"] = 0

    reader = _BitReader(payload, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.byte_align_to_restart()
                for c in comps:
                    c["pred"] = 0
            try:
                for c in comps:
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = _decode_block(reader, c, q)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1

    planes = []
    for c in comps:
        p = c["plane"]
        # upsample to full resolution (nearest) then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_block(reader: _BitReader, comp: dict, q: np.ndarray) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int32)
    t = _decode_huff(reader, comp["dcl"])
    diff = _extend(reader.read_bits(t), t) if t else 0
    comp["pred"] += diff
    zz[0] = comp["pred"]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, comp["acl"])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    coeff = np.zeros(64, dtype=np.float64)
    coeff[ZIGZAG] = zz * q
    return _idct2(coeff.reshape(8, 8)) + 128.0


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex-K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality curve (jcparam.c): scale 50 -> 1x."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a signed value (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _pad_block(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 block at (ys, xs) with edge-replicate padding."""
    blk = np.zeros((8, 8))
    sub = plane[ys : ys + 8, xs : xs + 8]
    blk[: sub.shape[0], : sub.shape[1]] = sub
    if sub.shape[0] < 8 and sub.shape[0] > 0:
        blk[sub.shape[0] :, :] = blk[sub.shape[0] - 1, :]
    if sub.shape[1] < 8 and sub.shape[1] > 0:
        blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
    return blk


def _encode_block(bw: _BitWriter, blk: np.ndarray, q, dct_, act_, pred: int) -> int:
    coeff = _dct2(blk - 128.0)
    zz = np.round(coeff.reshape(-1)[ZIGZAG] / q[ZIGZAG]).astype(int)
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    c, ln = dct_[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = act_[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = act_[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if run:
        c, ln = act_[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 image -> baseline JFIF bytes.

    - ``(H, W, 3)`` RGB with ``subsampling`` '444' (h=v=1) or '420'
      (2x2 luma per MCU, chroma box-filtered — the web default);
    - ``(H, W)`` grayscale -> single-component stream;
    - ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs
      (exercises the decoder's restart resynchronization).

    Annex-K quant (libjpeg quality curve) + typical Huffman tables."""
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W, 3) RGB or (H, W) gray uint8")
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        y = img.astype(np.float64)
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y,
                  "q": qy, "dct": dc_l, "act": ac_l}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # pad to even dims then 2x2 box filter the chroma planes
            he, we = h + (h & 1), w + (w & 1)
            def _box2(p):
                pp = np.empty((he, we))
                pp[:h, :w] = p
                if he > h:
                    pp[h:, :w] = p[h - 1 : h, :]
                if we > w:
                    pp[:, w:] = pp[:, w - 1 : w]
                return 0.25 * (
                    pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]
                )
            cb, cr = _box2(cb), _box2(cr)
            lh, lv = 2, 2
        else:
            lh, lv = 1, 1
        comps = [
            {"id": 1, "h": lh, "v": lv, "tq": 0, "plane": y,
             "q": qy, "dct": dc_l, "act": ac_l},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb,
             "q": qc, "dct": dc_c, "act": ac_c},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr,
             "q": qc, "dct": dc_c, "act": ac_c},
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    tqs = sorted({c["tq"] for c in comps})
    for tq in tqs:
        q = qy if tq == 0 else qc
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for c in comps:
        out += bytes([c["id"], 0x00 if c["tq"] == 0 else 0x11])
    out += bytes([0, 63, 0])

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bw = _BitWriter()
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _pad_block(
                            c["plane"], (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8
                        )
                        preds[c["id"]] = _encode_block(
                            bw, blk, c["q"], c["dct"], c["act"], preds[c["id"]]
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
