"""Multimodal plumbing: binary columns, metadata, stubbed decode."""

from pyspark.sql import functions as F

from kats_spark.operators import multimodal


def _media_df(spark):
    rows = [
        (0, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"fakejpegdata"),
        (1, bytes([0x89, 0x50, 0x4E, 0x47]) + b"fakepngdata"),
        (2, b"RIFFxxxxWAVE"),
        (3, b"\x00plainbytes"),
    ]
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_metadata_mime_sniff(spark):
    out = {r.media_id: r for r in multimodal.attach_metadata(_media_df(spark)).collect()}
    assert out[0].mime == "image/jpeg"
    assert out[1].mime == "image/png"
    assert out[2].mime == "audio/wav"
    assert out[3].mime == "application/octet-stream"
    assert out[0].n_bytes == 16
    assert len(out[0].sha256) == 64


def test_decode_features_deterministic(spark):
    df = _media_df(spark)
    a = multimodal.decode_features(df).orderBy("media_id").collect()
    b = multimodal.decode_features(df).orderBy("media_id").collect()
    assert [r.features for r in a] == [r.features for r in b]
    assert all(len(r.features) == 8 for r in a)
    assert all(0.0 <= x <= 1.0 for r in a for x in r.features)


def _bmp_bytes(img, bottom_up=True):
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP with
    proper 4-byte row padding — ground truth built independently of the
    decoder."""
    import numpy as np

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * pad)  # RGB->BGR
    pixels = b"".join(rows)
    off = 14 + 40
    header = (
        b"BM" + (off + len(pixels)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixels


def _wav_bytes(samples, rate=16000, bits=16):
    """Encode an (n, ch) int array as PCM WAV."""
    import numpy as np

    n, ch = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = samples.astype(np.uint8).tobytes()
    block = ch * bits // 8
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def test_decode_image_bmp_real():
    """Real BMP decode: 3x5 image with row padding, both bottom-up and
    top-down, recovered pixel-exact."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    for bottom_up in (True, False):
        got = multimodal.decode_image_bytes(_bmp_bytes(img, bottom_up))
        assert got.shape == (3, 5, 3)
        assert np.array_equal(got, img), f"bottom_up={bottom_up}"


def test_decode_image_ppm_real():
    """Real PPM P6 decode, including a comment line in the header."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4, 2, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n2 4\n255\n" + img.tobytes()
    got = multimodal.decode_image_bytes(payload)
    assert np.array_equal(got, img)
    import pytest

    with pytest.raises(ValueError, match="JPEG"):
        multimodal.decode_image_bytes(b"\x89PNGfake")


def test_decode_audio_wav_real():
    """Real WAV decode: 16-bit stereo samples round-trip; 8-bit mono
    too; chunk walking skips a LIST chunk before data."""
    import numpy as np

    t = np.arange(64)
    stereo = np.column_stack(
        [(1000 * np.sin(t / 3)).astype(int), (500 * np.cos(t / 5)).astype(int)]
    )
    samples, rate, ch = multimodal.decode_audio_bytes(_wav_bytes(stereo))
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(samples, stereo)
    mono8 = np.arange(32, dtype=np.uint8).reshape(-1, 1)
    raw = _wav_bytes(mono8, rate=8000, bits=8)
    # splice a LIST chunk between fmt and data to exercise the walker
    head, data_chunk = raw[:36], raw[36:]
    raw2 = head + b"LIST" + (4).to_bytes(4, "little") + b"INFO" + data_chunk
    samples, rate, ch = multimodal.decode_audio_bytes(raw2)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(samples.ravel(), np.arange(32))


def test_decode_real_spark_stats(spark):
    """decode_real end-to-end through mapInPandas: image + audio +
    unsupported rows, stats match numpy ground truth."""
    import numpy as np

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    wav = np.column_stack([(np.arange(50) * 7 % 251).astype(int)])
    rows = [
        (1, _bmp_bytes(img)),
        (2, _wav_bytes(wav, rate=8000, bits=16)),
        (3, b"\xff\xd8\xffJPEGfake"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in multimodal.decode_real(df).collect()}
    assert out[1].kind == "image" and (out[1].width, out[1].height) == (4, 4)
    assert abs(out[1].v_mean - img.astype(float).mean()) < 1e-9
    assert abs(out[1].v_std - img.astype(float).std()) < 1e-9
    assert out[2].kind == "audio" and out[2].sample_rate == 8000
    assert abs(out[2].v_mean - wav.astype(float).mean()) < 1e-9
    assert out[2].n_values == 50
    assert out[3].kind == "unsupported" and out[3].v_mean is None


def test_resize_real_nearest_neighbor(spark):
    """resize_real: 2x2 -> 4x4 nearest-neighbor equals kron upsampling,
    re-encoded as a valid P6 that decode_image_bytes reads back."""
    import numpy as np

    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    df = spark.createDataFrame([(1, _bmp_bytes(img))], "media_id bigint, payload binary")
    row = multimodal.resize_real(df, 4, 4).collect()[0]
    back = multimodal.decode_image_bytes(bytes(row.resized))
    expect = img.repeat(2, axis=0).repeat(2, axis=1)
    assert back.shape == (4, 4, 3)
    assert np.array_equal(back, expect)


def test_frame_sample_spec(spark):
    df = _media_df(spark)
    frames = multimodal.frame_sample_spec(df, every_n=5)
    assert frames.count() == 20
    assert frames.groupBy("media_id").count().filter(F.col("count") != 5).count() == 0


def test_resize_stub_plumbing(spark):
    from pyspark.sql import functions as F

    from kats_spark.operators import multimodal

    df = spark.range(4).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
            "payload"
        ),
    )
    out = multimodal.resize(df, width=16, height=4).toPandas()
    assert len(out) == 4
    assert (out.resized.map(len) == 16 * 4).all()
    assert (out.width == 16).all() and (out.height == 4).all()
    # deterministic: same input -> same bytes
    again = multimodal.resize(df, width=16, height=4).toPandas()
    assert list(out.sort_values("media_id").resized) == list(
        again.sort_values("media_id").resized
    )


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + typ + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _make_png(img, ctype: int, filters) -> bytes:
    """Hand-build a PNG with a CHOSEN filter type per scanline — lets the
    tests exercise every branch of the un-filter (encode_png only emits
    filter 0)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = img[y].reshape(-1)
        ft = filters[y % len(filters)]
        if ft == 0:
            enc = line.copy()
        elif ft == 1:  # Sub
            enc = line.copy()
            enc[ch:] = line[ch:] - line[:-ch]
        elif ft == 2:  # Up
            enc = line - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.uint16), line[:-ch].astype(np.uint16)])
            enc = line - ((left + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:  # Paeth
            enc = line.copy()
            for x in range(0, w * ch, ch):
                a = line[x - ch : x].astype(np.int16) if x >= ch else np.zeros(ch, np.int16)
                b = p_row = prev[x : x + ch].astype(np.int16)
                c = prev[x - ch : x].astype(np.int16) if x >= ch else np.zeros(ch, np.int16)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                enc[x : x + ch] = line[x : x + ch] - pred.astype(np.uint8)
        raw += b"%c" % ft + enc.tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_all_filters():
    """encode_png -> decode round-trips bit-exactly, and hand-built PNGs
    using every filter type (None/Sub/Up/Average/Paeth) un-filter back
    to the source pixels — the full spec §9 surface."""
    import numpy as np

    from kats_spark.operators.multimodal import decode_image_bytes, encode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert (decode_image_bytes(encode_png(img)) == img).all()
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        payload = _make_png(img, ctype=2, filters=filters)
        assert (decode_image_bytes(payload) == img).all(), filters


def test_png_rgba_drops_alpha():
    import numpy as np

    from kats_spark.operators.multimodal import decode_image_bytes

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (6, 9, 4), dtype=np.uint8)
    payload = _make_png(rgba, ctype=6, filters=[0, 2, 4])
    assert (decode_image_bytes(payload) == rgba[:, :, :3]).all()


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    import numpy as np
    import pytest

    from kats_spark.operators.multimodal import decode_image_bytes

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    # palette color type
    with pytest.raises(ValueError, match="color_type"):
        decode_image_bytes(_make_png(img, ctype=3, filters=[0]))
    # corrupt IDAT
    good = _make_png(img, ctype=2, filters=[0])
    idat_at = good.index(b"IDAT")
    bad = good[: idat_at + 8] + b"\x00\x00" + good[idat_at + 10 :]
    with pytest.raises(ValueError):
        decode_image_bytes(bad)


def test_decode_real_handles_png(spark):
    """The decode_real Spark stage classifies PNG payloads as images
    with correct dims and pixel stats."""
    import numpy as np

    from kats_spark.operators import multimodal

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)]
    rows = [(i, bytearray(multimodal.encode_png(im))) for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = multimodal.decode_real(df).toPandas().sort_values("media_id")
    assert list(out.kind) == ["image"] * 3
    assert (out.width == 8).all() and (out.height == 8).all()
    for i, im in enumerate(imgs):
        got = out[out.media_id == i].iloc[0]
        v = im.astype(float).ravel()
        assert abs(got.v_mean - v.mean()) < 1e-9
        assert abs(got.v_std - v.std()) < 1e-9


def test_decode_real_counts_unsupported_not_errors(spark):
    """Real-corpus hazard payloads — progressive JPEG (SOF2), 16-bit PNG,
    truncated JPEG header, arithmetic-coded JPEG (SOF9) — surface as
    clean kind='unsupported' rows with null stats instead of failing the
    task (VERDICT r04 item #10)."""
    import struct
    import zlib

    import numpy as np

    from kats_spark.operators import multimodal
    from kats_spark.operators.jpeg import encode_jpeg

    base = encode_jpeg(np.full((16, 16, 3), 128, dtype=np.uint8), quality=90)

    def _with_sof(marker_byte):
        p = bytearray(base)
        p[p.index(b"\xff\xc0") + 1] = marker_byte
        return bytes(p)

    progressive = _with_sof(0xC2)
    arithmetic = _with_sof(0xC9)
    truncated = bytes(base[:7])  # SOI + half an APP0 header
    garbage_after_soi = b"\xff\xd8" + b"\x12\x34\x56"

    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (1 + 4 * 6))))
        + _png_chunk(b"IEND", b"")
    )

    good = multimodal.encode_png(np.full((4, 4, 3), 7, dtype=np.uint8))
    payloads = [progressive, arithmetic, truncated, garbage_after_soi, png16, good]
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = multimodal.decode_real(df).toPandas().sort_values("media_id")
    assert list(out.kind) == ["unsupported"] * 5 + ["image"]
    bad = out[out.kind == "unsupported"]
    for col in ("width", "height", "n_values", "v_mean"):
        assert bad[col].isna().all()
    ok = out[out.kind == "image"].iloc[0]
    assert ok.v_mean == 7.0 and ok.n_values == 48


def test_phash_invariance_and_discrimination():
    """phash64 kernel properties: identical under re-encoding (PPM vs PNG
    of the same pixels), stable under 2x upscale and mild noise (small
    hamming), far apart for unrelated images (large hamming)."""
    import numpy as np

    from kats_spark.operators import multimodal

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h = multimodal.phash64(img)
    # re-encode: PNG round-trip decodes to identical pixels -> same hash
    png = multimodal.decode_image_bytes(multimodal.encode_png(img))
    assert multimodal.phash64(png) == h
    # 2x nearest-neighbor upscale: same low-frequency content
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert ham(multimodal.phash64(up), h) <= 2
    # mild noise
    noisy = np.clip(
        img.astype(int) + rng.integers(-8, 9, size=img.shape), 0, 255
    ).astype(np.uint8)
    assert ham(multimodal.phash64(noisy), h) <= 10
    # unrelated image
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert ham(multimodal.phash64(other), h) >= 16


def test_phash_neardup_pairs_matches_bruteforce(spark):
    """phash_neardup_pairs (banded pigeonhole join) returns EXACTLY the
    pairs within max_hamming of each other — verified against the
    brute-force all-pairs hamming on the collected hashes — and null
    hashes (corrupt payloads) are excluded rather than erroring."""
    import numpy as np

    from kats_spark.operators import multimodal

    rng = np.random.default_rng(7)
    header = b"P6\n12 12\n255\n"
    payloads = []
    for i in range(12):
        img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
        payloads.append(header + img.tobytes())
        flip = img.copy()
        flip[0, 0, 0] ^= 1  # one-bit pixel change -> near-identical hash
        payloads.append(header + flip.tobytes())
    payloads.append(b"\xff\xd8broken")  # undecodable
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")

    got = (
        multimodal.phash_neardup_pairs(df, max_hamming=4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    fp = multimodal.image_phash(df).toPandas()
    assert fp.loc[fp.media_id == 24, "phash"].isna().all()
    hp = fp.dropna().astype({"phash": "int64"})
    expect = []
    hs = list(zip(hp.media_id, hp.phash))
    for i, (ida, ha) in enumerate(hs):
        for idb, hb in hs[i + 1:]:
            d = bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                a, b = sorted((int(ida), int(idb)))
                expect.append((a, b, d))
    expect.sort()
    assert [tuple(r) for r in got.itertuples(index=False)] == expect
    assert len(expect) >= 10  # the planted twins are found


def test_audio_features_sine_tone(spark):
    """audio_features recovers the physics of known signals: a pure
    440 Hz tone has spectral centroid ~440 Hz, tight bandwidth, rolloff
    at the tone, and ZCR = 2*f/rate; white noise has a much higher
    centroid and bandwidth; non-audio payloads degrade to
    kind='unsupported'."""
    import numpy as np

    from kats_spark.operators import multimodal

    rate, n = 8000, 4096

    def wav(samples8):
        return (
            b"RIFF" + (36 + len(samples8)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + rate.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
            + b"data" + len(samples8).to_bytes(4, "little") + bytes(samples8)
        )

    t = np.arange(n) / rate
    f0 = 437.5  # bin-aligned at n=4096 (bin 224) -> no spectral leakage
    tone = (127.5 + 100 * np.sin(2 * np.pi * f0 * t)).astype(np.uint8)
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, n, dtype=np.uint8)
    rows = [
        (0, bytearray(wav(tone))),
        (1, bytearray(wav(noise))),
        (2, bytearray(b"P6\n1 1\n255\nabc")),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = (
        multimodal.audio_features(df)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    tr = out.loc[0]
    assert tr.kind == "audio" and tr.sample_rate == rate and tr.n_samples == n
    assert abs(tr.spectral_centroid - f0) < 15
    assert tr.spectral_bandwidth < 200
    assert abs(tr.spectral_rolloff - f0) < 10
    assert abs(tr.zero_cross_rate - 2 * f0 / rate) < 0.01
    nz = out.loc[1]
    assert nz.spectral_centroid > 1000 and nz.spectral_bandwidth > 500
    assert out.loc[2].kind == "unsupported"
