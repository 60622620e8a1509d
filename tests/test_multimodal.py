"""Multimodal decode path: pure-NumPy PPM/BMP decoders (golden pixels),
truncation padding, and the Spark plumbing end-to-end with fake=False."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from minhashsketch_spark.operators import multimodal as MM


def _ppm(w, h, pixels: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def _bmp24(w, h, rgb: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP."""
    stride = (w * 3 + 3) & ~3
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    off = 54
    header = bytearray(off)
    header[0:2] = b"BM"
    header[2:6] = (off + data.size).to_bytes(4, "little")
    header[10:14] = off.to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    return bytes(header) + data.tobytes()


def test_ppm_decode_golden():
    px = bytes(range(2 * 2 * 3))
    got = MM.decode_ppm(_ppm(2, 2, px))
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got.reshape(-1), np.frombuffer(px, np.uint8))


def test_ppm_truncated_payload_zero_pads():
    got = MM.decode_ppm(_ppm(2, 2, b"\xff\xff"))
    flat = got.reshape(-1)
    assert list(flat[:2]) == [255, 255] and not flat[2:].any()


def test_bmp_decode_golden_roundtrip():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(3, 5, 3), dtype=np.uint8)
    got = MM.decode_bmp(_bmp24(5, 3, rgb))
    assert np.array_equal(got, rgb)


def test_decode_dispatch_and_stub():
    with pytest.raises(NotImplementedError):
        MM._decode_image(b"\x89PNG....", fake=False)
    fake = MM._decode_image(b"\x01\x02\x03", fake=True)
    assert np.array_equal(fake, np.array([1, 2, 3], np.uint8))


def test_extract_features_real_decode_spark(spark):
    rows = [(1, "image", _ppm(2, 2, bytes(range(12)))),
            (2, "image", _bmp24(2, 2, np.full((2, 2, 3), 200, np.uint8)))]
    media = spark.createDataFrame(rows, schema="media_id bigint, kind string, payload binary")
    got = {r["media_id"]: r for r in MM.extract_features(media, fake=False).collect()}
    h1 = np.bincount(np.arange(12, dtype=np.uint8) >> 2, minlength=64)
    assert list(got[1]["hist"]) == list(h1)
    assert got[2]["hist"][200 >> 2] == 12
    v = np.asarray(got[1]["feature"])
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_pcm16_decode_and_features():
    import struct

    samples = [0, 100, -100, 32767, -32768, 1]
    buf = struct.pack("<6h", *samples) + b"\x01"  # trailing odd byte dropped
    v = MM.decode_pcm16(buf)
    assert list(v) == samples
    # zero crossings between (100,-100), (-100,32767), (32767,-32768), (-32768,1)
    zc = ((v[:-1] < 0) != (v[1:] < 0)).sum()
    assert zc == 4


def test_resize_image_nearest():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = MM.resize_image(px, 3, 2)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 0], px[0, 0]) and np.array_equal(out[1, 2], px[2, 4])


def test_sample_frames():
    buf = bytes(range(10 * 4))  # 10 frames of 4 bytes
    frames = MM.sample_frames(buf, 4, every=3)
    assert frames == [bytes(range(0, 4)), bytes(range(12, 16)),
                      bytes(range(24, 28)), bytes(range(36, 40))]
    assert MM.sample_frames(buf + b"xx", 4, every=3)[0] == bytes(range(0, 4))


def test_audio_features_spark(spark):
    import struct

    clip = struct.pack("<4h", 10, -10, 20, 5)
    media = spark.createDataFrame([(1, "audio", clip)],
                                  schema="media_id bigint, kind string, payload binary")
    row = MM.audio_features(media).collect()[0]
    assert (row["n_samples"], row["energy"], row["n_zero_crossings"]) == (4, 625, 2)


def test_media_from_documents_builds_valid_ppm(spark):
    docs = spark.createDataFrame([(7, "hello world " * 30)], schema="doc_id bigint, text string")
    row = MM.media_from_documents(docs).collect()[0]
    px = MM.decode_ppm(bytes(row["payload"]))
    want = ("hello world " * 30).encode()[:MM.PPM_W * MM.PPM_H * 3]
    assert bytes(px.reshape(-1)[:len(want)]) == want


def test_feature_oracles_keep_empty_docs(spark, tmp_path):
    """ADVICE r2: the DuckDB oracles' unnest(range(...)) drops npix=0 /
    n=0 docs while Spark emits a row (zero-padded hist / (0,0,0) audio);
    pin both engines on a corpus that actually contains an empty doc."""
    import duckdb

    import __spark_entry__ as entry_mod

    docs = spark.createDataFrame(
        [(1, ""), (2, "abcd"), (3, "x" * 300)], schema="doc_id bigint, text string")
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    for name in ("multimodal_features", "audio_stats"):
        sdf = entry_mod.queries()[name](spark, str(tmp_path))
        scols = sdf.columns
        srows = sorted(tuple(r[c] for c in sorted(scols)) for r in sdf.collect())
        ores = con.execute(entry_mod.oracle_sql()[name]).fetchall()
        ocols = [d[0] for d in con.description]
        orows = sorted(tuple(r[ocols.index(c)] for c in sorted(ocols)) for r in ores)
        assert len(srows) == 3 == len(orows), f"{name}: empty doc dropped"
        assert srows == orows, f"{name}: engines disagree on empty-doc corpus"


# ---------------------------------------------------------------- JPEG

def _grad_img(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([60 + x * 2 + y, 100 + x, 80 + y * 2],
                    axis=2).astype(np.uint8)


@pytest.mark.parametrize("sub,ri", [("444", 0), ("444", 3),
                                    ("420", 0), ("420", 3)])
def test_jpeg_roundtrip_within_quantization_error(sub, ri):
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    img = _grad_img(37, 50)
    buf = encode_baseline_jpeg(img, subsampling=sub, restart_interval=ri)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = decode_baseline_jpeg(buf)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth content: error bounded by Annex-K quantization, not codec bugs
    assert err.max() <= 12 and err.mean() < 3.0


def test_jpeg_flat_image_is_exact_and_deterministic():
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    flat = np.full((16, 24, 3), 128, np.uint8)
    b1, b2 = encode_baseline_jpeg(flat), encode_baseline_jpeg(flat)
    assert b1 == b2  # same pixels -> same bytes
    assert np.abs(decode_baseline_jpeg(b1).astype(int) - 128).max() == 0


def test_jpeg_grayscale_and_error_paths():
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    g = ((np.add.outer(np.arange(20), np.arange(30))) % 180).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g))
    assert dec.shape == (20, 30, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 4
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x89PNG")
    # progressive (SOF2) is declared out of scope, not silently wrong
    buf = bytearray(encode_baseline_jpeg(g))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(buf))
    with pytest.raises(ValueError):  # truncated entropy data
        decode_baseline_jpeg(encode_baseline_jpeg(g)[:-40])


def test_extract_features_decodes_real_jpeg_spark(spark):
    """VERDICT r4 #6: extract_features handles a real JPEG fixture
    end-to-end (fake=False) — the Spark histogram equals the local decode's
    histogram exactly."""
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    img = _grad_img(24, 24)
    buf = encode_baseline_jpeg(img, subsampling="420", restart_interval=2)
    rows = [(1, "image", bytearray(buf))]
    media = spark.createDataFrame(
        rows, schema="media_id bigint, kind string, payload binary")
    got = MM.extract_features(media, fake=False).collect()[0]
    want = np.bincount(decode_baseline_jpeg(buf).reshape(-1) >> 2,
                       minlength=64)
    assert list(got["hist"]) == list(want)
    assert got["n_bytes"] == len(buf)


# ---------------------------------------------------------------- PNG

def _png_chunk(ctype, data):
    import struct
    import zlib

    body = ctype + data
    return (struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def test_png_roundtrip_lossless():
    from minhashsketch_spark.core.png import decode_png, encode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 21, 3), np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)  # exact
    g = rng.randint(0, 256, (9, 7), np.uint8)
    assert np.array_equal(decode_png(encode_png(g)),
                          np.repeat(g[:, :, None], 3, 2))


def test_png_all_five_filters_decode_exactly():
    """Forward-filter rows INDEPENDENTLY per the spec (one row per filter
    type 0-4) and require exact reconstruction — the encoder only emits
    filter 0, so this is the real unfilter coverage."""
    import struct
    import zlib

    from minhashsketch_spark.core.png import _SIG, decode_png

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (5, 6, 3), np.uint8).astype(int)
    ch, stride = 3, 18
    flat = px.reshape(5, stride)
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        raw.append(f)
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, int)
        for x in range(stride):
            left = row[x - ch] if x >= ch else 0
            ul = prev[x - ch] if x >= ch else 0
            v = {0: row[x], 1: row[x] - left, 2: row[x] - prev[x],
                 3: row[x] - ((left + prev[x]) >> 1),
                 4: row[x] - paeth(left, prev[x], ul)}[f]
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    buf = (_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), px.astype(np.uint8))


def test_png_palette_alpha_and_error_paths():
    import struct
    import zlib

    from minhashsketch_spark.core.png import _SIG, decode_png

    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    idx = rng.randint(0, 16, (4, 5), np.uint8)
    raw = bytearray()
    for y in range(4):
        raw.append(0)
        raw += idx[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0)
    buf = (_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", pal.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), pal[idx])

    rgba = rng.randint(0, 256, (3, 4, 4), np.uint8)
    raw = bytearray()
    for y in range(3):
        raw.append(0)
        raw += rgba[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0)
    buf = (_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), rgba[:, :, :3])

    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8 not png")
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 1)  # Adam7
    with pytest.raises(NotImplementedError):
        decode_png(_SIG + _png_chunk(b"IHDR", ihdr))


def test_extract_features_decodes_real_png_spark(spark):
    from minhashsketch_spark.core.png import encode_png

    img = _grad_img(10, 14)
    buf = encode_png(img)
    media = spark.createDataFrame([(1, "image", bytearray(buf))],
                                  "media_id bigint, kind string, payload binary")
    got = MM.extract_features(media, fake=False).collect()[0]
    want = np.bincount(img.reshape(-1) >> 2, minlength=64)  # lossless
    assert list(got["hist"]) == list(want)
