"""Property-based codec coverage (hypothesis): PNG round-trip is LOSSLESS
for arbitrary pixels; JPEG round-trip is error-bounded on smooth content
and never crashes on arbitrary uint8 images; WARC framing round-trips
arbitrary payload bytes. Complements the fixed-vector tests in
test_multimodal.py / test_warc.py."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _img(draw, max_side=40, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    shape = (h, w, channels) if channels else (h, w)
    return rng.randint(0, 256, shape, np.uint8)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_img())
def test_png_roundtrip_lossless_property(img):
    from minhashsketch_spark.core.png import decode_png, encode_png

    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_img(channels=0))
def test_png_roundtrip_gray_property(img):
    from minhashsketch_spark.core.png import decode_png, encode_png

    assert np.array_equal(decode_png(encode_png(img)),
                          np.repeat(img[:, :, None], 3, 2))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_img(max_side=24), st.sampled_from(["444", "420"]),
       st.sampled_from([0, 2]))
def test_jpeg_never_crashes_and_shape_preserved(img, sub, ri):
    """Arbitrary (even noisy) pixels: decode(encode(x)) must return the
    right shape and stay within the value domain — numerical closeness is
    only promised for smooth content (quantization), but structural
    correctness is unconditional."""
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, subsampling=sub, restart_interval=ri))
    assert dec.shape == img.shape
    assert dec.dtype == np.uint8


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 12), st.integers(0, 2**31 - 1))
def test_jpeg_smooth_gradient_error_bounded(scale, seed):
    from minhashsketch_spark.core.jpeg import (decode_baseline_jpeg,
                                               encode_baseline_jpeg)

    rng = np.random.RandomState(seed)
    h, w = rng.randint(8, 33), rng.randint(8, 33)
    y, x = np.mgrid[0:h, 0:w]
    base = rng.randint(40, 120, 3)
    img = np.stack([(base[c] + (x + y) * scale // 4).clip(0, 255)
                    for c in range(3)], axis=2).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24


@settings(max_examples=25, deadline=None)
@given(st.lists(st.binary(max_size=400), min_size=0, max_size=5),
       st.booleans())
def test_warc_roundtrip_arbitrary_payloads(payloads, compress):
    from minhashsketch_spark.sources.warc import (_http_split, _maybe_gunzip,
                                                  parse_warc_records,
                                                  write_warc_bytes)

    pages = [(f"https://h.example/{i}", "2021-01-01T00:00:00Z", p)
             for i, p in enumerate(payloads)]
    raw = _maybe_gunzip(write_warc_bytes(pages, compress=compress))
    recs = [r for r in parse_warc_records(raw)
            if r["headers"]["warc-type"] == "response"]
    assert [_http_split(r["payload"]) for r in recs] == payloads
