"""Baseline JPEG codec: round-trip accuracy bounds, determinism,
conformance against a libjpeg-produced file, honest rejection of
profiles outside baseline sequential, and the MJPEG AVI integration."""

import os

import numpy as np
import pytest

from window_aggregation_spark.operators.jpeg_codec import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + y * 5) % 200, (x * 2 + y * 7) % 200, (x + y) % 200],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(6, 8), (8, 8), (13, 17), (32, 24)])
def test_roundtrip_smooth_within_quant_error(shape):
    img = _smooth(*shape)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0
    assert err.max() <= 40  # isolated ringing at gradient wraps


def test_roundtrip_noise_bounded():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 8.0  # noise is JPEG's worst case, still bounded


def test_quality_monotonic_in_size_and_error():
    img = _smooth(24, 24)
    sizes, errs = [], []
    for q in (50, 75, 95):
        b = encode_jpeg_baseline(img, quality=q)
        sizes.append(len(b))
        errs.append(
            np.abs(decode_jpeg_baseline(b).astype(int) - img.astype(int)).mean()
        )
    assert sizes == sorted(sizes)
    assert errs == sorted(errs, reverse=True)


def test_deterministic_bytes():
    img = _smooth(16, 16)
    assert encode_jpeg_baseline(img, 85) == encode_jpeg_baseline(img, 85)


def test_grayscale_roundtrip():
    g = _smooth(16, 16)[:, :, 0]
    dec = decode_jpeg_baseline(encode_jpeg_baseline(g, quality=95))
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 3.0
    # gray replicates to 3 identical channels
    assert (dec[:, :, 0] == dec[:, :, 1]).all()


def test_progressive_rejected_by_name():
    img = _smooth(8, 8)
    b = bytearray(encode_jpeg_baseline(img))
    i = b.find(b"\xFF\xC0")
    b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="C2"):
        decode_jpeg_baseline(bytes(b))


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"PNG....")


_LIBJPEG_DIR = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata"
)


@pytest.mark.skipif(
    not os.path.exists(f"{_LIBJPEG_DIR}/python.jpg"),
    reason="no libjpeg-produced sample on this machine",
)
def test_decodes_libjpeg_420_file_against_ppm_truth():
    """Conformance against an EXTERNAL encoder: a libjpeg-written 4:2:0
    file (sampling 0x22 luma — exercises the generic-sampling MCU loop
    and chroma upsample) must decode to within JPEG quantization
    distance of the lossless PPM twin shipped next to it."""
    jpg = decode_jpeg_baseline(open(f"{_LIBJPEG_DIR}/python.jpg", "rb").read())
    raw = open(f"{_LIBJPEG_DIR}/python.ppm", "rb").read()
    head = raw.split(b"\n", 3)
    assert head[0] == b"P6"
    w, h = map(int, head[1].split())
    px = np.frombuffer(head[3][: w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    assert jpg.shape == (h, w, 3)
    luma_t = px.astype(float) @ np.array([0.299, 0.587, 0.114])
    luma_d = jpg.astype(float) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(luma_t - luma_d).mean() < 5.0


def test_pil_cross_decode_when_available():
    """Interop: PIL (libjpeg) must decode our encoder's output to the
    same pixels our decoder sees (skips where PIL is absent)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = _smooth(24, 16)
    b = encode_jpeg_baseline(img, quality=90)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(b)).convert("RGB"))
    ours = decode_jpeg_baseline(b)
    # IDCT/rounding differences only: tiny
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2
