import numpy as np
import pytest

from dnscrawler_spark import codecs


def _img(seed=7, w=13, h=9):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(fmt):
    img = _img()
    out, got_fmt = codecs.decode(codecs.encode(img, fmt))
    assert got_fmt == fmt
    assert np.array_equal(out, img)
    assert codecs.payload_ok(codecs.encode(img, fmt), img)


def test_qjpg_psnr_above_40db():
    img = _img(seed=3, w=32, h=32)
    out, fmt = codecs.decode(codecs.encode(img, "qjpg"))
    assert fmt == "qjpg"
    assert out.shape == img.shape
    p = codecs.psnr(img, out)
    assert p >= 40.0, p
    assert codecs.payload_ok(codecs.encode(img, "qjpg"), img)


def test_payload_ok_rejects_wrong_reference():
    img, other = _img(seed=1), _img(seed=2)
    assert not codecs.payload_ok(codecs.encode(img, "raw"), other)


def test_qjpg_smaller_than_raw():
    img = _img(seed=5, w=24, h=24)
    assert len(codecs.encode(img, "qjpg")) < len(codecs.encode(img, "raw"))
