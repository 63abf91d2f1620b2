# test_io.py — PNG backends round-trip identically.
import numpy as np
import pytest


def _img():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), np.uint8)
    img[10:30, 10:30] = 255  # flat region exercises the filters
    return img


def test_fastpng_roundtrip(tmp_path):
    from reasoning_image_generation_tpu.io.native import write_png
    import cv2
    img = _img()
    p = str(tmp_path / "a.png")
    write_png(p, img)
    back = cv2.imread(p)[..., ::-1]
    np.testing.assert_array_equal(back, img)


def test_zlib_fallback_roundtrip(tmp_path):
    from reasoning_image_generation_tpu.io.png import encode_png_zlib
    import cv2
    img = _img()
    p = str(tmp_path / "b.png")
    with open(p, "wb") as f:
        f.write(encode_png_zlib(img))
    back = cv2.imread(p)[..., ::-1]
    np.testing.assert_array_equal(back, img)


def test_write_png_dispatch(tmp_path):
    from reasoning_image_generation_tpu.io.png import write_png
    import cv2
    img = _img()
    p = str(tmp_path / "c.png")
    write_png(p, img)
    back = cv2.imread(p)[..., ::-1]
    np.testing.assert_array_equal(back, img)


def test_fastpng_speed_sanity(tmp_path):
    # not a benchmark, just ensures the native path handles a 512x512 quickly
    import time
    from reasoning_image_generation_tpu.io.native import write_png
    img = np.zeros((512, 512, 3), np.uint8)
    t0 = time.time()
    for i in range(5):
        write_png(str(tmp_path / f"s{i}.png"), img)
    assert time.time() - t0 < 5.0
