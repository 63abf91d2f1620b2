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


def _rle_encode(im):
    flat = ((im[..., 0].astype(np.uint32) << 16)
            | (im[..., 1].astype(np.uint32) << 8)
            | im[..., 2].astype(np.uint32)).reshape(-1)
    b = np.ones(flat.shape, bool)
    b[1:] = flat[1:] != flat[:-1]
    b |= (np.arange(flat.size) % 65535) == 0
    idx = np.nonzero(b)[0]
    lengths = np.diff(np.append(idx, flat.size)).astype(np.uint16)
    colors = np.stack([(flat[idx] >> 16) & 255, (flat[idx] >> 8) & 255,
                       flat[idx] & 255], -1).astype(np.uint8)
    return lengths, colors, len(idx)


def test_write_png_rle_indexed(tmp_path):
    # few distinct colors -> the C encoder emits an indexed (PLTE) PNG;
    # decoded pixels must be bit-exact
    from reasoning_image_generation_tpu.io.png import write_png_rle
    import cv2
    img = np.full((80, 96, 3), 255, np.uint8)
    img[10:40, 5:60] = [10, 200, 50]
    img[50:55, :] = [0, 0, 0]
    ln, co, n = _rle_encode(img)
    p = str(tmp_path / "idx.png")
    write_png_rle(p, ln, co, n, 80, 96)
    with open(p, "rb") as f:
        data = f.read()
    assert b"PLTE" in data
    back = cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1]
    np.testing.assert_array_equal(back, img)


def test_write_png_rle_truecolor(tmp_path):
    # >256 distinct colors -> truecolor path
    from reasoning_image_generation_tpu.io.png import write_png_rle
    import cv2
    img = _img()  # random = thousands of colors
    ln, co, n = _rle_encode(img)
    p = str(tmp_path / "tc.png")
    write_png_rle(p, ln, co, n, 64, 96)
    with open(p, "rb") as f:
        assert b"PLTE" not in f.read()
    back = cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1]
    np.testing.assert_array_equal(back, img)


def test_write_png_rle_overflow_and_truncation(tmp_path):
    from reasoning_image_generation_tpu.io.png import write_png_rle
    img = _img()
    ln, co, n = _rle_encode(img)
    p = str(tmp_path / "bad.png")
    with pytest.raises(OverflowError):
        write_png_rle(p, ln[: n // 2], co[: n // 2], n, 64, 96)
    # length-sum mismatch within capacity falls back to the decode path,
    # which raises OverflowError too
    ln2 = ln.copy()
    ln2[n - 1] = 0
    with pytest.raises(OverflowError):
        write_png_rle(p, ln2, co, n, 64, 96)


def test_write_png_rle_matches_write_png(tmp_path):
    from reasoning_image_generation_tpu.io.png import write_png, write_png_rle
    import cv2
    img = _img()
    ln, co, n = _rle_encode(img)
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    write_png(pa, img)
    write_png_rle(pb, ln, co, n, 64, 96)
    np.testing.assert_array_equal(cv2.imread(pa), cv2.imread(pb))


def test_write_png_rle_overlay_matches_numpy_blend(tmp_path):
    """The C overlay blend must be bit-identical to apply_overlay_u8 —
    that identity is what lets the composed grid travel pre-overlay
    (fewer runs) while raw overflow frames blend on device."""
    from reasoning_image_generation_tpu.io.png import write_png_rle
    from reasoning_image_generation_tpu.ops.compose import apply_overlay_u8
    import cv2
    rng = np.random.default_rng(3)
    img = np.full((60, 80, 3), 255, np.uint8)
    img[10:40, 5:60] = [10, 200, 50]
    ov_rgb = rng.integers(0, 255, (60, 80, 3), np.uint8)
    ov_a = np.zeros((60, 80), np.uint8)
    ov_a[0:5] = 255                      # opaque band
    ov_a[20:25] = rng.integers(1, 255, (5, 80), np.uint8)  # AA-style band
    ln, co, n = _rle_encode(img)
    p = str(tmp_path / "ov.png")
    write_png_rle(p, ln, co, n, 60, 80, overlay=(ov_rgb, ov_a))
    back = cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1]
    expect = apply_overlay_u8(img, ov_rgb, ov_a)
    np.testing.assert_array_equal(back, expect)


def test_fastpng_speed_sanity(tmp_path):
    # not a benchmark, just ensures the native path handles a 512x512 quickly
    import time
    from reasoning_image_generation_tpu.io.native import write_png
    img = np.zeros((512, 512, 3), np.uint8)
    t0 = time.time()
    for i in range(5):
        write_png(str(tmp_path / f"s{i}.png"), img)
    assert time.time() - t0 < 5.0
