# test_rle.py — lossless RLE transfer codecs (ops/rle.py).
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.ops.rle import (
    pack_frame_rle, pack_batch_rle, unpack_frame_rle, default_budget,
    pack_frame_rle2, pack_batch_rle2, unpack_frame_rle2, U16_RUN)


def _img(seed=0, n_rects=6, H=64, W=64):
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 255, np.uint8)
    for _ in range(n_rects):
        y, x = rng.integers(0, H - 8), rng.integers(0, W - 8)
        h, w = rng.integers(4, 16), rng.integers(4, 16)
        img[y:y + h, x:x + w] = rng.integers(0, 255, 3)
    return img


def test_roundtrip_exact():
    img = _img(0)
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 2048)
    back = unpack_frame_rle(np.asarray(starts), np.asarray(colors),
                            int(count), (64, 64))
    np.testing.assert_array_equal(back, img)


def test_roundtrip_all_background():
    img = np.full((32, 32, 3), 255, np.uint8)
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 64)
    assert int(count) == 1  # one run covering the whole canvas
    back = unpack_frame_rle(np.asarray(starts), np.asarray(colors),
                            int(count), (32, 32))
    np.testing.assert_array_equal(back, img)


def test_overflow_detected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)  # ~1 run per pixel
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 128)
    assert int(count) > 128
    try:
        unpack_frame_rle(np.asarray(starts), np.asarray(colors), int(count),
                         (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_pack_batch_leading_dims():
    imgs = np.stack([np.stack([_img(i * 3 + j) for j in range(3)])
                     for i in range(2)])  # [2, 3, H, W, 3]
    starts, colors, count = pack_batch_rle(jnp.asarray(imgs), 2048)
    assert starts.shape[:2] == (2, 3) and colors.shape[:2] == (2, 3)
    for i in range(2):
        for j in range(3):
            back = unpack_frame_rle(np.asarray(starts[i, j]),
                                    np.asarray(colors[i, j]),
                                    int(count[i, j]), (64, 64))
            np.testing.assert_array_equal(back, imgs[i, j])


def test_default_budget_monotone():
    assert default_budget(512, 512) == 512 * 512 // 24
    assert default_budget(8, 8) == 1024  # floor


# ---- v2 codec: u16 length + u8 RGB (5 bytes/run) ----

def test_rle2_roundtrip_exact():
    img = _img(0)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 2048)
    assert ln.dtype == jnp.uint16 and co.dtype == jnp.uint8
    back = unpack_frame_rle2(np.asarray(ln), np.asarray(co),
                             int(count), (64, 64))
    np.testing.assert_array_equal(back, img)


def test_rle2_long_run_split():
    # a uniform 300x512 frame has one 153600-px run; the encoder must
    # split it at U16_RUN boundaries so every length fits u16
    img = np.full((300, 512, 3), 7, np.uint8)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 64)
    n = 300 * 512
    assert int(count) == -(-n // U16_RUN)
    ln, co = np.asarray(ln), np.asarray(co)
    assert ln[:int(count)].sum() == n
    back = unpack_frame_rle2(ln, co, int(count), (300, 512))
    np.testing.assert_array_equal(back, img)


def test_rle2_overflow_detected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 128)
    assert int(count) > 128
    try:
        unpack_frame_rle2(np.asarray(ln), np.asarray(co), int(count),
                          (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_rle2_truncated_stream_detected():
    # a stream sliced below its count must fail the length-sum check, not
    # silently produce a short image
    img = _img(2)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 2048)
    ln, co = np.asarray(ln).copy(), np.asarray(co)
    ln[int(count) - 1] = 0  # corrupt: total no longer H*W
    try:
        unpack_frame_rle2(ln, co, int(count), (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_rle2_batch_matches_frame():
    imgs = np.stack([_img(i) for i in range(4)])
    ln, co, count = pack_batch_rle2(jnp.asarray(imgs), 2048)
    for i in range(4):
        back = unpack_frame_rle2(np.asarray(ln[i]), np.asarray(co[i]),
                                 int(count[i]), (64, 64))
        np.testing.assert_array_equal(back, imgs[i])


def test_generator_end_to_end_with_rle(tmp_path):
    # transfer_codec defaults to 'rle'; the full generator path must
    # reconstruct frames bit-exactly vs a raw-transfer run
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    import cv2, os
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    metas = {}
    for out, sparse in ((out_a, True), (out_b, False)):
        cfg = GenConfig(out_dir=out, seed=2, batch_size=2,
                        canvas_size=(128, 128), sparse_transfer=sparse)
        gen = RPMGeneratorTPU(cfg)
        metas[out] = gen.generate(2)
        gen.close()
    for ma, mb in zip(metas[out_a], metas[out_b]):
        ia = cv2.imread(os.path.join(ma["sample_dir"], "state_0.png"))
        ib = cv2.imread(os.path.join(mb["sample_dir"], "state_0.png"))
        assert ia is not None and (ia < 250).any()
        np.testing.assert_array_equal(ia, ib)
        ga = cv2.imread(ma["grid_path"])
        gb = cv2.imread(mb["grid_path"])
        np.testing.assert_array_equal(ga, gb)


# ---- rle2p (palette-indexed runs) ----

def test_rle2p_roundtrip_exact():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_frame_rle2p, unpack_frame_rle2p)
    img = _img(3)
    ln, idx, pal, nc, cnt = pack_frame_rle2p(jnp.asarray(img), 2048)
    back = unpack_frame_rle2p(np.asarray(ln), np.asarray(idx),
                              np.asarray(pal), int(nc), int(cnt), (64, 64))
    np.testing.assert_array_equal(back, img)


def test_rle2p_matches_rle2_runs():
    """Palette lookup reproduces the rle2 color stream bit-for-bit (the C
    PNG encoder is fed the converted stream, so this IS PNG parity)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_frame_rle2, pack_frame_rle2p, rle2p_to_rle2)
    img = _img(4, n_rects=10)
    ln2, rgb2, cnt2 = pack_frame_rle2(jnp.asarray(img), 2048)
    ln, idx, pal, nc, cnt = pack_frame_rle2p(jnp.asarray(img), 2048)
    assert int(cnt) == int(cnt2)
    ln_c, rgb_c = rle2p_to_rle2(np.asarray(ln), np.asarray(idx),
                                np.asarray(pal), int(nc), int(cnt))
    np.testing.assert_array_equal(ln_c, np.asarray(ln2)[: int(cnt2)])
    np.testing.assert_array_equal(rgb_c, np.asarray(rgb2)[: int(cnt2)])


def test_rle2p_palette_sorted_unique():
    from reasoning_image_generation_tpu.ops.rle import pack_frame_rle2p
    img = _img(5)
    _ln, _idx, pal, nc, _cnt = pack_frame_rle2p(jnp.asarray(img), 2048)
    pal = np.asarray(pal)[: int(nc)].astype(np.uint32)
    p32 = (pal[:, 0] << 16) | (pal[:, 1] << 8) | pal[:, 2]
    assert np.all(np.diff(p32.astype(np.int64)) > 0)  # strictly ascending
    # every color the image actually uses appears
    img_cols = np.unique(
        (img[..., 0].astype(np.uint32) << 16)
        | (img[..., 1].astype(np.uint32) << 8) | img[..., 2])
    assert set(img_cols.tolist()) == set(p32.tolist())


def test_rle2p_color_overflow_detected():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_frame_rle2p, unpack_frame_rle2p)
    rng = np.random.default_rng(7)
    # >256 distinct colors across runs
    img = np.repeat(rng.integers(0, 255, (20, 20, 3), np.uint8),
                    3, axis=1)  # 20x60, ~400 runs distinct colors
    ln, idx, pal, nc, cnt = pack_frame_rle2p(jnp.asarray(img), 2048)
    assert int(nc) > 256
    try:
        unpack_frame_rle2p(np.asarray(ln), np.asarray(idx), np.asarray(pal),
                           int(nc), int(cnt), (20, 60))
        raise AssertionError("expected OverflowError")
    except OverflowError:
        pass


def test_rle2p_batch_matches_frame():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_frame_rle2p, pack_batch_rle2p)
    imgs = np.stack([_img(i) for i in range(4)]).reshape(2, 2, 64, 64, 3)
    ln, idx, pal, nc, cnt = pack_batch_rle2p(jnp.asarray(imgs), 1024)
    assert ln.shape == (2, 2, 1024) and idx.shape == (2, 2, 1024)
    assert pal.shape == (2, 2, 256, 3) and nc.shape == (2, 2)
    for i in range(2):
        for j in range(2):
            l1, x1, p1, n1, c1 = pack_frame_rle2p(
                jnp.asarray(imgs[i, j]), 1024)
            np.testing.assert_array_equal(np.asarray(ln[i, j]),
                                          np.asarray(l1))
            np.testing.assert_array_equal(np.asarray(idx[i, j]),
                                          np.asarray(x1))
            np.testing.assert_array_equal(np.asarray(pal[i, j]),
                                          np.asarray(p1))
            assert int(nc[i, j]) == int(n1) and int(cnt[i, j]) == int(c1)
