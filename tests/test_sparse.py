# test_sparse.py — lossless sparse transfer codec.
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.ops.sparse import (
    pack_frame, pack_batch, unpack_frame)


def _img(seed=0, cover=0.15, H=64, W=64):
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 255, np.uint8)
    n = int(H * W * cover)
    ys = rng.integers(0, H, n)
    xs = rng.integers(0, W, n)
    img[ys, xs] = rng.integers(0, 255, (n, 3))
    return img


def test_roundtrip_exact():
    img = _img(0)
    budget = 64  # all 64 blocks of a 64x64 frame
    mask, vals, count = pack_frame(jnp.asarray(img), budget)
    back = unpack_frame(np.asarray(mask), np.asarray(vals), int(count),
                        (64, 64))
    np.testing.assert_array_equal(back, img)


def test_roundtrip_all_background():
    img = np.full((32, 32, 3), 255, np.uint8)
    mask, vals, count = pack_frame(jnp.asarray(img), 16)
    assert int(count) == 0
    back = unpack_frame(np.asarray(mask), np.asarray(vals), 0, (32, 32))
    np.testing.assert_array_equal(back, img)


def test_overflow_detected():
    img = _img(1, cover=0.9)
    budget = 5  # far below the nonempty-block population
    mask, vals, count = pack_frame(jnp.asarray(img), budget)
    assert int(count) > budget
    try:
        unpack_frame(np.asarray(mask), np.asarray(vals), int(count), (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_pack_batch_leading_dims():
    imgs = np.stack([np.stack([_img(i * 2 + j) for j in range(3)])
                     for i in range(2)])  # [2, 3, H, W, 3]
    mask, vals, count = pack_batch(jnp.asarray(imgs), 64)
    assert mask.shape[:2] == (2, 3) and vals.shape[:2] == (2, 3)
    for i in range(2):
        for j in range(3):
            back = unpack_frame(np.asarray(mask[i, j]), np.asarray(vals[i, j]),
                                int(count[i, j]), (64, 64))
            np.testing.assert_array_equal(back, imgs[i, j])


def test_generator_end_to_end_with_sparse(tmp_path):
    # the default config path exercises the codec through the generator
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    import cv2, os
    cfg = GenConfig(out_dir=str(tmp_path), seed=2, batch_size=2,
                    canvas_size=(128, 128), sparse_transfer=True,
                    transfer_codec="sparse")
    gen = RPMGeneratorTPU(cfg)
    metas = gen.generate(2)
    gen.close()
    img = cv2.imread(os.path.join(metas[0]["sample_dir"], "state_0.png"))
    assert img is not None and (img < 250).any()
