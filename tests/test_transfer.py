# test_transfer.py — single-blob coalescing + host buffer ring.
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.io.transfer import (
    coalesce, blob_specs, split_blob, unpack_images, HostBufferRing,
    coalesce_shrunk, shrunk_specs, transfer_tier, overflow_pixels)


def test_coalesce_split_roundtrip_mixed_dtypes():
    tree = {
        "f": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
        "i": jnp.arange(8, dtype=jnp.int32).reshape(4, 2),
        "b": jnp.asarray([[True], [False], [True], [True]]),
        "u": jnp.arange(4 * 5, dtype=jnp.uint8).reshape(4, 5),
        "nested": {"x": jnp.ones((4, 2, 2), jnp.uint32) * 7},
    }
    leaves, treedef, specs = blob_specs(tree)
    blob = np.asarray(coalesce(leaves))
    assert blob.dtype == np.uint8 and blob.shape[0] == 4
    back = split_blob(blob, treedef, specs)
    for k in ("f", "i", "b", "u"):
        np.testing.assert_array_equal(back[k], np.asarray(tree[k]))
        assert back[k].dtype == np.asarray(tree[k]).dtype
    np.testing.assert_array_equal(back["nested"]["x"],
                                  np.asarray(tree["nested"]["x"]))


def test_buffer_ring_reuses_and_flags_wrap():
    ring = HostBufferRing(slots=2)
    a, w1 = ring.acquire((2, 3))
    b, w2 = ring.acquire((2, 3))
    assert not w1 and not w2 and a is not b
    c, w3 = ring.acquire((2, 3))
    d, w4 = ring.acquire((2, 3))
    assert w3 and w4
    assert c is a and d is b  # round-robin reuse
    other, w5 = ring.acquire((4, 4))
    assert not w5 and other.shape == (4, 4)


def test_transfer_tier():
    assert transfer_tier(None, 8192) is None          # no stats yet
    assert transfer_tier(1000, 8192) == 1536          # 1.2x + slack, /512
    assert transfer_tier(100, 8192) == 512
    assert transfer_tier(8000, 8192) is None          # no shrink worthwhile
    # monotone in max_seen
    tiers = [transfer_tier(s, 1 << 20) for s in range(100, 20000, 37)]
    assert all(a <= b for a, b in zip(tiers, tiers[1:]))


def test_coalesce_shrunk_roundtrip():
    # packed-style tree: (lengths [B, R], colors [B, R, 3], count [B]),
    # shrunk on the run axis; decode of under-capacity frames is exact
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, unpack_frame_rle2)
    imgs = np.full((3, 16, 16, 3), 255, np.uint8)
    imgs[0, 2:6, 3:9] = [10, 20, 30]
    imgs[2, 0:4, 0:4] = [200, 100, 50]
    packed = pack_batch_rle2(jnp.asarray(imgs), 64)
    leaves, treedef, _ = blob_specs(packed)
    sizes = ((-1, 16), (-2, 16), None)
    blob = np.asarray(coalesce_shrunk(leaves, sizes))
    specs = shrunk_specs(leaves, sizes)
    assert specs[0][0] == (3, 16) and specs[1][0] == (3, 16, 3)
    ln, co, cnt = split_blob(blob, treedef, specs)
    for i in range(3):
        back = unpack_frame_rle2(ln[i], co[i], int(cnt[i]), (16, 16))
        np.testing.assert_array_equal(back, imgs[i])


def test_coalesce_shrunk_overflow_falls_back():
    # a frame whose true count exceeds the shrunken capacity must be
    # detected on decode and served by overflow_pixels from the raw frames
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, unpack_frame_rle2)
    rng = np.random.default_rng(0)
    imgs = np.full((2, 16, 16, 3), 255, np.uint8)
    imgs[1] = rng.integers(0, 255, (16, 16, 3), np.uint8)  # dense frame
    packed = pack_batch_rle2(jnp.asarray(imgs), 512)
    leaves, treedef, _ = blob_specs(packed)
    sizes = ((-1, 8), (-2, 8), None)
    blob = np.asarray(coalesce_shrunk(leaves, sizes))
    ln, co, cnt = split_blob(blob, treedef, shrunk_specs(leaves, sizes))
    assert int(cnt[1]) > 8
    try:
        unpack_frame_rle2(ln[1], co[1], int(cnt[1]), (16, 16))
        assert False, "expected OverflowError"
    except OverflowError:
        pass
    over = overflow_pixels((ln, co, cnt), jnp.asarray(imgs), 2)
    assert set(over) == {1}
    np.testing.assert_array_equal(over[1], imgs[1])
    back0 = unpack_frame_rle2(ln[0], co[0], int(cnt[0]), (16, 16))
    np.testing.assert_array_equal(back0, imgs[0])


def test_unpack_images_into_ring_buffer():
    from reasoning_image_generation_tpu.ops.rle import pack_batch_rle
    rng = np.random.default_rng(0)
    imgs = np.full((3, 16, 16, 3), 255, np.uint8)
    imgs[0, 2:6, 3:9] = [10, 20, 30]
    imgs[2, 0:4, 0:4] = [200, 100, 50]
    packed = pack_batch_rle(jnp.asarray(imgs), 64)
    ring = HostBufferRing()
    buf, _ = ring.acquire(imgs.shape)
    out = unpack_images(tuple(np.asarray(p) for p in packed),
                        jnp.asarray(imgs), "rle", out=buf)
    assert out is buf
    np.testing.assert_array_equal(out, imgs)
