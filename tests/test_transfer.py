# test_transfer.py — single-blob coalescing + host buffer ring.
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.io.transfer import (
    coalesce, blob_specs, split_blob, unpack_images, HostBufferRing)


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
