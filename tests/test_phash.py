# test_phash.py — perceptual hash + dedup semantics.
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.ops.phash import (
    phash_batch, hamming_matrix, dedup_keep_mask, dedup_images)


def _noise_img(seed, shift=0):
    rng = np.random.default_rng(seed)
    img = np.full((64, 64, 3), 255, np.uint8)
    # a few random rectangles
    for _ in range(4):
        x, y = rng.integers(0, 40, 2)
        w, h = rng.integers(8, 20, 2)
        c = rng.integers(0, 255, 3)
        img[y + shift:y + h + shift, x:x + w] = c
    return img


def test_identical_images_hash_equal():
    a = _noise_img(0)
    h = np.asarray(phash_batch(np.stack([a, a.copy()])))
    assert (h[0] == h[1]).all()


def test_near_duplicate_close_distinct_far():
    a = _noise_img(0)
    b = _noise_img(0, shift=1)    # 1px shift: near-duplicate
    c = _noise_img(99)            # different content
    h = np.asarray(phash_batch(np.stack([a, b, c])))
    d = np.asarray(hamming_matrix(h))
    assert d[0, 1] <= 6, f"near-dup distance {d[0,1]}"
    assert d[0, 2] > 10, f"distinct distance {d[0,2]}"
    assert (np.diag(d) == 0).all()


def test_dedup_keep_mask_greedy():
    a = _noise_img(1)
    batch = np.stack([a, a.copy(), _noise_img(2), a.copy(), _noise_img(3)])
    _, keep = dedup_images(batch, threshold=4)
    keep = np.asarray(keep)
    assert keep[0] and not keep[1] and keep[2] and not keep[3] and keep[4]


def test_sharded_dedup_matches_single_device():
    import jax
    from reasoning_image_generation_tpu.parallel.mesh import (
        make_mesh, sharded_dedup_mask)
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    imgs = np.stack([_noise_img(i % 3) for i in range(16)])
    h = phash_batch(imgs)
    ref_mask = np.asarray(dedup_keep_mask(h, threshold=4))
    mesh = make_mesh(8)
    got = np.asarray(sharded_dedup_mask(mesh, h, threshold=4))
    np.testing.assert_array_equal(ref_mask, got)


def test_dedup_append_step_matches_host_corpus():
    """The device-resident corpus walk (one async step per batch,
    ops/phash.dedup_append_step) must make the same keep decisions as the
    host-buffer path (dedup_keep_mask_vs_corpus + host append), including
    batch-padding exclusion."""
    import jax.numpy as jnp
    from reasoning_image_generation_tpu.ops.phash import (
        dedup_append_step, dedup_keep_mask_vs_corpus)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (6, 8), np.uint8)
    batches = []
    for _ in range(4):
        h = base[rng.integers(0, 6, 8)].copy()
        flip = (rng.random((8, 8)) < 0.05).astype(np.uint8)
        batches.append(h ^ flip)
    n_valid = [8, 8, 5, 8]  # third batch carries 3 padding rows

    corpus_dev = jnp.zeros((64, 8), jnp.uint8)
    count_dev = jnp.int32(0)
    host_buf = np.zeros((64, 8), np.uint8)
    host_count = 0
    for h, nv in zip(batches, n_valid):
        keep_dev, corpus_dev, count_dev = dedup_append_step(
            corpus_dev, count_dev, jnp.asarray(h), np.int32(nv),
            threshold=4)
        ref = np.asarray(dedup_keep_mask_vs_corpus(
            jnp.asarray(host_buf), np.int32(host_count), jnp.asarray(h),
            threshold=4))[:nv]
        np.testing.assert_array_equal(np.asarray(keep_dev)[:nv], ref)
        assert not np.asarray(keep_dev)[nv:].any()
        for i in range(nv):
            if ref[i]:
                host_buf[host_count] = h[i]
                host_count += 1
    assert int(count_dev) == host_count
    np.testing.assert_array_equal(
        np.asarray(corpus_dev)[:host_count], host_buf[:host_count])


def test_corpus_dedup_device_vs_mesh_paths():
    """CorpusDedup (the streaming helper both generators share) must give
    identical keep decisions on the device-resident path (mesh=None) and
    the mesh/host path."""
    from reasoning_image_generation_tpu.ops.phash import CorpusDedup
    from reasoning_image_generation_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (5, 8), np.uint8)
    batches = [base[rng.integers(0, 5, 8)].copy() ^
               (rng.random((8, 8)) < 0.04).astype(np.uint8)
               for _ in range(3)]

    dev = CorpusDedup(24, mesh=None, threshold=4)
    mesh = CorpusDedup(24, mesh=make_mesh(), threshold=4)
    for h in batches:
        hd = jnp.asarray(h)
        kd = dev.resolve(dev.submit(hd, 8))
        km = mesh.resolve(mesh.submit(hd, 8))
        np.testing.assert_array_equal(kd, km)
    assert int(dev._count_dev) == mesh._count


def test_corpus_dedup_padding_never_kept():
    from reasoning_image_generation_tpu.ops.phash import CorpusDedup
    rng = np.random.default_rng(3)
    h = rng.integers(0, 256, (8, 8), np.uint8)
    c = CorpusDedup(16, mesh=None, threshold=0)
    keep = c.resolve(c.submit(jnp.asarray(h), 5))
    assert keep.shape == (5,)
    # resubmitting the same batch: all 5 live rows are now duplicates
    keep2 = c.resolve(c.submit(jnp.asarray(h), 5))
    assert not keep2.any()
