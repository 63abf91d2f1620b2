# test_mesh.py — multi-chip sharding on the virtual 8-device CPU mesh.
import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from reasoning_image_generation_tpu.utils.config import GenConfig
from reasoning_image_generation_tpu.models.rpm.pipeline import (
    make_sample_fn, sample_keys)
from reasoning_image_generation_tpu.ops.phash import phash
from reasoning_image_generation_tpu.parallel.mesh import (
    make_mesh, shard_batch, sharded_dedup_mask)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def test_sharded_generation_step():
    n_dev = 8
    B = 2 * n_dev
    cfg = GenConfig(seed=0, canvas_size=(64, 64), max_elems=4)
    sample_fn = make_sample_fn("平移", cfg)
    mesh = make_mesh(n_dev)
    shard = NamedSharding(mesh, P("data"))

    def gen_step(keys, use_grid):
        out = jax.vmap(sample_fn)(keys, use_grid)
        # render only the final frame per sample for the dedup stage
        from reasoning_image_generation_tpu.ops.raster import render_frame
        last = jax.tree.map(lambda a: a[:, -1], out["rframes"])
        imgs = jax.vmap(lambda s, g: render_frame(s, 64, 64, use_grid=g))(
            last, use_grid)
        hashes = jax.vmap(phash)(imgs)
        return imgs, hashes

    keys = jax.device_put(sample_keys(0, np.arange(B)), shard)
    use_grid = jax.device_put(np.zeros(B, bool), shard)
    gen = jax.jit(gen_step, in_shardings=(shard, shard),
                  out_shardings=(shard, shard))
    imgs, hashes = gen(keys, use_grid)
    # outputs stay sharded over the data axis
    assert imgs.sharding.spec == P("data")
    assert imgs.shape == (B, 64, 64, 3)

    keep = np.asarray(sharded_dedup_mask(mesh, hashes, threshold=4))
    assert keep.shape == (B,)
    assert keep[0]

    # sharded result equals the single-device result
    imgs1, hashes1 = jax.jit(gen_step)(sample_keys(0, np.arange(B)),
                                       np.zeros(B, bool))
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs1))


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(8)
    arr = np.arange(16 * 3).reshape(16, 3).astype(np.float32)
    sharded = shard_batch(mesh, {"a": arr})["a"]
    assert sharded.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(sharded), arr)


def test_hybrid_mesh_and_host_sharding():
    import jax
    import numpy as np
    from reasoning_image_generation_tpu.parallel.mesh import (
        make_hybrid_mesh, host_shard_ids, distributed_init, shard_batch)
    from jax.sharding import PartitionSpec as P, NamedSharding

    distributed_init()  # single-process no-op
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("host", "data")
    assert mesh.devices.shape == (1, 8)  # 8-device CPU test mesh, 1 process
    # a (host, data)-sharded batch compiles and executes
    x = np.arange(16.0).reshape(16, 1)
    y = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda a: a * 2)(y)
    assert np.allclose(np.asarray(out), x * 2)
    # strided host shards partition ids exactly
    ids = list(range(10))
    shards = [host_shard_ids(ids, process_index=i, process_count=3)
              for i in range(3)]
    assert sorted(sum(shards, [])) == ids
    assert shards[0] == [0, 3, 6, 9]
    assert host_shard_ids(ids) == ids  # this process sees everything
