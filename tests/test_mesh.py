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


def test_production_generator_mesh_parity(tmp_path):
    """generate_ids on the 8-device mesh is bit-identical to single-device.

    Covers VERDICT r1 item 2: the production generator must actually ride
    the mesh (sharded keys, sharded pipeline, sharded corpus dedup), and do
    so without changing a single output byte."""
    import json
    from pathlib import Path
    from reasoning_image_generation_tpu.models.rpm.generator import (
        RPMGeneratorTPU)

    ids = list(range(10))  # batch_size 8 -> one full batch + ragged tail

    def run(use_mesh, sub):
        cfg = GenConfig(out_dir=str(tmp_path / sub), seed=7,
                        canvas_size=(64, 64), batch_size=8, max_elems=4,
                        use_mesh=use_mesh)
        gen = RPMGeneratorTPU(cfg)
        if use_mesh == "auto":
            assert gen.mesh is not None and gen.mesh.size == 8
        else:
            assert gen.mesh is None
        metas = gen.generate_ids(ids, dedup=True, dedup_threshold=4)
        gen.close()
        return metas, Path(cfg.out_dir)

    m_single, d_single = run(False, "single")
    m_mesh, d_mesh = run("auto", "mesh")

    # identical metadata (paths + wall-clock timestamps normalized),
    # incl. identical dedup decisions
    def norm(metas, root):
        import re
        s = json.dumps(metas, ensure_ascii=False, sort_keys=True)
        s = re.sub(r"\d{4}-\d{2}-\d{2}T[0-9:.+]+", "<t>", s)
        return s.replace(str(root), "<out>")

    assert norm(m_mesh, d_mesh) == norm(m_single, d_single)

    # every exported image byte-identical
    files_single = sorted(p.relative_to(d_single)
                          for p in d_single.rglob("*.png"))
    files_mesh = sorted(p.relative_to(d_mesh) for p in d_mesh.rglob("*.png"))
    assert files_single == files_mesh and files_single
    for rel in files_single:
        assert (d_single / rel).read_bytes() == (d_mesh / rel).read_bytes(), rel


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
