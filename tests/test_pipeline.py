# test_pipeline.py — end-to-end batched generation per rule leaf.
import numpy as np
import pytest

from reasoning_image_generation_tpu.utils.config import GenConfig, RULE_LEAVES
from reasoning_image_generation_tpu.models.rpm.pipeline import (
    LeafPipeline, sample_keys, seq_len_for)


@pytest.fixture(scope="module")
def cfg():
    # small canvas: pipeline logic is resolution-independent and the CPU
    # test mesh renders 16 frames per call
    return GenConfig(seed=42, batch_size=2, canvas_size=(128, 128))


@pytest.mark.parametrize("leaf", RULE_LEAVES)
def test_leaf_pipeline_runs(leaf, cfg):
    B = 2
    pipe = LeafPipeline(leaf, cfg)
    keys = sample_keys(42, np.arange(B))
    use_grid = np.asarray([False, True])
    out = pipe(keys, use_grid)
    L = seq_len_for(leaf)
    W, H = cfg.canvas_size
    assert out["state_imgs"].shape == (B, L, H, W, 3)
    assert out["option_imgs"].shape == (B, cfg.num_options, H, W, 3)
    assert out["grid_img"].shape == (B, pipe.layout.grid_h, W, 3)
    assert out["grid_img"].dtype == np.uint8

    # images are non-trivial (not all background)
    si = np.asarray(out["state_imgs"])
    assert (si < 250).mean() > 0.001

    # correct option image equals the last state image (pre-shuffle slot 0)
    perm = np.asarray(out["perm"])
    ci = np.asarray(out["correct_index"])
    for b in range(B):
        assert perm[b, ci[b]] == 0
        np.testing.assert_array_equal(
            np.asarray(out["option_imgs"])[b, ci[b]], si[b, L - 1])


def test_options_distinct(cfg):
    pipe = LeafPipeline("平移", cfg)
    keys = sample_keys(7, np.arange(4))
    out = pipe(keys, np.zeros(4, bool))
    opts = np.asarray(out["option_imgs"])
    for b in range(4):
        flat = opts[b].reshape(cfg.num_options, -1)
        for i in range(cfg.num_options):
            for j in range(i + 1, cfg.num_options):
                assert (flat[i] != flat[j]).any(), f"b={b} opts {i},{j} identical"


@pytest.mark.parametrize("leaf", ["翻转(镜像)", "单一遍历", "去同存异"])
def test_options_distinct_stress(leaf):
    """≥1k samples per small-candidate-space leaf: zero duplicate option
    pairs (VERDICT r1 item 4; reference uniqueness guarantee
    src/generator.py:444-509).  Structural hashes are the pipeline's own
    duplicate criterion, so pairwise-distinct hashes ⇒ distinct options."""
    import jax
    import jax.numpy as jnp
    from reasoning_image_generation_tpu.models.rpm.pipeline import (
        make_sample_fn, state_hash)

    cfg = GenConfig(seed=0, canvas_size=(64, 64))
    fn = make_sample_fn(leaf, cfg)
    B = 1024
    keys = sample_keys(0, np.arange(B))
    use_grid = jnp.asarray(np.arange(B) % 2 == 0)
    out = jax.jit(jax.vmap(fn))(keys, use_grid)
    h = np.asarray(jax.vmap(jax.vmap(state_hash))(out["options"]))  # [B, O]
    h = np.sort(h, axis=1)
    dup_rows = np.nonzero((h[:, 1:] == h[:, :-1]).any(axis=1))[0]
    assert dup_rows.size == 0, (
        f"{leaf}: duplicate option pairs in samples {dup_rows[:10]}")


def test_determinism(cfg):
    pipe = LeafPipeline("旋转", cfg)
    keys = sample_keys(5, np.arange(2))
    a = pipe(keys, np.zeros(2, bool))
    b = pipe(keys, np.zeros(2, bool))
    np.testing.assert_array_equal(np.asarray(a["grid_img"]),
                                  np.asarray(b["grid_img"]))


def test_grid_only_export(tmp_path):
    """--grid_only: only the composed grid + meta/coco reach disk; the
    per-frame images never leave the device."""
    import os
    from reasoning_image_generation_tpu.models.rpm.generator import (
        RPMGeneratorTPU)

    weights = {l: (1.0 if l == "平移" else 0.0) for l in RULE_LEAVES}
    c = GenConfig(out_dir=str(tmp_path), seed=3, batch_size=4,
                  canvas_size=(64, 64), max_elems=4, grid_only=True,
                  category_weights=weights)
    gen = RPMGeneratorTPU(c)
    metas = gen.generate(4)
    gen.close()
    assert len(metas) == 4
    for m in metas:
        assert os.path.exists(m["grid_path"])
        assert os.path.exists(os.path.join(m["sample_dir"], "meta.json"))
        assert not os.path.exists(
            os.path.join(m["sample_dir"], "state_0.png"))
        assert not os.path.exists(
            os.path.join(m["sample_dir"], "query.png"))


def test_overlay_merge_semantics(cfg):
    # 直接叠加: frame 2 must be the union of frames 0 and 1
    pipe = LeafPipeline("直接叠加", cfg)
    keys = sample_keys(9, np.arange(2))
    out = pipe(keys, np.zeros(2, bool))
    states = out["states"]
    n = np.asarray(states.valid.sum(-1))  # [B, L]
    for b in range(2):
        assert n[b, 2] == n[b, 0] + n[b, 1], f"frame2 != union: {n[b]}"
        assert n[b, 5] == n[b, 3] + n[b, 4], f"frame5 != union: {n[b]}"
