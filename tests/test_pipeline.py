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


def test_determinism(cfg):
    pipe = LeafPipeline("旋转", cfg)
    keys = sample_keys(5, np.arange(2))
    a = pipe(keys, np.zeros(2, bool))
    b = pipe(keys, np.zeros(2, bool))
    np.testing.assert_array_equal(np.asarray(a["grid_img"]),
                                  np.asarray(b["grid_img"]))


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
