# test_misc.py — small edge-path coverage.
import os

import numpy as np

from reasoning_image_generation_tpu.utils.config import (
    GenConfig, category_leaves, DEFAULT_CATEGORIES, RULE_LEAVES)


def test_category_leaves_matches_taxonomy():
    leaves = category_leaves(DEFAULT_CATEGORIES)
    names = [l[-1] for l in leaves]
    assert names == list(RULE_LEAVES)
    # full paths preserved
    assert ["图形相似", "位置变换", "平移"] in leaves
    assert ["图形相异", "图形遍历", "位置遍历"] in leaves


def test_zero_weight_excludes_leaf(tmp_path):
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    w = {l: 0.0 for l in RULE_LEAVES}
    w["单一遍历"] = 1.0
    cfg = GenConfig(out_dir=str(tmp_path), seed=0, category_weights=w)
    gen = RPMGeneratorTPU(cfg)
    groups = gen._sample_assignments(list(range(50)))
    gen.close()
    assert set(groups.keys()) == {"单一遍历"}
    assert sum(len(v) for v in groups.values()) == 50


def test_assignments_deterministic(tmp_path):
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    cfg = GenConfig(out_dir=str(tmp_path), seed=11)
    g1 = RPMGeneratorTPU(cfg)
    a = g1._sample_assignments([0, 1, 2, 3])
    b = g1._sample_assignments([0, 1, 2, 3])
    g1.close()
    assert {k: v for k, v in a.items()} == {k: v for k, v in b.items()}


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp
    from reasoning_image_generation_tpu.utils.profiling import trace
    d = str(tmp_path / "prof")
    with trace(d):
        jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    assert os.path.isdir(d) and os.listdir(d)


def test_png_grayscale_input(tmp_path):
    import cv2
    from reasoning_image_generation_tpu.io.png import write_png, encode_png_zlib
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "g.png")
    write_png(p, gray)
    back = cv2.imread(p)
    assert (back[..., 0] == gray).all()
    # zlib fallback handles gray too
    raw = encode_png_zlib(gray)
    p2 = str(tmp_path / "g2.png")
    open(p2, "wb").write(raw)
    assert (cv2.imread(p2)[..., 0] == gray).all()


def test_tier_refreeze_self_heals(tmp_path, monkeypatch):
    """Self-healing transfer tiers (round-4 VERDICT item 6): a stream whose
    frozen tier pathologically undershoots (poisoned-low run stats here)
    overflows to raw-frame fallbacks for at most TIER_REFREEZE_AFTER
    batches (+1 batch of software-pipeline lag), then re-freezes at the
    observed demand and recovers to packed transfers for the rest of the
    run instead of paying ~raw fetches per frame forever."""
    # isolated stats store: the REAL persisted store carries stats for
    # leaves other runs generated; this run only generates 平移, so a
    # poisoned stat for any other leaf could never heal (and the key scan
    # below would pick those leaves up)
    from reasoning_image_generation_tpu.utils import cache
    monkeypatch.setattr(cache, "cache_dir", lambda: str(tmp_path))
    from reasoning_image_generation_tpu.models.rpm.generator import (
        RPMGeneratorTPU, TIER_REFREEZE_AFTER)
    from reasoning_image_generation_tpu.utils.config import RULE_LEAVES
    w = {l: 0.0 for l in RULE_LEAVES}
    w["平移"] = 1.0
    cfg = GenConfig(out_dir=str(tmp_path), seed=3, batch_size=4,
                    canvas_size=(64, 64), max_elems=4, category_weights=w,
                    sparse_transfer=True)
    gen = RPMGeneratorTPU(cfg)
    # one clean run so the true per-frame run demand is in _run_stats
    gen.generate_ids(list(range(4)))
    keys = [k for k in gen._run_stats if ":state_imgs_packed:T" in k]
    assert keys, "expected state-stream run stats after a warm batch"
    # poison: pretend run demand is near-zero, so the tier frozen at the
    # next generate_ids entry undershoots and every state frame overflows
    for k in keys:
        gen._run_stats[k] = 0.1
    n_batches = 2 * TIER_REFREEZE_AFTER + 4
    metas = gen.generate_ids(
        list(range(100, 100 + n_batches * cfg.batch_size)))
    gen.close()
    assert all(not m.get("error") for m in metas)
    assert gen.overflow_events, "poisoned tier must overflow first"
    assert gen.tiers_refrozen >= 1, "tier must re-freeze mid-run"
    # the final 2 batches must be clean (refreeze fires after
    # TIER_REFREEZE_AFTER consecutive overflows; +1 batch already in
    # flight when it fires)
    late = [o for o, _ in gen.overflow_events if o > gen._batch_ordinal - 2]
    assert not late, f"overflow persisted to the end: {gen.overflow_events}"
    # the healed tier is remembered for the NEXT run's freeze too
    assert all(gen._run_stats[k] > 1 for k in keys)
