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
