# test_warmup.py — the no-transfer warmup path used by bench.py.
import numpy as np

from reasoning_image_generation_tpu.utils.config import GenConfig
from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU


def test_warmup_compiles_without_export(tmp_path):
    w = {l: 0.0 for l in ("旋转", "翻转(镜像)", "组合", "直接叠加",
                          "去同存异", "去异存同", "单一遍历", "位置遍历")}
    w["平移"] = 1.0
    cfg = GenConfig(out_dir=str(tmp_path), seed=3, batch_size=2,
                    canvas_size=(128, 128), category_weights=w)
    gen = RPMGeneratorTPU(cfg)
    gen.warmup([0, 1])
    # no files were written (warmup must not export)
    import os
    assert os.listdir(os.path.join(str(tmp_path), "samples")) == []
    assert os.listdir(os.path.join(str(tmp_path), "grids")) == []
    # the pipeline is now compiled: generation reuses it
    metas = gen.generate(2)
    gen.close()
    assert len(metas) == 2 and all(m["rule"] == "平移" for m in metas)


def test_measure_device_rate(tmp_path):
    w = {l: 0.0 for l in ("旋转", "翻转(镜像)", "组合", "直接叠加",
                          "去同存异", "去异存同", "单一遍历", "位置遍历")}
    w["平移"] = 1.0
    cfg = GenConfig(out_dir=str(tmp_path), seed=3, batch_size=2,
                    canvas_size=(128, 128), category_weights=w)
    gen = RPMGeneratorTPU(cfg)
    gen.warmup([0, 1])
    rate = gen.measure_device_rate([0, 1], iters=2)
    gen.close()
    assert rate > 0.0
    # no export happened
    import os
    assert os.listdir(os.path.join(str(tmp_path), "samples")) == []
