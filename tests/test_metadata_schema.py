# test_metadata_schema.py — meta/coco/index schema parity with the reference.
"""Generates one sample with our pipeline and (if available) compares key
structure against a real meta.json produced by the reference on this host.
The reference output is read from the test fixture dir if the reference
pipeline was previously run; otherwise the structural checks run alone."""
import glob
import json
import os

import numpy as np
import pytest

from reasoning_image_generation_tpu.utils.config import GenConfig
from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU

REF_OUT_GLOBS = ["/tmp/refbench/out*/samples/sample_*/meta.json"]

META_REQUIRED = {"id", "category_path", "sample_dir", "grid_path", "sequence",
                 "options", "correct_index", "rule", "cells_meta",
                 "seed_info", "generation_time"}
SEQ_ENTRY_REQUIRED = {"state_path", "elements", "canvas_size", "rule_info",
                      "timestamp"}
OPT_ENTRY_REQUIRED = {"option_path", "is_correct", "elements", "rule_info"}
ELEMENT_REQUIRED = {"kind", "size", "fill", "stroke_width", "center", "angle",
                    "bbox", "flip", "color"}


@pytest.fixture(scope="module")
def our_meta(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("meta_schema"))
    cfg = GenConfig(out_dir=out, seed=3, batch_size=2, canvas_size=(128, 128))
    gen = RPMGeneratorTPU(cfg)
    metas = gen.generate(2)
    gen.close()
    return metas, out


def test_meta_schema_fields(our_meta):
    metas, out = our_meta
    for m in metas:
        assert META_REQUIRED <= set(m.keys())
        for s in m["sequence"]:
            assert SEQ_ENTRY_REQUIRED <= set(s.keys())
            for el in s["elements"]:
                assert ELEMENT_REQUIRED <= set(el.keys())
        for o in m["options"]:
            assert OPT_ENTRY_REQUIRED <= set(o.keys())
        assert 0 <= m["correct_index"] < len(m["options"])
        assert sum(o["is_correct"] for o in m["options"]) == 1
        assert m["options"][m["correct_index"]]["is_correct"]
        assert m["seed_info"]["sample_seed"] == (m["seed_info"]["cfg_seed"] or 0) + m["id"]


def test_coco_schema(our_meta):
    metas, out = our_meta
    for m in metas:
        coco = json.load(open(os.path.join(m["sample_dir"], "coco.json")))
        assert set(coco.keys()) == {"images", "annotations", "categories"}
        img = coco["images"][0]
        assert {"id", "file_name", "width", "height"} <= set(img.keys())
        assert coco["categories"][0]["name"] == m["rule"]
        for ann in coco["annotations"]:
            assert {"id", "image_id", "category_id", "bbox", "label"} <= set(ann)
        assert len(coco["annotations"]) == len(m["cells_meta"])


def test_meta_keys_cover_reference_sample():
    ref_paths = []
    for g in REF_OUT_GLOBS:
        ref_paths.extend(glob.glob(g))
    if not ref_paths:
        pytest.skip("no reference output on this host")
    ref = json.load(open(ref_paths[0]))
    # our meta must carry every top-level key the reference emits
    missing = set(ref.keys()) - META_REQUIRED
    assert not missing, f"reference emits keys we don't model: {missing}"
    ref_el = ref["sequence"][0]["elements"][0]
    assert set(ref_el.keys()) <= ELEMENT_REQUIRED | {"meta", "visual", "flip_mode"}
