# test_cli.py — CLI front-ends (small canvas for CPU speed).
import json
import os

import numpy as np
import pytest


def test_rpm_cli_main(tmp_path):
    from reasoning_image_generation_tpu import cli
    out = str(tmp_path / "out")
    cli.main(["--out_dir", out, "--n", "3", "--seed", "5",
              "--batch_size", "3"])
    idx = json.load(open(os.path.join(out, "index.json")))
    assert len(idx) == 3
    for m in idx:
        assert os.path.exists(m["grid_path"])
        assert os.path.exists(os.path.join(m["sample_dir"], "meta.json"))


def test_mg_cli_generate_all(tmp_path, monkeypatch):
    from reasoning_image_generation_tpu.models.multigraph.cli import generate_all
    monkeypatch.chdir(tmp_path)
    generate_all(num_samples=2, out_dir="output", dpi=25,
                 mode_choices=("adjacent",), batch_size=2)
    imgs = os.listdir("output/images")
    params = os.listdir("output/params")
    assert len(imgs) == 2 and len(params) == 2
    rec = json.load(open(os.path.join("output/params", params[0])))
    assert rec["mode"] == "adjacent"
    assert "qc" in rec and "shapes" in rec
