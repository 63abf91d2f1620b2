# test_writer.py — export pool modes and png dispatch details.
import json
import os

import numpy as np

from reasoning_image_generation_tpu.io.writer import ExportPool, ensure_dir


def _img():
    return np.full((16, 16, 3), 128, np.uint8)


def test_export_pool_threaded(tmp_path):
    pool = ExportPool(workers=2, use_threads=True)
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.json")
    pool.submit_png(p1, _img())
    pool.submit_json(p2, {"x": 1, "s": "汉字"})
    pool.drain()
    pool.close()
    assert os.path.exists(p1)
    assert json.load(open(p2))["s"] == "汉字"


def test_export_pool_synchronous(tmp_path):
    # use_threads=False degrades to synchronous writes (debug aid,
    # reference --workers/--use_threads toggles)
    pool = ExportPool(use_threads=False)
    p = str(tmp_path / "sync.png")
    pool.submit_png(p, _img())
    assert os.path.exists(p)  # written immediately, no drain needed
    pool.close()


def test_ensure_dir_idempotent(tmp_path):
    d = str(tmp_path / "x" / "y")
    ensure_dir(d)
    ensure_dir(d)
    assert os.path.isdir(d)


def test_json_unicode_not_escaped(tmp_path):
    # rule names are Chinese; files must stay human-readable like the
    # reference's ensure_ascii=False dumps (src/generator.py:596)
    pool = ExportPool(use_threads=False)
    p = str(tmp_path / "u.json")
    pool.submit_json(p, {"rule": "去同存异"})
    pool.close()
    raw = open(p, encoding="utf-8").read()
    assert "去同存异" in raw and "\\u" not in raw
