# test_aux.py — auxiliary subsystems: logging, profiling, dedup+resume.
import json
import logging as pylogging
import os

import numpy as np

from reasoning_image_generation_tpu.utils.logging import setup_logger, JsonFormatter
from reasoning_image_generation_tpu.utils.profiling import Throughput, trace


def test_json_logger(tmp_path):
    jf = str(tmp_path / "log.jsonl")
    pf = str(tmp_path / "log.txt")
    logger = setup_logger("rig_test", log_file=pf, json_log_file=jf)
    logger.info("hello %s", "world")
    # duplicate-handler guard
    logger2 = setup_logger("rig_test", log_file=pf, json_log_file=jf)
    assert logger2 is logger
    assert len(logger.handlers) == 3
    for h in logger.handlers:
        h.flush()
    entry = json.loads(open(jf).read().strip().splitlines()[0])
    assert entry["message"] == "hello world"
    assert entry["level"] == "INFO"
    assert "timestamp" in entry and "func" in entry


def test_throughput_counter():
    t = Throughput()
    with t.phase("render"):
        pass
    t.add(10)
    s = t.summary()
    assert s["samples"] == 10
    assert "render" in s["phases"]
    assert s["samples_per_sec"] > 0


def test_trace_noop():
    with trace(None):
        x = 1
    assert x == 1


def test_generator_dedup_and_resume(tmp_path):
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU

    cfg = GenConfig(out_dir=str(tmp_path), seed=1, batch_size=4,
                    canvas_size=(128, 128))
    gen = RPMGeneratorTPU(cfg)
    metas = gen.generate(4, dedup=True)
    gen.close()
    assert len(metas) == 4
    kept = [m for m in metas if not m.get("duplicate")]
    assert len(kept) >= 1
    for m in kept:
        assert os.path.exists(os.path.join(m["sample_dir"], "meta.json"))

    # resume: re-generating the same ids must reuse existing meta.json
    gen2 = RPMGeneratorTPU(cfg)
    kept_ids = [m["id"] for m in kept]
    metas2 = gen2.generate_ids(kept_ids, resume=True)
    gen2.close()
    assert [m["id"] for m in metas2] == sorted(kept_ids)
    # reused metas match what was written
    for m in metas2:
        disk = json.load(open(os.path.join(m["sample_dir"], "meta.json")))
        assert disk["correct_index"] == m["correct_index"]


def test_run_stats_persist_max_merge(tmp_path, monkeypatch):
    """Transfer-tier statistics persist via atomic max-merge keyed files
    (utils/cache.py) so fresh processes start with converged tiers."""
    from reasoning_image_generation_tpu.utils import cache
    monkeypatch.setattr(cache, "cache_dir", lambda: str(tmp_path))
    assert cache.load_run_stats("t") == {}
    cache.save_run_stats("t", {"a": 10, "b": 5})
    cache.save_run_stats("t", {"a": 7, "c": 3})   # a must keep its max
    assert cache.load_run_stats("t") == {"a": 10, "b": 5, "c": 3}
    # corrupt file reads as empty, save still works after
    with open(tmp_path / "runstats_t.json", "w") as f:
        f.write("{broken")
    assert cache.load_run_stats("t") == {}
    cache.save_run_stats("t", {"d": 1})
    assert cache.load_run_stats("t") == {"d": 1}
