#!/usr/bin/env python3
"""Instrumented replica of bench.py's 1k-dedup grid-only stage.

Logs per-batch wall times (generator progress logs carry timestamps) and
JAX compile events (set JAX_LOG_COMPILES=1) so compile stalls landing
inside the timed window are visible.  Run from the repo root:

    JAX_LOG_COMPILES=1 timeout 1800 python tools/profile_1k_dedup.py

Round-4 finding: a cold XLA persistent cache put fresh remote-service
compiles inside bench stage 3's window (115 s); with the cache warm the
same window is 7.8 s, kept=957, 26 KB/sample, 0 overflow frames.
"""
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(message)s")

from reasoning_image_generation_tpu.utils.config import GenConfig
from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU

BENCH_WEIGHTS = {"平移": 1.0, "旋转": 1.0, "翻转(镜像)": 1.0, "组合": 1.0,
                 "直接叠加": 1.0, "去同存异": 1.0, "去异存同": 1.0,
                 "单一遍历": 1.0, "位置遍历": 1.0}

out_dir = tempfile.mkdtemp(prefix="rig_prof_")
cfg = GenConfig(out_dir=out_dir, seed=123, batch_size=32,
                category_weights=dict(BENCH_WEIGHTS),
                sparse_transfer=True, grid_only=True)
for a in sys.argv[1:]:
    if a.startswith("--codec="):          # A/B: --codec=rle5d vs rle4d
        cfg.transfer_codec = a.split("=", 1)[1]
print("codec:", cfg.transfer_codec, flush=True)
gen = RPMGeneratorTPU(cfg)
ids = list(range(128))
ids2 = list(range(128, 640))
t = time.time(); gen.warmup(ids + ids2)
print(f"warmup {time.time()-t:.1f}s", flush=True)
t = time.time(); gen.generate_ids(ids, dedup=False); gen._pool.drain()
print(f"pass1 {time.time()-t:.1f}s", flush=True)
t = time.time(); gen.generate_ids(ids, dedup=False); gen._pool.drain()
print(f"pass2 {time.time()-t:.1f}s", flush=True)
t = time.time(); gen.generate_ids(ids[:64], dedup=True); gen._pool.drain()
print(f"dedup-mini {time.time()-t:.1f}s ovf={gen.overflow_frames}", flush=True)
b0, o0 = gen.transfer_bytes, gen.overflow_frames
idsk = list(range(10_000, 11_024))
t0 = time.time()
metas = gen.generate_ids(idsk, dedup=True, progress=True)
gen._pool.drain()
dt = time.time() - t0
kept = sum(1 for m in metas if not m.get("duplicate") and not m.get("error"))
print(f"1k dedup grid: {dt:.2f}s kept={kept} "
      f"bytes/sample={(gen.transfer_bytes-b0)/1024:.0f} "
      f"overflow={gen.overflow_frames-o0}", flush=True)
gen.close()
import shutil
shutil.rmtree(out_dir, ignore_errors=True)
