#!/usr/bin/env python3
# cli.py — batch generation front-end (flag-compatible with the reference).
"""CLI for the RPM sequence-puzzle pipeline.

Mirrors reference src/cli.py:36-47 flags:
  --out_dir --n --grid --seed --test --workers --use_threads
plus TPU-build extensions: --batch_size.

`--workers`/`--use_threads` steer the host export pool (the reference used
them for its process fan-out; device generation is batched, so the only
parallel host work left is I/O).  index.json aggregation matches
reference src/cli.py:49-52.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, default="./out")
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--grid", type=int, default=3)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--workers", type=int, default=None,
                   help="export-pool threads (default: 8)")
    p.add_argument("--use_threads", action="store_true", default=True,
                   help="kept for reference-flag compatibility (export is "
                        "always thread-pooled unless --workers 0)")
    p.add_argument("--batch_size", type=int, default=32,
                   help="samples per XLA program invocation")
    p.add_argument("--dedup", action="store_true",
                   help="drop near-duplicate samples (on-device pHash)")
    p.add_argument("--dedup_threshold", type=int, default=4)
    p.add_argument("--resume", action="store_true",
                   help="skip sample ids whose meta.json already exists")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="jax.profiler trace output directory")
    p.add_argument("--no_labels", action="store_true",
                   help="omit S0../A-D cell labels on the grids")
    p.add_argument("--no_border", action="store_true",
                   help="omit the 1px cell borders on the grids")
    p.add_argument("--sparse", action="store_true",
                   help="lossless block-sparse device->host transfer codec: "
                        "~2x fewer bytes for ~2x device time; use when the "
                        "device->host link is the bottleneck")
    p.add_argument("--grid_only", action="store_true",
                   help="export only grid_%%06d.png + meta/coco; per-frame "
                        "state/option images never leave the device "
                        "(~9x fewer bytes across the host link)")
    return p.parse_args(argv)


def write_index(out_dir: str, metas):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index.json"), "w", encoding="utf-8") as f:
        json.dump(metas, f, ensure_ascii=False, indent=2)


def enable_compilation_cache():
    """Persistent XLA compilation cache: the per-leaf pipeline programs
    compile once per machine, not once per process."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/rig_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    enable_compilation_cache()
    from .utils.config import GenConfig
    from .models.rpm.generator import RPMGeneratorTPU

    if args.test:
        # sequential 3-sample smoke test with fixed seed (the reference's
        # --test asserts a stale path layout, src/cli.py:66-70; we assert the
        # layout actually written)
        # batch_size 32 reuses the standard compiled program shapes (a
        # bespoke batch-3 shape would cost a fresh ~minutes compile)
        cfg = GenConfig(out_dir="./out_test", grid_size=3, seed=42,
                        batch_size=32)
        gen = RPMGeneratorTPU(cfg)
        metas = gen.generate(3)
        gen.close()
        for m in metas:
            assert os.path.isdir(m["sample_dir"]), "sample dir missing"
            assert os.path.exists(m["grid_path"]), "grid missing"
            assert os.path.exists(os.path.join(m["sample_dir"], "meta.json"))
            assert os.path.exists(os.path.join(m["sample_dir"], "coco.json"))
        print("Integration test passed, samples in ./out_test")
        return

    cfg = GenConfig(out_dir=args.out_dir, grid_size=args.grid, seed=args.seed,
                    batch_size=args.batch_size,
                    sparse_transfer=args.sparse, grid_only=args.grid_only)
    workers = args.workers if args.workers is not None else 8
    gen = RPMGeneratorTPU(cfg, io_workers=max(1, workers),
                          use_threads=workers != 0,
                          show_labels=not args.no_labels,
                          show_border=not args.no_border)
    t0 = time.time()
    print(f"Start generating {args.n} samples -> {args.out_dir} "
          f"(batch={args.batch_size}, seed={args.seed})")
    from .utils.profiling import trace
    with trace(args.profile_dir):
        metas = gen.generate(args.n, progress=True, dedup=args.dedup,
                             dedup_threshold=args.dedup_threshold,
                             resume=args.resume)
    gen.close()
    write_index(args.out_dir, metas)
    dt = time.time() - t0
    print(f"Done. Generated {len(metas)} samples to {args.out_dir} "
          f"in {dt:.2f}s ({len(metas)/dt:.2f} samples/s)")


if __name__ == "__main__":
    main()
