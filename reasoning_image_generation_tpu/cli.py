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
    # multi-host scale-out (the reference scales by forking workers over
    # sample ranges, src/cli.py:85-129; the TPU-native equivalent is one
    # process per host, each driving its local chips over a strided id
    # shard — see parallel/mesh.py)
    p.add_argument("--num_hosts", type=int, default=1,
                   help="total host processes generating into out_dir; "
                        "this host writes the ids where "
                        "id %% num_hosts == host_id")
    p.add_argument("--host_id", type=int, default=0,
                   help="this host's rank in [0, num_hosts)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of the jax.distributed coordinator; "
                        "when given, chips across hosts form one system "
                        "(enables the cross-host dedup collective). "
                        "Without it hosts run independently — dedup is "
                        "per-host, export shards are still disjoint.")
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


def merge_host_indexes(out_dir: str, dedup_threshold: int | None = None):
    """Merge per-host index shards (index_host*.json) into index.json.
    Safe to run on any host once all hosts finished; id-sorted like the
    reference's single index (reference src/cli.py:49-52).

    With `dedup_threshold`, additionally runs the corpus dedup ACROSS
    hosts: every meta carries its grid pHash, so the same greedy
    first-wins-by-id pass the generator applies on-device
    (ops/phash.dedup_keep_mask) marks cross-host near-duplicates here —
    deterministic, independent of host count, and requiring no lockstep
    collective between otherwise-independent hosts."""
    import glob
    metas = []
    for path in sorted(glob.glob(os.path.join(out_dir, "index_host*.json"))):
        with open(path, encoding="utf-8") as f:
            metas.extend(json.load(f))
    metas.sort(key=lambda m: m.get("id", m.get("index", 0)))
    if dedup_threshold is not None:
        kept = []  # (hash bytes) of kept samples, in id order
        for m in metas:
            h = m.get("grid_phash")
            if m.get("duplicate") or m.get("error") or h is None:
                continue
            hb = bytes.fromhex(h)
            dup = any(
                sum(bin(a ^ b).count("1") for a, b in zip(hb, k))
                <= dedup_threshold for k in kept)
            if dup:
                m["duplicate"] = True
            else:
                kept.append(hb)
    write_index(out_dir, metas)
    return metas


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    enable_compilation_cache()
    if args.coordinator:
        from .parallel.mesh import distributed_init
        distributed_init(coordinator_address=args.coordinator,
                         num_processes=args.num_hosts,
                         process_id=args.host_id)
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
    ids = list(range(args.n))
    if args.num_hosts > 1:
        from .parallel.mesh import host_shard_ids
        ids = host_shard_ids(ids, process_index=args.host_id,
                             process_count=args.num_hosts)
    t0 = time.time()
    print(f"Start generating {len(ids)} samples -> {args.out_dir} "
          f"(batch={args.batch_size}, seed={args.seed})")
    from .utils.profiling import trace
    with trace(args.profile_dir):
        metas = gen.generate_ids(ids, progress=True, dedup=args.dedup,
                                 dedup_threshold=args.dedup_threshold,
                                 resume=args.resume)
    gen.close()
    if args.num_hosts > 1:
        shard_path = os.path.join(args.out_dir,
                                  f"index_host{args.host_id:02d}.json")
        with open(shard_path, "w", encoding="utf-8") as f:
            json.dump(metas, f, ensure_ascii=False, indent=2)
        # last host to finish leaves a merged index.json behind; the merge
        # is idempotent so concurrent finishers just rewrite the same file
        merge_host_indexes(args.out_dir,
                           args.dedup_threshold if args.dedup else None)
    else:
        write_index(args.out_dir, metas)
    dt = time.time() - t0
    print(f"Done. Generated {len(metas)} samples to {args.out_dir} "
          f"in {dt:.2f}s ({len(metas)/dt:.2f} samples/s)")


if __name__ == "__main__":
    main()
