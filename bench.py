#!/usr/bin/env python3
# bench.py — end-to-end throughput benchmark (one JSON line to stdout).
"""Measures full RPM sample generation throughput (device generation +
render + grid compose + PNG/JSON export) and compares against the measured
reference baseline on this machine.

Baseline: the reference CPU pipeline (/root/reference/src/cli.py) measured
on this host at 0.202 samples/s (32-sample run, single CPU core,
2026-08-16).  The reference publishes no benchmark numbers of its own
(BASELINE.md), so the measured-on-this-host number is the denominator.

Stages:
  1. device-only samples/s (north-star: BASELINE.json images/sec/chip)
  2. e2e full export (state/option/grid PNGs + meta/coco JSON)
  3. e2e grid-only export
  4. the literal BASELINE scenario: ~1k samples, dedup on, all 9 rule
     leaves weighted (reference README.md:8 — the <10 s / 1k target),
     both grid-only and full-export variants
  5. multigraph device + e2e rates

Every e2e stage reports measured device->host bytes/sample alongside the
rate: the dev relay's bandwidth swings 4-28 MB/s minute to minute, so
bytes/sample is the round-over-round comparable number.  A projected
`*_sps_at_10mbps` = min(device rate, 10 MB/s / bytes_per_sample) is
emitted for each e2e figure so relay weather can't hide a codec
regression (or fake an improvement) round over round.

Stage order is cheapest-headline-first (device rate, grid-only e2e, the
1k-dedup grid-only BASELINE target) and the byte-heavy full-export
stages run last under a wall-clock budget (BENCH_BUDGET_S, default
2400 s): a 0.2 MB/s relay day would otherwise turn the ~770 MB
full-export stages into a multi-hour run that starves the driver of any
JSON at all.  Skipped stages are listed in `skipped_stages`.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REFERENCE_BASELINE_SPS = 0.202

N_WARM = int(os.environ.get("BENCH_N_WARM", "128"))
N_TIMED = int(os.environ.get("BENCH_N_TIMED", "512"))
                 # timed window: big enough that the per-leaf ragged tail
                 # batch (padded to batch_size) doesn't distort bytes/rate
N_BASELINE = int(os.environ.get("BENCH_N_BASELINE", "1024"))

# All 9 leaves weighted like the production default (uniform): every
# pipeline's throughput is measured, none asserted.  Compiles are one-time
# under the persistent XLA cache.
BENCH_WEIGHTS = {"平移": 1.0, "旋转": 1.0, "翻转(镜像)": 1.0, "组合": 1.0,
                 "直接叠加": 1.0, "去同存异": 1.0, "去异存同": 1.0,
                 "单一遍历": 1.0, "位置遍历": 1.0}

# Reference multigraph pipeline baseline, MEASURED on this host
# (tools/measure_mg_baseline.py, 2026-08-17) with a numpy shapely shim
# (shapely isn't installed; tools/shapely_shim implements the API subset
# the reference uses) and the math.lg10->log10 typo patched: seeds 0-14
# run at ~1.2 imgs/s (p50 0.13 s/task), but the adjacent-placement
# search is heavy-tailed — seed 15 alone took 333 s (the reference's
# unbounded 180-angle x distance-ladder sweep), dragging the 16-sample
# mean to 0.046 imgs/s.  We use the typical-rate 1.2 as the denominator
# (the favorable-to-the-reference choice).
REFERENCE_MG_BASELINE_IPS = 1.2  # measured typical rate (see above)

# Wall-clock budget for the whole RPM section.  The full-export stages
# move ~770 MB over the relay; on a bad relay day they'd run for hours.
# Once elapsed time crosses the budget, remaining stages are skipped
# (their fields stay absent and are named in `skipped_stages`).
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))
# Below this measured link speed the full-export timed window shrinks
# (288 ids still gives every leaf a full batch-32 group on average) and
# the 1024-sample full-export run is skipped outright.
SLOW_LINK_MBPS = 2.0


def _timed_export(gen, warm_ids, timed_ids, **kw):
    """One untimed pass (stats/tiers/allocator warm), then a timed pass.
    Returns (samples/s, bytes/sample, overflow frame count, metas)."""
    gen.generate_ids(warm_ids, **kw)
    gen._pool.drain()
    b0 = gen.transfer_bytes
    o0 = getattr(gen, "overflow_frames", 0)
    t0 = time.time()
    metas = gen.generate_ids(timed_ids, **kw)
    gen._pool.drain()
    dt = time.time() - t0
    bps = (gen.transfer_bytes - b0) / max(len(metas), 1)
    over = getattr(gen, "overflow_frames", 0) - o0
    return len(metas) / dt, bps, over, metas


def _run_once():
    import numpy as np
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    from reasoning_image_generation_tpu.models.rpm.pipeline import sample_keys

    out_dir = tempfile.mkdtemp(prefix="rig_bench_")
    res = {"skipped_stages": []}
    bench_t0 = time.time()

    def over_budget(stage):
        if time.time() - bench_t0 > BENCH_BUDGET_S:
            print(f"bench: budget exceeded, skipping {stage}",
                  file=sys.stderr, flush=True)
            res["skipped_stages"].append(stage)
            return True
        return False

    try:
        # sparse_transfer stays off for the DEVICE-rate runs (the codec
        # costs ~2x device time and the headline metric is device
        # samples/s); the e2e runs below use their own codec-enabled
        # pipelines because the device->host link is the e2e bottleneck
        # on this host (measured: raw link ~5-20 MB/s and varying).
        cfg = GenConfig(out_dir=out_dir, seed=123, batch_size=32,
                        category_weights=dict(BENCH_WEIGHTS))
        gen = RPMGeneratorTPU(cfg)
        ids = list(range(N_WARM))
        ids2 = list(range(N_WARM, N_WARM + N_TIMED))
        print("bench: warming up (compiles)...", file=sys.stderr, flush=True)
        gen.warmup(ids)

        # timed run 1 — the north-star metric (BASELINE.json): rendered
        # puzzle samples/sec/chip at 512^2, on-device.  Latency-amortized
        # (10 dispatches per sync — a single sync costs ~36 ms on this
        # relay); the per-dispatch-blocking number is reported alongside
        # so methodology changes can't masquerade as perf deltas.
        # Measured over N_TIMED ids so every leaf contributes at least one
        # FULL batch (with only N_WARM ids the 9-leaf groups are all
        # ragged and padding gets billed as dead time, ~2x understatement).
        print("bench: device-only run...", file=sys.stderr, flush=True)
        res["device_sps"] = gen.measure_device_rate(ids2, iters=10)
        res["device_sps_blocking"] = gen.measure_device_rate(
            ids2, iters=10, blocking=True)

        # quantify the link: raw device->host MB/s for one batch's images
        leaf, entries = next(iter(gen._sample_assignments(ids).items()))
        pipe = gen._pipeline(leaf)
        chunk = entries[:cfg.batch_size]
        pad = [e[0] for e in chunk] + [chunk[0][0]] * (cfg.batch_size - len(chunk))
        ug = np.asarray([e[2] for e in chunk] +
                        [False] * (cfg.batch_size - len(chunk)))
        out = pipe(sample_keys(cfg.seed or 0, np.asarray(pad)), ug)
        _ = np.asarray(out["grid_img"].reshape(-1)[0])
        t0 = time.time()
        nbytes = sum(np.asarray(out[k]).nbytes
                     for k in ("state_imgs", "option_imgs", "grid_img"))
        res["link_mbps"] = nbytes / max(time.time() - t0, 1e-9) / 1e6
        gen.close()

        idsk = list(range(10_000, 10_000 + N_BASELINE))

        # timed run 2 — grid-only export (the composed puzzle is the
        # training artifact; per-frame images never cross the link).
        # Runs FIRST among the e2e stages: it carries the headline
        # BASELINE target and is ~6x lighter on the link.
        print("bench: grid-only e2e run...", file=sys.stderr, flush=True)
        cfg3 = GenConfig(out_dir=out_dir + "_g", seed=123, batch_size=32,
                         category_weights=dict(BENCH_WEIGHTS),
                         sparse_transfer=True, grid_only=True)
        gen3 = RPMGeneratorTPU(cfg3)
        gen3.warmup(ids + ids2)
        (res["e2e_grid_only_sps"], res["grid_bytes_per_sample"],
         res["grid_overflow_frames"], _) = _timed_export(gen3, ids, ids2)

        # timed run 3 — the literal BASELINE scenario, grid-only:
        # ~1k samples, dedup on (reference README.md:8; <10 s target)
        print("bench: 1k dedup grid-only run...", file=sys.stderr,
              flush=True)
        t0 = time.time()
        metas = gen3.generate_ids(idsk, dedup=True)
        gen3._pool.drain()
        res["baseline_1k_grid_s"] = time.time() - t0
        res["baseline_1k_grid_kept"] = sum(
            1 for m in metas if not m.get("duplicate") and not m.get("error"))
        gen3.close()
        shutil.rmtree(out_dir + "_g", ignore_errors=True)

        # timed run 4 — end-to-end full export (all state/option/grid PNGs
        # + meta/coco JSON): the byte-heavy stages, budget-guarded.
        slow_link = res["link_mbps"] < SLOW_LINK_MBPS
        if over_budget("e2e_full"):
            return res
        print("bench: e2e full-export run...", file=sys.stderr, flush=True)
        cfg2 = GenConfig(out_dir=out_dir + "_s", seed=123, batch_size=32,
                         category_weights=dict(BENCH_WEIGHTS),
                         sparse_transfer=True)
        gen2 = RPMGeneratorTPU(cfg2)
        timed2 = ids2[:288] if slow_link else ids2
        gen2.warmup(ids + timed2)
        (res["e2e_sps"], res["e2e_bytes_per_sample"],
         res["e2e_overflow_frames"], _) = _timed_export(gen2, ids, timed2)

        # timed run 5 — BASELINE scenario, full export
        if slow_link:
            res["skipped_stages"].append("baseline_1k_full(slow_link)")
        elif not over_budget("baseline_1k_full"):
            print("bench: 1k dedup full-export run...", file=sys.stderr,
                  flush=True)
            b0 = gen2.transfer_bytes
            t0 = time.time()
            metas = gen2.generate_ids(idsk, dedup=True)
            gen2._pool.drain()
            res["baseline_1k_full_s"] = time.time() - t0
            res["baseline_1k_full_bytes_per_sample"] = (
                (gen2.transfer_bytes - b0) / N_BASELINE)
            res["baseline_1k_full_kept"] = sum(
                1 for m in metas
                if not m.get("duplicate") and not m.get("error"))
        gen2.close()
        shutil.rmtree(out_dir + "_s", ignore_errors=True)
        return res
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _run_multigraph(n_batches: int = 3, B: int = 8, dpi: int = 200):
    """Multigraph (single-image) pipeline throughput: device imgs/s
    (latency-amortized) and steady-state e2e imgs/s incl. PNG+JSON export
    at dpi 200 (the reference's second pipeline,
    /root/reference/multigraph_generation/cli.py:30-72)."""
    import numpy as np
    from reasoning_image_generation_tpu.models.multigraph.generator import (
        GeometryGeneratorTPU)
    from reasoning_image_generation_tpu.models.multigraph.scene import (
        build_scene_batch)

    gen = GeometryGeneratorTPU()
    if gen.renderer == "pallas":
        from reasoning_image_generation_tpu.models.multigraph.renderer_pallas \
            import render_scene_batch_pallas as render
    else:
        from reasoning_image_generation_tpu.models.multigraph.renderer \
            import render_scene_batch as render

    seeds = list(range(B))
    modes = ["adjacent"] * B
    batch, _metas = build_scene_batch(seeds, modes, gen.global_scale)

    print("bench: multigraph device run...", file=sys.stderr, flush=True)
    imgs = render(batch, dpi=dpi)
    _ = np.asarray(imgs.reshape(-1)[0])  # compile + sync
    iters = 10
    t0 = time.perf_counter()
    for _i in range(iters):
        imgs = render(batch, dpi=dpi)
    _ = np.asarray(imgs.reshape(-1)[0])
    device_ips = B * iters / (time.perf_counter() - t0)

    print("bench: multigraph e2e run...", file=sys.stderr, flush=True)
    out_dir = tempfile.mkdtemp(prefix="rig_bench_mg_")

    def run_batches(tag, lo):
        # pipelined driver (generate_batches): what the CLI runs
        s = [lo + i for i in range(n_batches * B)]
        gen.generate_batches(
            s, modes * n_batches,
            [os.path.join(out_dir, f"{tag}{i}_adjacent.png") for i in s],
            [os.path.join(out_dir, f"{tag}{i}_adjacent.json") for i in s],
            dpi=dpi, batch_size=B)
        gen._pool.drain()
        return len(s)

    try:
        # untimed warmup pass: first pack/coalesce compiles + transfer-tier
        # statistics — steady state is what a production run sees
        run_batches("w", 0)
        b0 = gen.transfer_bytes
        t0 = time.time()
        n = run_batches("t", 1000)
        e2e_ips = n / (time.time() - t0)
        bpi = (gen.transfer_bytes - b0) / n
    finally:
        gen.close()
        shutil.rmtree(out_dir, ignore_errors=True)
    return device_ips, e2e_ips, bpi


def main():
    from reasoning_image_generation_tpu.cli import enable_compilation_cache
    enable_compilation_cache()
    # the remote-compile service in this environment occasionally drops
    # connections; retry the whole attempt rather than report nothing
    last_err = None
    for attempt in range(3):
        try:
            res = _run_once()
            break
        except Exception as e:  # pragma: no cover
            last_err = e
            import traceback
            traceback.print_exc()
            print(f"bench: attempt {attempt} failed: {e}", file=sys.stderr,
                  flush=True)
            time.sleep(10)
    else:
        raise last_err

    try:
        mg_device_ips, mg_e2e_ips, mg_bpi = _run_multigraph()
    except Exception as e:  # pragma: no cover
        print(f"bench: multigraph failed: {e}", file=sys.stderr, flush=True)
        mg_device_ips = mg_e2e_ips = mg_bpi = 0.0

    def proj_10mbps(bytes_per_sample):
        # link-saturated rate at a nominal 10 MB/s relay, capped by the
        # measured device rate: the relay-weather-invariant e2e figure
        return min(res["device_sps"], 10e6 / max(bytes_per_sample, 1))

    out = {
        "metric": "rpm_samples_per_sec_device",
        "value": round(res["device_sps"], 3),
        "unit": "samples/s",
        "vs_baseline": round(res["device_sps"] / REFERENCE_BASELINE_SPS, 2),
        "device_sps_blocking": round(res["device_sps_blocking"], 3),
        "host_link_mbps": round(res["link_mbps"], 2),
        "mg_imgs_per_sec_device": round(mg_device_ips, 3),
        "mg_e2e_imgs_per_sec": round(mg_e2e_ips, 3),
        "mg_bytes_per_img": round(mg_bpi),
        "mg_vs_baseline": round(
            mg_device_ips / REFERENCE_MG_BASELINE_IPS, 2),
    }
    if "e2e_grid_only_sps" in res:
        out["e2e_grid_only_sps"] = round(res["e2e_grid_only_sps"], 3)
        out["grid_bytes_per_sample"] = round(res["grid_bytes_per_sample"])
        out["grid_only_sps_at_10mbps"] = round(
            proj_10mbps(res["grid_bytes_per_sample"]), 1)
        out["grid_overflow_frames"] = res["grid_overflow_frames"]
    if "baseline_1k_grid_s" in res:
        out["baseline_1k_grid_s"] = round(res["baseline_1k_grid_s"], 2)
        out["baseline_1k_grid_kept"] = res["baseline_1k_grid_kept"]
    if "e2e_sps" in res:
        out["e2e_samples_per_sec"] = round(res["e2e_sps"], 3)
        out["e2e_vs_baseline"] = round(
            res["e2e_sps"] / REFERENCE_BASELINE_SPS, 2)
        out["e2e_bytes_per_sample"] = round(res["e2e_bytes_per_sample"])
        out["e2e_sps_at_10mbps"] = round(
            proj_10mbps(res["e2e_bytes_per_sample"]), 1)
        out["e2e_overflow_frames"] = res["e2e_overflow_frames"]
    if "baseline_1k_full_s" in res:
        out["baseline_1k_full_s"] = round(res["baseline_1k_full_s"], 2)
        out["baseline_1k_full_kept"] = res["baseline_1k_full_kept"]
        out["baseline_1k_full_bytes_per_sample"] = round(
            res["baseline_1k_full_bytes_per_sample"])
    if res.get("skipped_stages"):
        out["skipped_stages"] = res["skipped_stages"]
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
