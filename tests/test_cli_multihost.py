# test_cli_multihost.py — production multi-host fan-out via the CLI.
"""Two `--num_hosts 2` CLI invocations (host_id 0 and 1, no coordinator —
the independent-hosts mode) into one out_dir must produce disjoint strided
id shards whose union is the full dataset, per-host index shards, and a
merged id-sorted index.json (the multi-host replacement for the
reference's worker fan-out, reference src/cli.py:85-129)."""
import json
import os


def test_two_host_cli_shards_and_merged_index(tmp_path):
    from reasoning_image_generation_tpu import cli
    out = str(tmp_path / "out")
    common = ["--out_dir", out, "--n", "4", "--seed", "7",
              "--batch_size", "2", "--num_hosts", "2"]
    cli.main(common + ["--host_id", "0"])
    cli.main(common + ["--host_id", "1"])

    s0 = json.load(open(os.path.join(out, "index_host00.json")))
    s1 = json.load(open(os.path.join(out, "index_host01.json")))
    # shards are stamped with the run id so a rerun's merge gate can't
    # be satisfied by stale leftovers
    assert s0["run_id"] == s1["run_id"]
    assert [m["id"] for m in s0["metas"]] == [0, 2]
    assert [m["id"] for m in s1["metas"]] == [1, 3]

    idx = json.load(open(os.path.join(out, "index.json")))
    assert [m["id"] for m in idx] == [0, 1, 2, 3]
    for m in idx:
        assert os.path.exists(m["grid_path"])
        assert os.path.exists(os.path.join(m["sample_dir"], "meta.json"))
        # every meta carries its grid pHash for merge-time global dedup
        assert len(bytes.fromhex(m["grid_phash"])) == 8


def test_merge_dedup_across_host_shards(tmp_path):
    """Cross-host corpus dedup at merge time: a near-duplicate pair split
    across two hosts' shards is detected by the greedy first-wins-by-id
    pass (same semantics as ops/phash.dedup_keep_mask)."""
    from reasoning_image_generation_tpu.cli import merge_host_indexes
    h_a = "00" * 8
    h_a_near = "03" + "00" * 7       # hamming distance 2 from h_a
    h_b = "ff" * 8
    shard0 = [{"id": 0, "grid_phash": h_a}, {"id": 2, "grid_phash": h_b}]
    shard1 = [{"id": 1, "grid_phash": h_a_near},
              {"id": 3, "grid_phash": "0f" * 8}]
    out = str(tmp_path)
    for i, shard in enumerate((shard0, shard1)):
        with open(os.path.join(out, f"index_host{i:02d}.json"), "w") as f:
            json.dump(shard, f)

    metas = merge_host_indexes(out, dedup_threshold=4)
    dup = {m["id"]: m.get("duplicate", False) for m in metas}
    # id 1 (host 1) duplicates id 0 (host 0); ids 0, 2, 3 are kept
    assert dup == {0: False, 1: True, 2: False, 3: False}
    idx = json.load(open(os.path.join(out, "index.json")))
    assert len(idx) == 4


def test_merge_gate_waits_for_all_shards(tmp_path):
    """With num_hosts given, the merge is a no-op until every shard
    exists; torn/unparseable shards count as not-yet-present; stale shards
    from a previous larger run are ignored."""
    from reasoning_image_generation_tpu.cli import merge_host_indexes
    out = str(tmp_path)

    with open(os.path.join(out, "index_host00.json"), "w") as f:
        json.dump([{"id": 0}], f)
    # stale shard from an old 3-host run must not satisfy (or pollute)
    # a 2-host merge
    with open(os.path.join(out, "index_host02.json"), "w") as f:
        json.dump([{"id": 99}], f)
    assert merge_host_indexes(out, num_hosts=2) is None
    assert not os.path.exists(os.path.join(out, "index.json"))

    # a torn write (non-atomic publisher) reads as not-yet-present
    with open(os.path.join(out, "index_host01.json"), "w") as f:
        f.write('[{"id": 1')
    assert merge_host_indexes(out, num_hosts=2) is None

    with open(os.path.join(out, "index_host01.json"), "w") as f:
        json.dump([{"id": 1}], f)
    metas = merge_host_indexes(out, num_hosts=2)
    assert [m["id"] for m in metas] == [0, 1]  # 99 excluded


def test_merge_dedup_removes_duplicate_artifacts(tmp_path):
    """A merge-time duplicate's exported files are deleted so the on-disk
    dataset matches the index (in-generator duplicates are never
    exported)."""
    from reasoning_image_generation_tpu.cli import merge_host_indexes
    out = str(tmp_path)
    sdir = os.path.join(out, "samples", "sample_000001")
    os.makedirs(sdir)
    gpath = os.path.join(out, "grids", "grid_000001.png")
    os.makedirs(os.path.dirname(gpath))
    open(os.path.join(sdir, "meta.json"), "w").write("{}")
    open(gpath, "wb").write(b"png")
    shard = [{"id": 0, "grid_phash": "00" * 8},
             {"id": 1, "grid_phash": "00" * 8,  # exact duplicate of id 0
              "sample_dir": sdir, "grid_path": gpath}]
    with open(os.path.join(out, "index_host00.json"), "w") as f:
        json.dump(shard, f)
    metas = merge_host_indexes(out, dedup_threshold=4, num_hosts=1)
    assert metas[1]["duplicate"]
    assert not os.path.exists(sdir)
    assert not os.path.exists(gpath)


def test_merge_dedup_matches_scalar_oracle(tmp_path):
    """The vectorized unpackbits dedup must equal a scalar popcount
    reference over a random hash population."""
    import numpy as np
    from reasoning_image_generation_tpu.cli import merge_host_indexes
    rng = np.random.default_rng(0)
    # cluster hashes so plenty of near-duplicates exist
    base = rng.integers(0, 256, (12, 8), np.uint8)
    hashes = base[rng.integers(0, 12, 80)]
    flips = rng.integers(0, 2, hashes.shape).astype(np.uint8)
    hashes = hashes ^ (flips & rng.integers(0, 2, hashes.shape).astype(np.uint8))
    metas = [{"id": i, "grid_phash": bytes(h).hex()}
             for i, h in enumerate(hashes)]
    with open(os.path.join(str(tmp_path), "index_host00.json"), "w") as f:
        json.dump(metas, f)
    merged = merge_host_indexes(str(tmp_path), dedup_threshold=4,
                                num_hosts=1)

    kept = []
    expect = {}
    for i, h in enumerate(hashes):
        hb = bytes(h)
        dup = any(sum(bin(a ^ b).count("1") for a, b in zip(hb, k)) <= 4
                  for k in kept)
        expect[i] = dup
        if not dup:
            kept.append(hb)
    got = {m["id"]: m.get("duplicate", False) for m in merged}
    assert got == expect


def test_merge_gate_ignores_stale_run_shards(tmp_path):
    """A shard stamped with a different run id must not satisfy the
    all-shards-present gate (a fast host rerunning into the same out_dir
    would otherwise dedup fresh samples against stale hashes and delete
    their artifacts)."""
    from reasoning_image_generation_tpu.cli import merge_host_indexes
    out = str(tmp_path)
    with open(os.path.join(out, "index_host00.json"), "w") as f:
        json.dump({"run_id": "new", "metas": [{"id": 0}]}, f)
    with open(os.path.join(out, "index_host01.json"), "w") as f:
        json.dump({"run_id": "old", "metas": [{"id": 999}]}, f)
    assert merge_host_indexes(out, num_hosts=2, run_id="new") is None
    with open(os.path.join(out, "index_host01.json"), "w") as f:
        json.dump({"run_id": "new", "metas": [{"id": 1}]}, f)
    metas = merge_host_indexes(out, num_hosts=2, run_id="new")
    assert [m["id"] for m in metas] == [0, 1]
    # legacy bare-list shards still merge when no run_id is enforced
    with open(os.path.join(out, "index_host01.json"), "w") as f:
        json.dump([{"id": 5}], f)
    metas = merge_host_indexes(out, num_hosts=2)
    assert [m["id"] for m in metas] == [0, 5]
