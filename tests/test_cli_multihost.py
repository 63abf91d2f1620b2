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
    assert [m["id"] for m in s0] == [0, 2]
    assert [m["id"] for m in s1] == [1, 3]

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
