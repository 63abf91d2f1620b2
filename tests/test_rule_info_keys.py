# test_rule_info_keys.py — per-leaf rule_info key vocabulary vs reference.
"""The reference handlers thread a rule_info dict through the sequence and
meta.json stores it per frame (reference src/generator.py:364-401).  These
tests pin our serialized vocabulary to key sets captured from live runs of
the reference handlers (see each handler in reference src/rules.py)."""
import pytest

from reasoning_image_generation_tpu.utils.config import GenConfig, RULE_LEAVES
from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU

# union of rule_info keys over a full sequence, per leaf (conditional keys
# that cannot appear at the pipeline's sequence lengths are excluded)
EXPECTED = {
    "平移": {"dist", "grid_size", "idx", "is_horizontal", "use_grid"},
    "旋转": {"allowed_set", "applied_angle", "idx", "requested_angle"},
    "翻转(镜像)": {"flip_mode", "idx"},
    "组合": {"transform_many"},
    "直接叠加": {"frame_count", "op", "seed"},
    "去同存异": {"frame_count", "op", "seed", "kept_idx_in_last",
               "removed_idx_in_last", "num_kept", "num_removed",
               "num_replaced", "replaced_idx"},
    "去异存同": {"frame_count", "op", "seed", "kept_idx_in_last",
               "removed_idx_in_last", "num_kept", "num_removed",
               "num_replaced", "replaced_idx"},
    "单一遍历": {"done", "last_modified", "sequence", "step_idx", "note"},
    "位置遍历": {"done", "last_modified", "positions_sequence", "step_idx"},
}
TM_INNER = {"target_indices", "elem_op_map", "translate_param",
            "rotate_param", "flip_param", "valid_ops"}


def _one_sample(tmp_path, leaf):
    w = {l: 0.0 for l in RULE_LEAVES}
    w[leaf] = 1.0
    cfg = GenConfig(out_dir=str(tmp_path / leaf.replace("(", "_")), seed=2,
                    batch_size=2, canvas_size=(128, 128), category_weights=w)
    gen = RPMGeneratorTPU(cfg)
    metas = gen.generate(2)
    gen.close()
    return metas


@pytest.mark.parametrize("leaf", sorted(EXPECTED))
def test_rule_info_key_union(tmp_path, leaf):
    metas = _one_sample(tmp_path, leaf)
    for meta in metas:
        infos = [s["rule_info"] for s in meta["sequence"][1:]]
        assert all(isinstance(i, dict) for i in infos)
        union = set().union(*(set(i) for i in infos))
        missing = EXPECTED[leaf] - union
        assert not missing, f"{leaf} missing keys {missing}; union={union}"
        if leaf == "组合":
            inner = set().union(*(set(i["transform_many"]) for i in infos))
            assert TM_INNER <= inner, inner
        if leaf in ("去同存异", "去异存同"):
            # replace steps bound r within [1, n-1] slots (all-replace only
            # in the n<=1 append case, which reports added_idx instead)
            for i in infos:
                if "replaced_idx" in i:
                    assert i["num_replaced"] == len(i["replaced_idx"]) >= 1
        if leaf == "单一遍历":
            # done flips on the step that exhausts the sequence
            assert infos[-1]["done"] is True
            assert infos[0]["done"] is False
            n = len(infos[0]["sequence"])
            assert infos[-1]["note"] == "sequence_finished_after_this_step"
            # accumulated log: 2 entries per applied step
            assert len(infos[-1]["last_modified"]) == 2 * len(infos)
            assert len(infos[0]["last_modified"]) == 2
        if leaf == "位置遍历":
            assert [i["step_idx"] for i in infos] == [
                t + 2 for t in range(len(infos))]
            assert len(infos[-1]["last_modified"]) == len(infos)
