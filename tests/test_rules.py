# test_rules.py — rule-engine property tests (no rendering).
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reasoning_image_generation_tpu.utils.config import GenConfig, KIND_ID
from reasoning_image_generation_tpu.models.rpm.sampler import sample_prototype
from reasoning_image_generation_tpu.models.rpm import rules as R

W = H = 512
E = 8


def proto(seed=0, n=2, use_grid=False):
    return sample_prototype(jax.random.key(seed), W, H, E, n=n,
                            use_grid=use_grid)


def run_steps(leaf, state, key, n_steps, use_grid=False):
    init_fn, step_fn = R.RULES[leaf]
    params = init_fn(jax.random.fold_in(key, 0), state, use_grid, W, H)
    prev, cur = state, state
    outs = []
    for i in range(1, n_steps + 1):
        new, params = step_fn(prev, cur, params, jax.random.fold_in(key, i),
                              jnp.asarray(i), use_grid, W, H)
        prev, cur = cur, new
        outs.append(new)
    return outs, params


def test_translate_moves_one_element_constant_dist():
    st = proto(1, n=1)
    outs, params = run_steps("平移", st, jax.random.key(7), 3)
    d0 = np.asarray(outs[0].cx)[0] - np.asarray(st.cx)[0], \
         np.asarray(outs[0].cy)[0] - np.asarray(st.cy)[0]
    d1 = np.asarray(outs[1].cx)[0] - np.asarray(outs[0].cx)[0], \
         np.asarray(outs[1].cy)[0] - np.asarray(outs[0].cy)[0]
    assert d0 == d1 != (0.0, 0.0)  # same displacement every step
    # only the position changed
    np.testing.assert_array_equal(np.asarray(st.kind), np.asarray(outs[0].kind))
    np.testing.assert_array_equal(np.asarray(st.size), np.asarray(outs[0].size))


def test_translate_grid_lands_on_cell_centers():
    st = proto(2, n=1, use_grid=True)
    outs, params = run_steps("平移", st, jax.random.key(3), 2, use_grid=True)
    cell = W / 3
    for o in outs:
        cx = float(np.asarray(o.cx)[0])
        cy = float(np.asarray(o.cy)[0])
        assert min(abs(cx - (c + 0.5) * cell) for c in range(3)) < 1.0
        assert min(abs(cy - (r + 0.5) * cell) for r in range(3)) < 1.0


def test_rotate_accumulates_delta_mod_360():
    st = proto(3, n=1)
    # ensure non-circle
    st = st._replace(kind=jnp.where(st.kind == KIND_ID["circle"],
                                    KIND_ID["square"], st.kind))
    outs, params = run_steps("旋转", st, jax.random.key(5), 4)
    idx = int(np.asarray(params.idx))
    delta = float(np.asarray(params.delta))
    a0 = float(np.asarray(st.angle)[idx])
    for i, o in enumerate(outs, start=1):
        expect = (a0 + delta * i) % 360.0
        assert abs(float(np.asarray(o.angle)[idx]) - expect) < 1e-3


def test_flip_is_involution_on_center():
    st = proto(4, n=1)
    outs, params = run_steps("翻转(镜像)", st, jax.random.key(11), 2)
    idx = int(np.asarray(params.idx))
    # two flips return the center to (near) the original
    assert abs(float(np.asarray(outs[1].cx)[idx]) -
               float(np.asarray(st.cx)[idx])) <= 1.0
    assert abs(float(np.asarray(outs[1].cy)[idx]) -
               float(np.asarray(st.cy)[idx])) <= 1.0
    # flip metadata toggled back
    assert bool(np.asarray(outs[1].flip_h)[idx]) == bool(np.asarray(st.flip_h)[idx])


def test_traverse_sequence_cycles_kinds():
    st = proto(6, n=2)
    outs, params = run_steps("单一遍历", st, jax.random.key(2), 4)
    seq = np.asarray(params.seq)[:3]
    assert seq[0] == int(np.asarray(st.kind)[0])
    assert seq[1] == int(np.asarray(st.kind)[1])
    for i, o in enumerate(outs, start=1):
        assert int(np.asarray(o.kind)[0]) == seq[i % 3]
        assert int(np.asarray(o.kind)[1]) == seq[(i + 1) % 3]


def test_traverse_positions_cycles_positions():
    st = proto(7, n=2)
    outs, params = run_steps("位置遍历", st, jax.random.key(2), 3)
    pos = np.asarray(params.pos)[:3]
    for i, o in enumerate(outs, start=1):
        np.testing.assert_allclose(
            [float(np.asarray(o.cx)[0]), float(np.asarray(o.cy)[0])],
            pos[i % 3], atol=1e-3)


def test_diff_keep_same_symmetric_difference():
    # identical frames -> merge step leaves nothing... except packing keeps
    # nothing; reference would emit empty too
    st = proto(8, n=3)
    init_fn, step_fn = R.RULES["去同存异"]
    params = init_fn(jax.random.key(0), st, False, W, H)
    new, _ = step_fn(st, st, params, jax.random.key(1), jnp.asarray(2),
                     False, W, H)
    assert int(np.asarray(new.count())) == 0

    # disjoint frames -> union kept
    st2 = proto(9, n=2)
    moved = st2._replace(cx=st2.cx + 200.0,
                         kind=jnp.mod(st2.kind + 1, 11))
    new2, _ = step_fn(st2, moved, params, jax.random.key(1), jnp.asarray(2),
                      False, W, H)
    assert int(np.asarray(new2.count())) == 4


def test_diff_keep_intersection_keeps_matches():
    st = proto(10, n=2)
    init_fn, step_fn = R.RULES["去异存同"]
    params = init_fn(jax.random.key(0), st, False, W, H)
    new, _ = step_fn(st, st, params, jax.random.key(1), jnp.asarray(2),
                     False, W, H)
    assert int(np.asarray(new.count())) == 2  # all matched

    # nothing matches -> force-keep the largest element
    moved = st._replace(cx=st.cx + 300.0, kind=jnp.mod(st.kind + 3, 11))
    new2, _ = step_fn(st, moved, params, jax.random.key(1), jnp.asarray(2),
                      False, W, H)
    assert int(np.asarray(new2.count())) == 1


def test_overlay_replace_branch_keeps_count_or_appends():
    st = proto(11, n=3)
    init_fn, step_fn = R.RULES["去同存异"]
    params = init_fn(jax.random.key(0), st, False, W, H)
    # frame_count=1 -> replace branch; count unchanged
    new, _ = step_fn(st, st, params, jax.random.key(1), jnp.asarray(1),
                     False, W, H)
    assert int(np.asarray(new.count())) == 3
    # replaced: at least one element differs
    same = (np.asarray(new.kind) == np.asarray(st.kind)) & \
           (np.asarray(new.cx) == np.asarray(st.cx))
    assert not same[:3].all()


def test_transform_many_targets_subset():
    st = proto(12, n=3)
    init_fn, step_fn = R.RULES["组合"]
    params = init_fn(jax.random.key(4), st, False, W, H)
    active = np.asarray(params.active)
    assert 1 <= active.sum() <= 3
    new, _ = step_fn(st, st, params, jax.random.key(5), jnp.asarray(1),
                     False, W, H)
    # untargeted elements unchanged
    for e in range(3):
        if not active[e]:
            assert float(np.asarray(new.cx)[e]) == float(np.asarray(st.cx)[e])
            assert float(np.asarray(new.angle)[e]) == float(np.asarray(st.angle)[e])


def test_pack_state_compacts():
    st = proto(13, n=3)
    keep = jnp.asarray([True, False, True, False, False, False, False, False])
    packed = R.pack_state(st, keep, 8)
    assert int(np.asarray(packed.count())) == 2
    assert bool(np.asarray(packed.valid)[0]) and bool(np.asarray(packed.valid)[1])
    # kept elements are the original slots 0 and 2, in order
    assert int(np.asarray(packed.kind)[0]) == int(np.asarray(st.kind)[0])
    assert int(np.asarray(packed.kind)[1]) == int(np.asarray(st.kind)[2])
