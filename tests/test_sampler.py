# test_sampler.py — prototype sampler distribution checks vs reference spec.
import jax
import numpy as np

from reasoning_image_generation_tpu.utils.config import KIND_ID, SHAPE_KINDS
from reasoning_image_generation_tpu.models.rpm.sampler import sample_prototype

W = H = 512
E = 8


def _many(n_samples=400, **kw):
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        np.arange(n_samples))
    return jax.vmap(lambda k: sample_prototype(k, W, H, E, **kw))(keys)


def test_element_count_distribution():
    st = _many(600)
    counts = np.asarray(st.valid.sum(-1))
    vals, freq = np.unique(counts, return_counts=True)
    assert set(vals) == {1, 2, 3}          # n ∈ {1,2,3} (src/sample.py:51)
    assert (freq > 600 / 3 * 0.6).all()    # roughly uniform


def test_attribute_distributions():
    st = _many(400, n=3)
    valid = np.asarray(st.valid)
    kinds = np.asarray(st.kind)[valid]
    # all 11 kinds appear, roughly uniform (src/sample.py:151)
    assert len(np.unique(kinds)) == len(SHAPE_KINDS)

    fills = np.asarray(st.fill)[valid]
    assert 0.55 < fills.mean() < 0.78      # 2/3 fill (src/sample.py:159)

    strokes = np.asarray(st.stroke)[valid]
    assert set(np.unique(strokes)) == {1.0, 2.0, 3.0}

    angles = np.asarray(st.angle)[valid]
    non_circle = kinds != KIND_ID["circle"]
    assert set(np.unique(angles[non_circle])) <= {0., 45., 90., 135., 180.}
    # circles forced to angle 0 (src/sample.py:187)
    assert (angles[~non_circle] == 0).all()

    colors = np.asarray(st.color)[valid]
    assert colors.min() >= 30 - 1 and colors.max() <= 220  # src/sample.py:5


def test_grid_mode_distinct_cells():
    st = _many(100, n=3, use_grid=True)
    cx = np.asarray(st.cx)
    cy = np.asarray(st.cy)
    valid = np.asarray(st.valid)
    cell = W / 3
    for b in range(100):
        cells = set()
        for e in range(E):
            if not valid[b, e]:
                continue
            cells.add((int(cx[b, e] // cell), int(cy[b, e] // cell)))
        # distinct shuffled cells (src/sample.py:61-70)
        assert len(cells) == valid[b].sum()


def test_positions_respect_margins():
    st = _many(200, n=1)
    valid = np.asarray(st.valid)
    cx = np.asarray(st.cx)[valid]
    cy = np.asarray(st.cy)[valid]
    size = np.asarray(st.size)[valid]
    assert (cx >= size / 2 + 4).all() and (cx <= W - size / 2 - 4).all()
    assert (cy >= size / 2 + 4).all() and (cy <= H - size / 2 - 4).all()


def test_bbox_clipped_to_canvas():
    st = _many(200)
    valid = np.asarray(st.valid)
    bbox = np.asarray(st.bbox)[valid]
    assert (bbox[:, 0] >= 0).all() and (bbox[:, 1] >= 0).all()
    assert (bbox[:, 0] + bbox[:, 2] <= W + 0.5).all()
    assert (bbox[:, 1] + bbox[:, 3] <= H + 0.5).all()


def test_arrangements_match_reference_layout():
    """Deterministic arrangements: centers within jitter(<=10px)+clamp of the
    reference's closed-form positions (reference src/sample.py:86-146)."""
    import sys
    from .conftest import REFERENCE_SRC
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import sample as ref_sample

    W = H = 512
    for arr in ("horizontal", "vertical", "diagonal", "circular"):
        st = sample_prototype(jax.random.key(3), W, H, 8, n=3,
                              arrangement=arr)
        ours = np.stack([np.asarray(st.cx)[:3], np.asarray(st.cy)[:3]], 1)
        proto = ref_sample.populate_prototype(W, H, seed=0, use_grid=False,
                                              sample_num=3, arrangement=arr)
        ref = np.array([e["center"] for e in proto["elements"]], float)
        # jitter is min(size//4, 10) on each axis in both implementations;
        # sizes differ across draws, so allow jitter from both + clamping
        assert np.abs(ours - ref).max() <= 2 * 10 + 24, (arr, ours, ref)


def test_arrangement_single_element_centered():
    st = sample_prototype(jax.random.key(1), 512, 512, 8, n=1,
                          arrangement="horizontal")
    assert abs(float(st.cx[0]) - 256) <= 10
    assert abs(float(st.cy[0]) - 256) <= 10


def test_arrangement_unknown_raises():
    import pytest
    with pytest.raises(ValueError):
        sample_prototype(jax.random.key(0), 256, 256, 8, arrangement="spiral")
