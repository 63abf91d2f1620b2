# test_distributions.py — sampled-distribution parity vs the reference.
"""The RNG contract is identical *distributions*, not identical draws
(SURVEY.md §7.3).  These tests draw large samples from the reference's
populate_prototype and from our sampler and compare the marginals."""
import sys
from collections import Counter

import jax
import numpy as np
import pytest

from .conftest import REFERENCE_SRC, has_reference

from reasoning_image_generation_tpu.models.rpm.sampler import sample_prototype
from reasoning_image_generation_tpu.utils.config import SHAPE_KINDS

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

N = 300
W = H = 512


def _reference_elements(use_grid=False):
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import sample as ref_sample
    els = []
    for i in range(N):
        st = ref_sample.populate_prototype(W, H, seed=1000 + i,
                                           use_grid=use_grid)
        els.append(st["elements"])
    return els


def _our_elements(use_grid=False):
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(7), i))(
        np.arange(N))
    st = jax.vmap(lambda k: sample_prototype(k, W, H, 8, use_grid=use_grid))(keys)
    valid = np.asarray(st.valid)
    out = []
    for b in range(N):
        frame = []
        for e in range(8):
            if valid[b, e]:
                frame.append({
                    "kind": SHAPE_KINDS[int(np.asarray(st.kind)[b, e])],
                    "size": float(np.asarray(st.size)[b, e]),
                    "angle": float(np.asarray(st.angle)[b, e]),
                    "fill": bool(np.asarray(st.fill)[b, e]),
                    "center": (float(np.asarray(st.cx)[b, e]),
                               float(np.asarray(st.cy)[b, e])),
                })
        out.append(frame)
    return out


@pytest.fixture(scope="module")
def corpora():
    return _reference_elements(), _our_elements()


def test_element_count_distribution_matches(corpora):
    ref, ours = corpora
    rc = Counter(len(f) for f in ref)
    oc = Counter(len(f) for f in ours)
    for n in (1, 2, 3):
        assert abs(rc[n] - oc[n]) / N < 0.12, (n, rc[n], oc[n])


def test_kind_marginal_matches(corpora):
    ref, ours = corpora
    rk = Counter(el["kind"] for f in ref for el in f)
    ok = Counter(el["kind"] for f in ours for el in f)
    rtot = sum(rk.values())
    otot = sum(ok.values())
    for k in SHAPE_KINDS:
        assert abs(rk[k] / rtot - ok[k] / otot) < 0.05, k


def test_size_distribution_matches(corpora):
    ref, ours = corpora
    rs = np.asarray([el["size"] for f in ref for el in f], float)
    os_ = np.asarray([el["size"] for f in ours for el in f], float)
    # base = 128 +- 42 (reference src/sample.py:80-82)
    assert abs(rs.mean() - os_.mean()) < 6
    assert abs(rs.std() - os_.std()) < 8
    assert abs(np.percentile(rs, 10) - np.percentile(os_, 10)) < 10
    assert abs(np.percentile(rs, 90) - np.percentile(os_, 90)) < 10


def test_angle_and_fill_marginals_match(corpora):
    ref, ours = corpora
    ra = Counter(el["angle"] for f in ref for el in f)
    oa = Counter(el["angle"] for f in ours for el in f)
    rtot = sum(ra.values())
    otot = sum(oa.values())
    for a in (0.0, 45.0, 90.0, 135.0, 180.0):
        assert abs(ra[a] / rtot - oa[a] / otot) < 0.06, a

    rfill = np.mean([el["fill"] for f in ref for el in f])
    ofill = np.mean([el["fill"] for f in ours for el in f])
    assert abs(rfill - ofill) < 0.07


def test_grid_positions_match(corpora_grid=None):
    ref = _reference_elements(use_grid=True)
    ours = _our_elements(use_grid=True)
    cell = W / 3

    def cells(frames):
        c = Counter()
        for f in frames:
            for el in f:
                cx, cy = el["center"]
                c[(int(min(cx // cell, 2)), int(min(cy // cell, 2)))] += 1
        return c

    rc, oc = cells(ref), cells(ours)
    rtot, otot = sum(rc.values()), sum(oc.values())
    for cellpos in rc:
        assert abs(rc[cellpos] / rtot - oc[cellpos] / otot) < 0.05, cellpos
