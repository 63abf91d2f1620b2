# test_ks_distributions.py — two-sample KS tests vs the reference sampler.
"""The RNG contract is identical *distributions*, not identical draws
(docs/VALIDATION.md).  These tests draw a few hundred prototypes from the
reference's populate_prototype (reference src/sample.py:9) and from our
sample_prototype and compare the continuous marginals with a two-sample
Kolmogorov-Smirnov statistic and the discrete marginals with frequency
deltas, at alpha = 0.001 so CI stays stable."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .conftest import REFERENCE_SRC
from reasoning_image_generation_tpu.models.rpm.sampler import sample_prototype

N_DRAWS = 400
W = H = 512


def _ks_stat(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample KS statistic D = sup |F_a - F_b|."""
    a = np.sort(np.asarray(a, np.float64))
    b = np.sort(np.asarray(b, np.float64))
    allv = np.concatenate([a, b])
    fa = np.searchsorted(a, allv, side="right") / len(a)
    fb = np.searchsorted(b, allv, side="right") / len(b)
    return float(np.abs(fa - fb).max())


def _ks_crit(n: int, m: int, c_alpha: float = 1.949) -> float:
    # c(0.001) = 1.949 (Smirnov); both samples are iid draws
    return c_alpha * np.sqrt((n + m) / (n * m))


def _ref_draws(use_grid: bool):
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import sample as ref_sample  # noqa
    out = {"size": [], "cx": [], "cy": [], "angle": [], "kind": [],
           "fill": [], "stroke": [], "n": []}
    for i in range(N_DRAWS):
        proto = ref_sample.populate_prototype(W, H, seed=10_000 + i,
                                              use_grid=use_grid)
        els = proto["elements"]
        out["n"].append(len(els))
        for el in els:
            out["size"].append(el["size"])
            out["cx"].append(el["center"][0])
            out["cy"].append(el["center"][1])
            out["angle"].append(el["angle"])
            out["kind"].append(el["kind"])
            out["fill"].append(el["fill"])
            out["stroke"].append(el["stroke_width"])
    return out


def _our_draws(use_grid: bool):
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(7), i))(
        jnp.arange(N_DRAWS))
    st = jax.vmap(lambda k: sample_prototype(k, W, H, 8,
                                             use_grid=use_grid))(keys)
    valid = np.asarray(st.valid, bool)
    from reasoning_image_generation_tpu.utils.config import SHAPE_KINDS
    return {
        "size": np.asarray(st.size)[valid],
        "cx": np.asarray(st.cx)[valid],
        "cy": np.asarray(st.cy)[valid],
        "angle": np.asarray(st.angle)[valid],
        "kind": [SHAPE_KINDS[k] for k in np.asarray(st.kind)[valid]],
        "fill": np.asarray(st.fill)[valid],
        "stroke": np.asarray(st.stroke)[valid],
        "n": valid.sum(1),
    }


def _compare(ref, ours):
    # continuous / many-valued marginals: KS
    for field in ("size", "cx", "cy"):
        d = _ks_stat(ref[field], ours[field])
        crit = _ks_crit(len(ref[field]), len(ours[field]))
        assert d < crit, f"{field}: D={d:.4f} crit={crit:.4f}"
    # discrete marginals: max frequency delta < 5 sigma of a multinomial
    for field, support in (("angle", [0.0, 45.0, 90.0, 135.0, 180.0]),
                           ("stroke", [1, 2, 3]),
                           ("n", [1, 2, 3])):
        rv = np.asarray(ref[field], float)
        ov = np.asarray(ours[field], float)
        for v in support:
            fr, fo = (rv == v).mean(), (ov == v).mean()
            sig = np.sqrt(0.25 / len(rv)) + np.sqrt(0.25 / len(ov))
            assert abs(fr - fo) < 5 * sig, (field, v, fr, fo)
    # fill is Bernoulli(2/3)
    fr, fo = np.mean(ref["fill"]), np.mean(np.asarray(ours["fill"], float))
    assert abs(fr - fo) < 0.08, (fr, fo)
    # kinds uniform over 11
    from collections import Counter
    cr = Counter(ref["kind"])
    co = Counter(ours["kind"])
    nr, no = len(ref["kind"]), len(ours["kind"])
    for k in set(cr) | set(co):
        assert abs(cr[k] / nr - co[k] / no) < 0.06, k


def test_ks_random_arrangement():
    _compare(_ref_draws(use_grid=False), _our_draws(use_grid=False))


def test_ks_grid_mode():
    ref, ours = _ref_draws(use_grid=True), _our_draws(use_grid=True)
    _compare(ref, ours)
    # grid mode pins size to 0.6*cell
    assert set(np.unique(ours["size"])) == set(np.unique(ref["size"]))


def test_ks_self_consistency():
    # sanity: two independent reference draws should also pass KS
    a = _ref_draws(use_grid=False)
    sizes_b = []
    import sample as ref_sample  # path installed by _ref_draws
    for i in range(N_DRAWS):
        proto = ref_sample.populate_prototype(W, H, seed=50_000 + i)
        sizes_b += [el["size"] for el in proto["elements"]]
    d = _ks_stat(a["size"], sizes_b)
    assert d < _ks_crit(len(a["size"]), len(sizes_b))
