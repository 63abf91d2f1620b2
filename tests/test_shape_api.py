# test_shape_api.py — Shape.draw-compatible API vs the reference Shape.draw.
import sys

import numpy as np
import pytest

from .conftest import REFERENCE_SRC
from .oracle import ssim

from reasoning_image_generation_tpu.models.rpm.shapes import Shape, draw_shape


def _ref_shapes():
    p = str(REFERENCE_SRC)
    if p not in sys.path:
        sys.path.insert(0, p)
    import shapes as ref_shapes  # noqa
    return ref_shapes


def _white(n=256):
    return np.full((n, n, 3), 255, np.uint8)


def test_vector_draw_matches_reference():
    ref = _ref_shapes()
    for kind, angle in [("square", 30.0), ("triangle", 45.0),
                        ("hexagon", 0.0)]:
        ours = Shape(kind, size=120, fill=True, stroke_width=2).draw(
            _white(), (128, 128), angle=angle, color=(200, 60, 60))
        # reference canvas is BGR with color reversed internally; after its
        # BGR->RGB conversion the result is color-verbatim like ours
        rimg = ref.Shape(kind, size=120, fill=True, stroke_width=2).draw(
            _white()[..., ::-1].copy(), (128, 128), angle=angle,
            color=(200, 60, 60))
        assert ssim(ours, rimg[..., ::-1]) > 0.95, kind
        assert (ours[128, 128] == [200, 60, 60]).all()


def test_external_overlay_exact_vs_reference():
    # target == source size: no interpolation anywhere, so the alpha blend
    # should match the reference blend to ±1/255.  The reference's own
    # Shape.draw crashes on ndarray externals (`or`-chained kwargs,
    # src/shapes.py:220), so compare against its _blend_overlay_alpha, the
    # component its path/PIL route uses.
    ref = _ref_shapes()
    rng = np.random.default_rng(0)
    tex_rgb = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    tex_rgb[..., 3] = rng.integers(0, 256, (32, 32), dtype=np.uint8)

    ours = Shape("square", size=60).draw(
        _white(128), (64, 64), external_image=tex_rgb,
        external_size=(32, 32), external_only=True, external_opacity=0.8)

    rimg = _white(128)[..., ::-1].copy()
    tex_bgr = tex_rgb[..., [2, 1, 0, 3]].copy()
    ref._blend_overlay_alpha(rimg, tex_bgr, (64, 64), opacity=0.8)
    diff = np.abs(ours.astype(int) - rimg[..., ::-1].astype(int))
    assert diff.max() <= 1

    # and the ndarray route our draw() additionally supports works end-to-end
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ref.Shape("square", size=60).draw(
            _white(128)[..., ::-1].copy(), (64, 64), color=(0, 0, 0),
            external_image=tex_bgr, external_only=True)


def test_external_size_factor_and_absolute():
    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:] = [0, 200, 0]
    # factor 0.5 of size 80 -> 40x40 patch centered at (64, 64)
    out = Shape("square", size=80).draw(_white(128), (64, 64),
                                        external_image=tex,
                                        external_size=0.5,
                                        external_only=True)
    green = (out[..., 1] == 200)
    ys, xs = np.nonzero(green)
    assert xs.max() - xs.min() + 1 == 40 and ys.max() - ys.min() + 1 == 40
    # absolute 48 (> 4 rule)
    out2 = Shape("square", size=80).draw(_white(128), (64, 64),
                                         external_image=tex,
                                         external_size=48,
                                         external_only=True)
    ys2, xs2 = np.nonzero(out2[..., 1] == 200)
    assert xs2.max() - xs2.min() + 1 == 48


def test_external_failure_falls_back_to_vector():
    bad = "/nonexistent/texture.png"
    out = Shape("circle", size=60, fill=True).draw(
        _white(128), (64, 64), color=(10, 10, 200), external_image=bad)
    plain = Shape("circle", size=60, fill=True).draw(
        _white(128), (64, 64), color=(10, 10, 200))
    assert (out == plain).all()
    assert (out[64, 64] == [10, 10, 200]).all()


def test_flip_outline_wrap_and_tile():
    # flip_mode mirrors geometry
    a = Shape("triangle", size=100).draw(_white(), (128, 128),
                                         color=(0, 0, 0))
    b = Shape("triangle", size=100).draw(_white(), (128, 128),
                                         color=(0, 0, 0),
                                         flip_mode="vertical")
    assert not (a == b).all()
    # outline color is honored
    o = Shape("square", size=100, fill=True, stroke_width=4).draw(
        _white(), (128, 128), color=(255, 255, 255), outline=(200, 0, 0))
    assert (o[128 - 50, 128, 0] > 150) and (o[128 - 50, 128, 1] < 100)
    # wrap-around: shape centered at the origin appears in all corners
    w = Shape("square", size=60, fill=True).draw(
        _white(128), (0, 0), color=(0, 0, 255))
    for y, x in [(2, 2), (2, 125), (125, 2), (125, 125)]:
        assert (w[y, x] == [0, 0, 255]).all(), (y, x)
    # tile mode runs and fills the target extent
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:] = [200, 0, 0]
    t = draw_shape(_white(128), "square", (64, 64), size=64,
                   external_image=tex, external_mode="tile",
                   external_only=True)
    assert (t[..., 0] == 200).sum() >= 64 * 64


def test_hq_and_soft_modes_run():
    for mode in ("soft", "hq"):
        out = Shape("heart", size=120).draw(
            _white(), (128, 128), color=(200, 40, 40),
            antialias_mode=mode, scale=2)
        assert out.shape == (256, 256, 3) and out.dtype == np.uint8
        assert (out != 255).any()


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        Shape("blob")
