# test_raster.py — SDF rasterizer pixel parity vs the cv2 reference oracle.
import numpy as np
import pytest

from reasoning_image_generation_tpu.utils.config import SHAPE_KINDS
from reasoning_image_generation_tpu.utils.state import dicts_to_state
from reasoning_image_generation_tpu.ops.raster import render_frame

from .conftest import has_reference
from .oracle import render_reference, ssim

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def _elem(kind, size=140, center=(256, 256), angle=0.0, fill=True,
          stroke=2, color=(40, 80, 200), flip=None):
    return {
        "kind": kind, "size": size, "fill": fill, "stroke_width": stroke,
        "center": center, "angle": angle,
        "bbox": (center[0] - size // 2, center[1] - size // 2, size, size),
        "flip": flip or {"h": False, "v": False},
        "color": color,  # BGR, like the reference
    }


def _render_ours(elements, W=512, H=512, use_grid=False):
    state = dicts_to_state(elements, max_elems=8)
    img = render_frame(state, W, H, use_grid=use_grid)
    return np.asarray(img)


@pytest.mark.parametrize("kind", SHAPE_KINDS)
def test_kind_parity(kind):
    els = [_elem(kind)]
    ours = _render_ours(els)
    ref = render_reference(els)
    s = ssim(ours, ref)
    assert s > 0.99, f"{kind}: ssim={s:.4f}"


@pytest.mark.parametrize("angle", [0, 45, 90, 135])
def test_rotation_parity(angle):
    els = [_elem("triangle", angle=angle)]
    s = ssim(_render_ours(els), render_reference(els))
    assert s > 0.99, f"angle={angle}: ssim={s:.4f}"


@pytest.mark.parametrize("mode", ["soft", "hq"])
@pytest.mark.parametrize("kind,angle", [
    ("square", 45.0), ("triangle", 0.0), ("star", 45.0), ("plus", 45.0),
    ("heart", 0.0), ("crescent", 0.0), ("rounded_square", 45.0),
    ("circle", 0.0),
])
def test_soft_hq_aa_parity(mode, kind, angle):
    """soft/hq AA oracle parity vs reference Shape.draw
    (src/shapes.py:58-81,658-665) at the 0.99 BASELINE bar.

    soft = Gaussian-blurred fill mask -> erf-of-SDF model; hq = 2x
    supersample + INTER_LANCZOS4 -> exact 8-tap Lanczos matmul downscale.
    Full-sweep calibration (11 kinds x 2 angles): soft worst 0.9968, hq
    worst 0.9990."""
    import jax
    from .oracle import render_reference_shape

    els = [_elem(kind, angle=angle, center=(128, 128), size=140)]
    state = dicts_to_state(els, max_elems=8)
    ours = np.asarray(render_frame(state, 256, 256, antialias_mode=mode,
                                   scale=2, soft_blur=7))
    ref = render_reference_shape(els[0], W=256, H=256, antialias_mode=mode,
                                 scale=2, soft_blur=7)
    s = ssim(ours, ref)
    assert s > 0.99, f"{mode}/{kind}/a={angle}: ssim={s:.4f}"


def test_flip_metadata_quirk_parity():
    # Reference quirk: el['flip'] is metadata-only at render time (the
    # renderer reads 'flip_mode', never set) — reference src/generator.py:94.
    els = [_elem("triangle", angle=30, flip={"h": True, "v": False})]
    s = ssim(_render_ours(els), render_reference(els))
    assert s > 0.99, f"ssim={s:.4f}"


def test_flip_capability_mirrors_geometry():
    # honor_flip=True must actually mirror (the Shape.draw flip_mode path).
    from reasoning_image_generation_tpu.ops.raster import render_frame
    els = [_elem("triangle", angle=0, center=(150, 256))]
    state = dicts_to_state(els, max_elems=8)
    base = np.asarray(render_frame(state, 512, 512))
    state = state._replace(flip_v=state.valid)  # flip all valid elems
    flipped = np.asarray(render_frame(state, 512, 512, honor_flip=True))
    assert (np.abs(base.astype(int) - flipped.astype(int)) > 40).any()
    # vertical flip of an up-pointing triangle == 180-degree... no: mirror
    # across its own center. Compare against manually mirrored vertices:
    els2 = [dict(els[0], angle=180.0)]  # triangle is symmetric: v-flip==rot180
    rot = np.asarray(render_frame(dicts_to_state(els2, 8), 512, 512))
    assert ssim(flipped, rot) > 0.97


def test_unfilled_parity():
    els = [_elem("hexagon", fill=False, stroke=3)]
    s = ssim(_render_ours(els), render_reference(els))
    assert s > 0.99, f"ssim={s:.4f}"


def test_multi_element_painters_order():
    els = [
        _elem("square", size=200, center=(220, 250), color=(30, 200, 60)),
        _elem("circle", size=160, center=(300, 260), color=(200, 60, 30)),
        _elem("star", size=120, center=(260, 200), color=(60, 60, 220)),
    ]
    s = ssim(_render_ours(els), render_reference(els))
    assert s > 0.99, f"ssim={s:.4f}"


def test_wraparound_parity():
    # centered near the border: reference redraws at 3x3 offsets
    els = [_elem("diamond", size=120, center=(20, 256))]
    s = ssim(_render_ours(els), render_reference(els))
    assert s > 0.99, f"ssim={s:.4f}"


def test_far_offcanvas_element_not_drawn():
    """Reference wrap parity: copies exist only at the 3x3 canvas offsets
    (reference src/shapes.py:369-375), and rule_translate never clips
    centers (src/rules.py:160-173), so an element >= 2 canvases away must
    render NOTHING — not its mod-wrapped copy."""
    els = [_elem("plus", size=150, center=(230, 1334), fill=False, stroke=1)]
    ours = _render_ours(els)
    ref = render_reference(els)
    np.testing.assert_array_equal(ours, ref)  # both blank canvases
    assert (ours == 255).all()
    # exactly one canvas away still wraps onto the canvas (copy at -H)
    els2 = [_elem("plus", size=150, center=(230, 512 + 60))]
    s = ssim(_render_ours(els2), render_reference(els2))
    assert s > 0.99, f"ssim={s:.4f}"


def test_grid_mode_parity():
    els = [_elem("pentagon", size=90, center=(100, 420)),
           _elem("heart", size=90, center=(300, 128))]
    ours = _render_ours(els, use_grid=True)
    ref = render_reference(els, use_grid=True)
    s = ssim(ours, ref)
    assert s > 0.99, f"ssim={s:.4f}"
