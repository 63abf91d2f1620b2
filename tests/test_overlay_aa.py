# test_overlay_aa.py — external overlays, AA modes, element_transfer rule.
import jax
import jax.numpy as jnp
import numpy as np

from reasoning_image_generation_tpu.ops.overlay import (
    load_external_image, prepare_overlay, blend_overlay)
from reasoning_image_generation_tpu.ops.raster import render_frame
from reasoning_image_generation_tpu.utils.state import dicts_to_state


def _elem(kind="square", size=120, center=(128, 128), fill=True):
    return {"kind": kind, "size": size, "fill": fill, "stroke_width": 2,
            "center": center, "angle": 0.0, "bbox": (0, 0, size, size),
            "flip": {"h": False, "v": False}, "color": (200, 40, 40)}


def test_load_external_image_shapes():
    rgb = np.zeros((10, 12, 3), np.uint8)
    out = load_external_image(rgb)
    assert out.shape == (10, 12, 4) and (out[..., 3] == 255).all()
    gray = np.zeros((5, 6), np.uint8)
    assert load_external_image(gray).shape == (5, 6, 4)


def test_prepare_overlay_resize_flip_tile():
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:, :4] = [255, 0, 0, 255]
    rgba[:, 4:] = [0, 0, 255, 255]
    out = np.asarray(prepare_overlay(jnp.asarray(rgba), target_size=(16, 16)))
    assert out.shape == (16, 16, 4)
    flipped = np.asarray(prepare_overlay(jnp.asarray(rgba), flip="horizontal"))
    assert flipped[0, 0, 2] == 255  # blue now on the left
    tiled = np.asarray(prepare_overlay(jnp.asarray(rgba), tile_to=(20, 12)))
    assert tiled.shape == (12, 20, 4)


def test_blend_overlay_center_and_wrap():
    canvas = jnp.full((64, 64, 3), 255, jnp.uint8)
    ov = np.zeros((16, 16, 4), np.float32)
    ov[..., 1] = 200
    ov[..., 3] = 255
    out = np.asarray(blend_overlay(canvas, jnp.asarray(ov), (32, 32)))
    assert (out[32, 32] == [0, 200, 0]).all()
    assert (out[5, 5] == 255).all()
    # wrap: overlay centered at (0,0) shows in all four corners
    out2 = np.asarray(blend_overlay(canvas, jnp.asarray(ov), (0, 0)))
    for y, x in [(0, 0), (0, 62), (62, 0), (62, 62)]:
        assert (out2[y, x] == [0, 200, 0]).all(), (y, x)
    # opacity
    out3 = np.asarray(blend_overlay(canvas, jnp.asarray(ov), (32, 32),
                                    opacity=0.5))
    assert 120 < out3[32, 32, 0] < 135  # 255*(1-.5)


def test_aa_modes_run_and_differ():
    st = dicts_to_state([_elem("triangle")], 8)
    fast = np.asarray(render_frame(st, 256, 256))
    soft = np.asarray(render_frame(st, 256, 256, antialias_mode="soft"))
    hq = np.asarray(render_frame(st, 256, 256, antialias_mode="hq", scale=2))
    assert fast.shape == soft.shape == hq.shape
    # soft mode bleeds fill outward -> differs from fast near edges
    # (the visible delta is bounded because the stroke band overlaps the ramp)
    assert (np.abs(fast.astype(int) - soft.astype(int)) > 3).any()
    # hq stays close to fast but not identical (smoother edges)
    d = np.abs(fast.astype(int) - hq.astype(int))
    assert d.max() > 0 and (d > 64).mean() < 0.01


def test_element_transfer_rule():
    from reasoning_image_generation_tpu.models.rpm import rules as R
    from reasoning_image_generation_tpu.models.rpm.sampler import sample_prototype
    st = sample_prototype(jax.random.key(0), 256, 256, 8, n=2)
    init_fn, step_fn = R.RULES["元素传递"]
    p = init_fn(jax.random.key(1), st, False, 256, 256)
    out, _ = step_fn(st, st, p, jax.random.key(2), jnp.asarray(1),
                     False, 256, 256)
    assert int(np.asarray(out.count())) == 3
    # new element sits at canvas center with the biggest prev size
    new_idx = 2
    assert float(np.asarray(out.cx)[new_idx]) == 128.0
    assert float(np.asarray(out.size)[new_idx]) == float(np.asarray(st.size).max())
