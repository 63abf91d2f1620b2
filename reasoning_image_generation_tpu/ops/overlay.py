# overlay.py — external raster overlay compositing (device).
"""External-image overlays on rendered frames.

The reference's Shape.draw accepts external images/textures (file path /
PIL / ndarray) and alpha-blends them centered on the element with resize /
rotate / flip / tile / opacity options and wrap-around
(reference src/shapes.py:84-196, 304-351).  Here the capability is a
device-side post-pass:

- host loads bytes -> RGBA array (PIL/cv2 if available);
- resize / rotate / flip run as jax ops (jax.image.resize + coordinate
  rotation), so repeated stamping of one texture stays on device;
- blending evaluates the overlay texture at wrapped canvas coordinates
  (nearest sample) and alpha-composites — the wrap mod replaces the
  reference's 3x3 redraw loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def load_external_image(obj) -> np.ndarray:
    """Normalize path / PIL image / ndarray to RGBA u8 (host side).

    SVG paths rasterize through cairosvg when installed, mirroring the
    reference's optional dependency (reference src/shapes.py:96-104)."""
    if isinstance(obj, str):
        if obj.lower().endswith(".svg"):
            try:
                import cairosvg
                from io import BytesIO
                from PIL import Image
                png = cairosvg.svg2png(url=obj)
                return np.asarray(Image.open(BytesIO(png)).convert("RGBA"))
            except ImportError as e:
                raise RuntimeError(
                    "cairosvg (and PIL) are required to rasterize SVG "
                    "files; provide PNG/JPG instead") from e
        try:
            from PIL import Image
            img = np.asarray(Image.open(obj).convert("RGBA"))
            return img
        except ImportError:
            import cv2
            bgr = cv2.imread(obj, cv2.IMREAD_UNCHANGED)
            if bgr is None:
                raise FileNotFoundError(obj)
            if bgr.ndim == 2:
                bgr = cv2.cvtColor(bgr, cv2.COLOR_GRAY2BGR)
            if bgr.shape[2] == 3:
                a = np.full(bgr.shape[:2] + (1,), 255, np.uint8)
                bgr = np.concatenate([bgr, a], 2)
            return bgr[..., [2, 1, 0, 3]]
    arr = np.asarray(obj)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, 2)
    if arr.shape[2] == 3:
        arr = np.concatenate(
            [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], 2)
    return arr.astype(np.uint8)


def prepare_overlay(rgba: jnp.ndarray, target_size=None, rotate: float = 0.0,
                    flip: str | None = None, tile_to=None) -> jnp.ndarray:
    """Resize / rotate / flip / tile an RGBA overlay (device ops).

    Mirrors the reference option set: clockwise-positive rotation, flip
    'horizontal'|'vertical'|'both', tile mode repeats then crops
    (reference src/shapes.py:122-137, 332-337)."""
    img = jnp.asarray(rgba, jnp.float32)
    if target_size is not None:
        tw, th = int(target_size[0]), int(target_size[1])
        img = jax.image.resize(img, (th, tw, 4), "linear", antialias=True)
    if rotate:
        h, w = img.shape[:2]
        a = jnp.deg2rad(-float(rotate))  # clockwise-positive
        ca, sa = jnp.cos(a), jnp.sin(a)
        yy, xx = jnp.mgrid[0:h, 0:w]
        xc, yc = xx - w / 2.0, yy - h / 2.0
        # inverse-rotate sample coords
        sx = (xc * ca + yc * sa + w / 2.0)
        sy = (-xc * sa + yc * ca + h / 2.0)
        sxi = jnp.clip(jnp.round(sx), 0, w - 1).astype(jnp.int32)
        syi = jnp.clip(jnp.round(sy), 0, h - 1).astype(jnp.int32)
        valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))
        img = img[syi, sxi] * valid[..., None]
    if flip in ("horizontal", "both"):
        img = img[:, ::-1]
    if flip in ("vertical", "both"):
        img = img[::-1]
    if tile_to is not None:
        tw, th = int(tile_to[0]), int(tile_to[1])
        h, w = img.shape[:2]
        reps_y = -(-th // h)
        reps_x = -(-tw // w)
        img = jnp.tile(img, (reps_y, reps_x, 1))[:th, :tw]
    return img


@partial(jax.jit, static_argnames=("wrap",))
def blend_overlay(canvas: jnp.ndarray, overlay_rgba: jnp.ndarray,
                  center, opacity: float = 1.0, wrap: bool = True):
    """Alpha-composite an RGBA overlay centered at `center` onto an RGB u8
    canvas, with toroidal wrap (reference src/shapes.py:170-196, 339-348)."""
    H, W = canvas.shape[:2]
    ho, wo = overlay_rgba.shape[:2]
    cx, cy = center
    px = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    py = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    if wrap:
        px = cx + jnp.mod(px - cx + W / 2.0, W) - W / 2.0
        py = cy + jnp.mod(py - cy + H / 2.0, H) - H / 2.0
    u = px - (cx - wo // 2)
    v = py - (cy - ho // 2)
    ui = jnp.clip(u, 0, wo - 1).astype(jnp.int32)
    vi = jnp.clip(v, 0, ho - 1).astype(jnp.int32)
    inside = (u >= 0) & (u < wo) & (v >= 0) & (v < ho)
    sample = overlay_rgba[vi, ui]
    a = (sample[..., 3] / 255.0) * jnp.clip(opacity, 0.0, 1.0) * inside
    out = (canvas.astype(jnp.float32) * (1.0 - a[..., None]) +
           sample[..., :3] * a[..., None])
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
