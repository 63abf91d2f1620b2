# shapes.py — Shape.draw-compatible single-shape drawing API.
"""Drop-in equivalent of the reference's ``Shape`` drawing primitive.

The reference exposes ``Shape(kind, size, fill, stroke_width).draw(image,
center, angle, color, outline, flip_mode, **kw)`` as its public one-shape
renderer (reference src/shapes.py:201-666), including:

- three antialias modes ``fast`` / ``soft`` / ``hq`` (src/shapes.py:658-665),
- toroidal wrap-around drawing (src/shapes.py:260-266),
- an *external raster overlay* path: ``external_image`` / ``overlay_image`` /
  ``texture`` kwargs with ``external_size`` (factor vs absolute rule,
  src/shapes.py:310-324), ``external_rotate`` / ``external_flip`` /
  ``external_opacity`` / ``external_mode='tile'`` / ``external_only``, drawn
  *under* the vector shape, silently skipped on load failure
  (src/shapes.py:304-355).

Here the same surface is served by the framework's SDF rasterizer
(`ops.raster.composite_element`) and device overlay ops (`ops.overlay`), so a
reference user can switch per-shape drawing code without changes.  Convention
note: arrays are channel-verbatim.  The reference holds BGR arrays and
reverses ``color`` tuples before writing (src/shapes.py:55-56); after its
final BGR->file conversion the net effect equals drawing ``color`` verbatim
on an RGB array, which is what this implementation does.

This is the convenience path for one-off draws; batched generation should use
``ops.raster.render_batch`` / the Pallas kernel, which amortize compilation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.overlay import blend_overlay, load_external_image, prepare_overlay
from ...ops.raster import composite_element
from ...utils.config import KIND_ID, SHAPE_KINDS

__all__ = ["Shape", "draw_shape"]


def _to_array(image) -> np.ndarray:
    """Normalize PIL / 2-D / 3-D input to an RGB u8 ndarray copy
    (reference to_cv2, src/shapes.py:33-44, minus the BGR convention)."""
    if not isinstance(image, np.ndarray):
        image = np.asarray(image)  # PIL images expose __array__
    if image.ndim == 2:
        image = np.repeat(image[..., None], 3, axis=2)
    return np.ascontiguousarray(image[..., :3], np.uint8)


def _external_target(external_size, s: float) -> Tuple[int, int]:
    """The reference's external_size rule (src/shapes.py:310-324):
    None -> (s, s); pair -> absolute; number in (0, 4] -> factor of s;
    number > 4 -> absolute square; str -> factor of s."""
    if external_size is None:
        return int(round(s)), int(round(s))
    if isinstance(external_size, (list, tuple)) and len(external_size) == 2:
        return int(external_size[0]), int(external_size[1])
    if isinstance(external_size, str):
        f = float(external_size)
        return int(round(s * f)), int(round(s * f))
    v = float(external_size)
    if 0 < v <= 4.0:
        return int(round(s * v)), int(round(s * v))
    return int(round(v)), int(round(v))


class Shape:
    """Reference-compatible shape drawing handle (src/shapes.py:201-207)."""

    KINDS = list(SHAPE_KINDS)

    def __init__(self, kind: str = "square", size: int = 60,
                 fill: bool = True, stroke_width: int = 2):
        if kind not in KIND_ID:
            raise ValueError(f"unknown kind {kind!r}; one of {self.KINDS}")
        self.kind = kind
        self.size = size
        self.fill = fill
        self.stroke_width = stroke_width

    # -- drawing ----------------------------------------------------------
    def draw(self, image, center: Tuple[int, int], angle: float = 0.0,
             color=None, outline=(0, 0, 0), flip_mode: Optional[str] = None,
             **kwargs) -> np.ndarray:
        """Draw this shape (and/or an external overlay) onto `image`.

        Mirrors reference src/shapes.py:209-666: clockwise-positive angle,
        wrap-around, AA modes via ``antialias_mode``/``scale``/``soft_blur``,
        full ``external_*`` kwarg set.  Returns a new RGB u8 ndarray.
        """
        antialias_mode = kwargs.get("antialias_mode", "fast")
        scale = int(kwargs.get("scale", 1))
        soft_blur = int(kwargs.get("soft_blur", 7))

        # first non-None of the three aliases.  (The reference `or`-chains
        # these, src/shapes.py:220, which raises on ndarray inputs — its
        # draw() only accepts path/PIL externals in practice; we accept
        # ndarrays too.)
        external_obj = next(
            (kwargs[k] for k in ("external_image", "overlay_image", "texture")
             if kwargs.get(k) is not None), None)
        external_only = bool(kwargs.get("external_only", False))

        img = _to_array(image)
        H, W = img.shape[:2]
        cx, cy = int(center[0]), int(center[1])
        if color is None:  # reference rand_color (src/utils.py:12-14)
            color = tuple(int(c) for c in np.random.randint(30, 221, 3))

        if antialias_mode == "hq" and scale > 1:
            # supersample the whole canvas, draw at scale, downsample
            # (reference _supersample_and_draw, src/shapes.py:72-81)
            hi = jax.image.resize(jnp.asarray(img, jnp.float32),
                                  (H * scale, W * scale, 3), "cubic")
            hi = self._draw_inner(hi, W, H, cx, cy, angle, color, outline,
                                  flip_mode, kwargs, external_obj,
                                  external_only, soft_blur=0.0)
            lo = jax.image.resize(hi, (H, W, 3), "lanczos3", antialias=True)
            return np.asarray(jnp.clip(jnp.round(lo), 0, 255)
                              .astype(jnp.uint8))

        sb = float(soft_blur) if antialias_mode == "soft" else 0.0
        out = self._draw_inner(jnp.asarray(img, jnp.float32), W, H, cx, cy,
                               angle, color, outline, flip_mode, kwargs,
                               external_obj, external_only, soft_blur=sb)
        return np.asarray(jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8))

    def _draw_inner(self, canvas: jnp.ndarray, W: int, H: int, cx: int,
                    cy: int, angle: float, color, outline, flip_mode,
                    kwargs: dict, external_obj, external_only: bool,
                    soft_blur: float) -> jnp.ndarray:
        """Overlay first, then vector shape (reference src/shapes.py:304-366).
        `canvas` may be supersampled; scale inferred from its width."""
        Hc, Wc = canvas.shape[:2]
        ratio = Wc / float(W)
        cx_s, cy_s = int(round(cx * ratio)), int(round(cy * ratio))
        s_s = self.size * ratio

        if external_obj is not None:
            canvas = self._draw_external(canvas, cx_s, cy_s, s_s, kwargs,
                                         external_obj)
        if external_only:  # reference src/shapes.py:354-355
            return canvas

        px = jnp.arange(Wc, dtype=jnp.float32)[None, :].repeat(Hc, 0)
        py = jnp.arange(Hc, dtype=jnp.float32)[:, None].repeat(Wc, 1)
        fh = flip_mode in ("horizontal", "both")
        fv = flip_mode in ("vertical", "both")
        return composite_element(
            canvas, px, py, Wc, Hc,
            jnp.int32(KIND_ID[self.kind]), jnp.float32(s_s),
            jnp.asarray(bool(self.fill)),
            jnp.float32(max(1, round(self.stroke_width * ratio))),
            jnp.float32(cx_s), jnp.float32(cy_s),
            # the reference rasterizes integer-rounded vertex coords of the
            # float angle; we keep the float angle (sub-pixel accurate)
            jnp.float32(angle),
            jnp.asarray(fh), jnp.asarray(fv),
            jnp.asarray(color, jnp.float32), jnp.asarray(True),
            soft_blur=soft_blur,
            outline_color=jnp.asarray(outline, jnp.float32))

    def _draw_external(self, canvas: jnp.ndarray, cx_s: int, cy_s: int,
                       s_s: float, kwargs: dict, external_obj) -> jnp.ndarray:
        """External overlay: load → resize/rotate/flip → (tile) → wrapped
        alpha blend; any failure silently falls back to the vector shape
        (reference src/shapes.py:304-353).

        The rotate step keeps the image extent fixed (the reference's
        ndarray/cv2 branch, src/shapes.py:127-131; its PIL branch expands the
        extent on rotate, which we do not replicate)."""
        try:
            tw, th = _external_target(kwargs.get("external_size"), s_s)
            rgba = load_external_image(external_obj)
            ov = prepare_overlay(
                jnp.asarray(rgba), target_size=(tw, th),
                rotate=float(kwargs.get("external_rotate", 0.0)),
                flip=kwargs.get("external_flip"),
                tile_to=(tw, th) if kwargs.get("external_mode") == "tile"
                else None)
            # hq mode hands us a cubic-resized canvas that may overshoot u8
            canvas_u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)
            return blend_overlay(
                canvas_u8, ov, (float(cx_s), float(cy_s)),
                opacity=float(kwargs.get("external_opacity", 1.0)),
                wrap=True).astype(jnp.float32)
        except Exception:
            return canvas


def draw_shape(image, kind: str, center: Tuple[int, int], size: int = 60,
               fill: bool = True, stroke_width: int = 2, **draw_kwargs
               ) -> np.ndarray:
    """Functional one-call form of Shape(...).draw(...)."""
    return Shape(kind, size, fill, stroke_width).draw(image, center,
                                                      **draw_kwargs)
