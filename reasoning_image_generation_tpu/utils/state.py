# state.py — struct-of-arrays element state (the central datum).
"""ElementState: the masked struct-of-arrays equivalent of the reference's
per-element dict ``{kind, size, fill, stroke_width, center, angle, bbox,
flip, color}`` (reference src/sample.py:212-222).

Every field is an array whose trailing element axis has a fixed size
``max_elems``; ``valid`` masks the live slots.  Leading axes are free
(batch, sequence, option, ...), so the whole pipeline — sampling, rule
application, rendering — vmaps/scans over states without reshaping.

Colors are stored RGB in [0,255] float32.  The reference stores BGR tuples
because it renders with OpenCV (reference src/utils.py:7-21); we keep RGB
internally and only convert at the OpenCV-oracle test boundary.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ElementState(NamedTuple):
    """A frame of elements.  All arrays share leading dims + element axis E."""

    kind: jnp.ndarray      # i32 [..., E]   index into config.SHAPE_KINDS
    size: jnp.ndarray      # f32 [..., E]   full side/diameter in pixels
    fill: jnp.ndarray      # bool [..., E]
    stroke: jnp.ndarray    # f32 [..., E]   outline stroke width
    cx: jnp.ndarray        # f32 [..., E]
    cy: jnp.ndarray        # f32 [..., E]
    angle: jnp.ndarray     # f32 [..., E]   degrees, clockwise-positive
    flip_h: jnp.ndarray    # bool [..., E]
    flip_v: jnp.ndarray    # bool [..., E]
    color: jnp.ndarray     # f32 [..., E, 3] RGB 0-255
    bbox: jnp.ndarray      # f32 [..., E, 4] (x, y, w, h) axis-aligned
    valid: jnp.ndarray     # bool [..., E]

    @property
    def num_slots(self) -> int:
        return self.kind.shape[-1]

    def count(self) -> jnp.ndarray:
        """Number of live elements (i32 [...])."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def at_set(self, field: str, idx, value) -> "ElementState":
        """Return a new state with state.<field>[..., idx] = value."""
        arr = getattr(self, field)
        return self._replace(**{field: arr.at[..., idx].set(value)})


def empty_state(max_elems: int, leading=()) -> ElementState:
    """All-invalid state with the given leading dims."""
    shp = tuple(leading) + (max_elems,)
    f32 = lambda extra=(): jnp.zeros(shp + extra, jnp.float32)
    return ElementState(
        kind=jnp.zeros(shp, jnp.int32),
        size=f32(), fill=jnp.zeros(shp, bool), stroke=jnp.ones(shp, jnp.float32),
        cx=f32(), cy=f32(), angle=f32(),
        flip_h=jnp.zeros(shp, bool), flip_v=jnp.zeros(shp, bool),
        color=f32((3,)), bbox=f32((4,)),
        valid=jnp.zeros(shp, bool),
    )


def recompute_bbox_from_center(state: ElementState, W: int, H: int) -> ElementState:
    """bbox = size-square centered at (cx,cy), clipped to canvas.

    Mirrors the bbox derivation + clipping of reference src/sample.py:191-210.
    """
    half = state.size // 2
    bx = state.cx - half
    by = state.cy - half
    bw = state.size
    bh = state.size
    # clip left/top: shrink by the amount shifted
    shift_x = jnp.maximum(0.0, -bx)
    shift_y = jnp.maximum(0.0, -by)
    bx = jnp.maximum(bx, 0.0)
    by = jnp.maximum(by, 0.0)
    bw = jnp.maximum(1.0, bw - shift_x)
    bh = jnp.maximum(1.0, bh - shift_y)
    bw = jnp.where(bx + bw > W, jnp.maximum(1.0, W - bx), bw)
    bh = jnp.where(by + bh > H, jnp.maximum(1.0, H - by), bh)
    return state._replace(bbox=jnp.stack([bx, by, bw, bh], axis=-1))


# ---------------------------------------------------------------------------
# Host-side conversion to/from the reference element-dict schema
# ---------------------------------------------------------------------------

def state_to_dicts(state: ElementState, kinds=None) -> list:
    """Convert a single (unbatched) frame to the reference element-dict list.

    Output schema matches reference src/sample.py:212-222 so meta.json stays
    byte-compatible in structure.
    """
    from .config import SHAPE_KINDS
    kinds = kinds or SHAPE_KINDS
    arr = {f: np.asarray(getattr(state, f)) for f in state._fields}
    idx = np.nonzero(arr["valid"])[0]
    if idx.size == 0:
        return []

    # vectorized conversion: this runs ~9x per sample on the export path
    # (every frame of every sample's meta), and per-scalar
    # int(round(float(...))) was ~1 s/1k samples of the grid-only window.
    # np.rint in float64 == Python round() (both half-to-even on the same
    # float64 values); .tolist() converts to native types in C.
    def ri(a):
        return np.rint(a[idx].astype(np.float64)).astype(np.int64).tolist()

    kind = arr["kind"][idx].tolist()
    size, stroke = ri(arr["size"]), ri(arr["stroke"])
    cx, cy = ri(arr["cx"]), ri(arr["cy"])
    angle = arr["angle"][idx].astype(np.float64).tolist()
    bbox = ri(arr["bbox"])
    fill = arr["fill"][idx].tolist()
    fh = arr["flip_h"][idx].tolist()
    fv = arr["flip_v"][idx].tolist()
    # the reference's color tuple round-trips to the saved file's RGB
    # (BGR canvas + _to_bgr_tuple + BGR imwrite cancel out), so we
    # store it verbatim.
    color = ri(arr["color"])
    return [{
        "kind": kinds[k],
        "size": s,
        "fill": f,
        "stroke_width": sw,
        "center": (x, y),
        "angle": a,
        "bbox": tuple(bb),
        "flip": {"h": h, "v": v},
        "color": tuple(c),
    } for k, s, f, sw, x, y, a, bb, h, v, c in zip(
        kind, size, fill, stroke, cx, cy, angle, bbox, fh, fv, color)]


def dicts_to_state(elements: list, max_elems: int) -> ElementState:
    """Inverse of state_to_dicts (for tests / interop)."""
    from .config import KIND_ID
    st = empty_state(max_elems)
    arrs = {f: np.asarray(getattr(st, f)).copy() for f in st._fields}
    for i, el in enumerate(elements[:max_elems]):
        arrs["kind"][i] = KIND_ID[el["kind"]]
        arrs["size"][i] = el["size"]
        arrs["fill"][i] = bool(el.get("fill", True))
        arrs["stroke"][i] = el.get("stroke_width", 1)
        arrs["cx"][i], arrs["cy"][i] = el["center"]
        arrs["angle"][i] = el.get("angle", 0.0) or 0.0
        flip = el.get("flip", {}) or {}
        arrs["flip_h"][i] = bool(flip.get("h", False))
        arrs["flip_v"][i] = bool(flip.get("v", False))
        color = el.get("color") or (0, 0, 0)
        arrs["color"][i] = np.asarray(color, np.float32)
        arrs["bbox"][i] = el.get("bbox", (0, 0, el["size"], el["size"]))
        arrs["valid"][i] = True
    return ElementState(**{k: jnp.asarray(v) for k, v in arrs.items()})
