# raster_pallas.py — Pallas TPU rasterization kernel with tile culling.
"""Tiled SDF rasterizer for ElementState frames.

The jnp renderer (ops/raster.py) evaluates every element at every pixel and
is HBM-bandwidth bound.  This kernel keeps the whole tile pipeline in VMEM
and adds two structural optimizations:

1. **(element, tile) culling** — a scalar bbox-vs-tile test (in the
   wrap-around metric) wrapped in `pl.when` skips whole distance-field
   evaluations; elements cover only a fraction of the canvas.
2. **edge-loop polygon evaluation** — vertices live in SMEM; a fori_loop
   over the polygon's edges (8 for most kinds, 64 for heart/rounded_square)
   evaluates distance + crossing parity for the whole [TH, TW] tile per
   iteration as full-width vector ops, carrying the running min-distance
   and crossing count in vregs.  Measured 2.6x faster than a row-sequential
   formulation ([nv, TW] work per pixel row + per-row stores), which itself
   was ~10x faster than a fully scalar per-edge loop.

Per tile, elements composite in painter's order exactly like
ops/raster.composite_element: hard fills, cv2-calibrated AA stroke bands,
analytic circle/crescent branches, plus two-part sequencing, wrap-around via
coordinate mod, grid snap/lines.  Output parity with the jnp path is
bit-exact (see tests/test_raster_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.state import ElementState
from . import geometry as G
from .raster import element_verts

NMETA = 20
TH = 64
TW = 512

# M_SMALL: part-0 polygon has <= SMALL_V real edges, so the kernel can run
# its edge pass on an 8-sublane slice instead of all 64 padded edges (the
# pad repeats vertex 0, making the slice bit-identical for small shapes).
(M_VALID, M_FILL, M_STROKE, M_R, M_G, M_B, M_CIRCLE, M_CRESCENT, M_CX, M_CY,
 M_ROUT, M_ICX, M_ICY, M_RIN, M_HASP1, M_BX0, M_BX1, M_BY0, M_BY1,
 M_SMALL) = range(NMETA)
SMALL_V = 8
# part-1 polygons (only 'plus': two 4-vert rects) must fit the small tier
assert int(np.asarray(G.NV)[:, 1].max()) <= SMALL_V


def prepare_render_data(state: ElementState, W: int, H: int, use_grid,
                        grid_size: int = 3):
    """Per-frame (unbatched) meta + verts for the kernel.

    Applies the same grid snap / angle truncation as render_frame
    (reference src/generator.py:96-122)."""
    use_grid = jnp.asarray(use_grid)
    cell_w = W / grid_size
    cell_h = H / grid_size
    col = jnp.clip(jnp.floor(state.cx / cell_w), 0, grid_size - 1)
    row = jnp.clip(jnp.floor(state.cy / cell_h), 0, grid_size - 1)
    cx = jnp.where(use_grid, jnp.trunc((col + 0.5) * cell_w), state.cx)
    cy = jnp.where(use_grid, jnp.trunc((row + 0.5) * cell_h), state.cy)
    angle = jnp.trunc(state.angle)

    verts, _nv = jax.vmap(element_verts)(
        state.kind, state.size, angle,
        jnp.zeros_like(state.flip_h), jnp.zeros_like(state.flip_v), cx, cy)
    half = state.size * 0.5
    r_out = jnp.maximum(1.0, jnp.round(half))
    r_in = jnp.round(r_out * G.CRESCENT_INNER_R)
    off = jnp.round(r_out * G.CRESCENT_OFFSET)
    a = jnp.deg2rad(-angle)
    icx = cx + jnp.round(off * jnp.cos(a))
    icy = cy + jnp.round(off * jnp.sin(a))

    is_circle = state.kind == G.CIRCLE
    is_crescent = state.kind == G.CRESCENT
    stroke_w = jnp.maximum(1.0, jnp.round(state.stroke))
    # the kernel computes alpha = clip((S + 0.28 - d)/1.28) with S from the
    # meta; store S = r_full + 1 where r_full = ceil(w/2) (cv2 LINE_AA's
    # measured full-coverage half-width, see raster._stroke_alpha) so the
    # kernel stays bit-identical to the jnp path for every stroke width.
    # For w in {1,2,3} (the sampler's range) S == w, so TPU-verified kernel
    # outputs are unchanged.
    stroke_band = jnp.where(stroke_w <= 1.0, 1.0,
                            jnp.ceil(stroke_w * 0.5) + 1.0)

    vx = verts[..., 0].reshape(verts.shape[0], -1)
    vy = verts[..., 1].reshape(verts.shape[0], -1)
    margin = stroke_w + 2.0
    bx0 = jnp.where(is_circle | is_crescent, cx - r_out, vx.min(-1)) - margin
    bx1 = jnp.where(is_circle | is_crescent, cx + r_out, vx.max(-1)) + margin
    by0 = jnp.where(is_circle | is_crescent, cy - r_out, vy.min(-1)) - margin
    by1 = jnp.where(is_circle | is_crescent, cy + r_out, vy.max(-1)) + margin

    meta = jnp.stack([
        state.valid.astype(jnp.float32),
        (state.fill & state.valid).astype(jnp.float32),
        stroke_band,
        state.color[..., 0], state.color[..., 1], state.color[..., 2],
        is_circle.astype(jnp.float32), is_crescent.astype(jnp.float32),
        cx, cy, r_out, icx, icy, r_in,
        (_nv[:, 1] > 0).astype(jnp.float32),
        bx0, bx1, by0, by1,
        (_nv[:, 0] <= SMALL_V).astype(jnp.float32),
    ], axis=-1)
    # coordinate-major vertex arrays for lane-friendly VMEM windows
    vxs = verts[..., 0]  # [E, NPART, V]
    vys = verts[..., 1]
    return meta, vxs, vys


def _make_kernel(E: int, W: int, H: int, grid_size: int):
    xs_lines = tuple(float(round(i * W / grid_size)) for i in range(1, grid_size))
    ys_lines = tuple(float(round(i * H / grid_size)) for i in range(1, grid_size))
    V = G.MAX_VERTS

    def kernel(samp_ref, meta_ref, vx_ref, vy_ref, out_ref,
               racc, gacc, bacc, fa, sa):
        i = pl.program_id(1)
        j = pl.program_id(2)
        y0 = (i * TH).astype(jnp.float32)
        x0 = (j * TW).astype(jnp.float32)
        py_col = y0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(jnp.float32)
        px_tile = x0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(jnp.float32)
        racc[:] = jnp.full((TH, TW), 255.0, jnp.float32)
        gacc[:] = jnp.full((TH, TW), 255.0, jnp.float32)
        bacc[:] = jnp.full((TH, TW), 255.0, jnp.float32)

        for e in range(E):
            valid = meta_ref[0, e, M_VALID] > 0.0
            ecx = (meta_ref[0, e, M_BX0] + meta_ref[0, e, M_BX1]) * 0.5
            ecy = (meta_ref[0, e, M_BY0] + meta_ref[0, e, M_BY1]) * 0.5
            ehw = (meta_ref[0, e, M_BX1] - meta_ref[0, e, M_BX0]) * 0.5
            ehh = (meta_ref[0, e, M_BY1] - meta_ref[0, e, M_BY0]) * 0.5
            tcx = x0 + TW * 0.5
            tcy = y0 + TH * 0.5
            dxw = jnp.abs(jnp.mod(tcx - ecx + W * 0.5, float(W)) - W * 0.5)
            dyw = jnp.abs(jnp.mod(tcy - ecy + H * 0.5, float(H)) - H * 0.5)
            hit = valid & (dxw <= TW * 0.5 + ehw) & (dyw <= TH * 0.5 + ehh)

            @pl.when(hit)
            def _():
                cx = meta_ref[0, e, M_CX]
                cy = meta_ref[0, e, M_CY]
                stroke = meta_ref[0, e, M_STROKE]
                is_circle = meta_ref[0, e, M_CIRCLE] > 0.0
                is_cres = meta_ref[0, e, M_CRESCENT] > 0.0
                is_poly = jnp.logical_not(is_circle | is_cres)
                # wrapped pixel coords (tile-wise)
                pxw_t = cx + jnp.mod(px_tile - cx + W * 0.5, float(W)) - W * 0.5
                pyw_t = cy + jnp.mod(py_col - cy + H * 0.5, float(H)) - H * 0.5

                def poly_part(part, nv_e):
                    """Edge-loop polygon pass -> writes fa, sa.

                    Loops over the nv_e edges, each iteration evaluating
                    the full [TH, TW] tile as wide vector ops (vertex
                    coords are SMEM scalars).  nv_e ∈ {SMALL_V, V}: shapes
                    with few real edges trip only 8 times — the pad
                    repeats vertex 0, whose degenerate edges contribute
                    the distance-to-vertex-0 (harmless in the min) and no
                    crossings, so the truncation is bit-identical.

                    Replaced a row-sequential formulation (TH fori_loop
                    iterations of [nv_e, TW] work + per-row stores) that
                    measured 2.6x slower on v5e (34.3 -> 13.3 ms per 256
                    mixed frames): 8x fewer loop trips, full-vreg [TH,TW]
                    operands, and two whole-tile stores instead of 2*TH
                    dynamic-slice stores."""
                    def edge(k, carry):
                        d2, cross = carry
                        kb = jnp.where(k == nv_e - 1, 0, k + 1)
                        ax = vx_ref[0, e, part, k]
                        ay = vy_ref[0, e, part, k]
                        bx = vx_ref[0, e, part, kb]
                        by = vy_ref[0, e, part, kb]
                        ex = bx - ax
                        ey = by - ay
                        inv = 1.0 / (ex * ex + ey * ey + 1e-9)
                        pxe = pxw_t - ax
                        pye = pyw_t - ay
                        t = jnp.clip((pxe * ex + pye * ey) * inv, 0.0, 1.0)
                        dx = pxe - t * ex
                        dy = pye - t * ey
                        d2 = jnp.minimum(d2, dx * dx + dy * dy)
                        cond = (ay > pyw_t) != (by > pyw_t)
                        safe_ey = jnp.where(ey == 0.0, 1.0, ey)
                        xint = ax + (pyw_t - ay) * (ex / safe_ey)
                        cross = cross + (cond & (pxw_t < xint)).astype(jnp.int32)
                        return d2, cross

                    d2, cross = jax.lax.fori_loop(
                        0, nv_e, edge,
                        (jnp.full((TH, TW), jnp.inf, jnp.float32),
                         jnp.zeros((TH, TW), jnp.int32)))
                    inside = (cross % 2) == 1
                    fa[:] = inside.astype(jnp.float32)
                    sa[:] = jnp.clip(
                        (stroke + 0.28 - jnp.sqrt(d2)) * (1.0 / 1.28),
                        0.0, 1.0)

                small = meta_ref[0, e, M_SMALL] > 0.0

                @pl.when(is_poly & small)
                def _():
                    poly_part(0, SMALL_V)

                @pl.when(is_poly & jnp.logical_not(small))
                def _():
                    poly_part(0, V)

                @pl.when(is_circle)
                def _():
                    d = jnp.sqrt((pxw_t - cx) ** 2 + (pyw_t - cy) ** 2) \
                        - meta_ref[0, e, M_ROUT]
                    fa[:] = (d < 0.0).astype(jnp.float32)
                    sa[:] = jnp.clip((stroke + 0.28 - jnp.abs(d)) * (1.0 / 1.28),
                                     0.0, 1.0)

                @pl.when(is_cres)
                def _():
                    icx = meta_ref[0, e, M_ICX]
                    icy = meta_ref[0, e, M_ICY]
                    d_out = jnp.sqrt((pxw_t - cx) ** 2 + (pyw_t - cy) ** 2) \
                        - meta_ref[0, e, M_ROUT]
                    d_in = jnp.sqrt((pxw_t - icx) ** 2 + (pyw_t - icy) ** 2) \
                        - meta_ref[0, e, M_RIN]
                    fa[:] = ((d_out < 0.0) & (d_in >= 0.0)).astype(jnp.float32)
                    sa[:] = jnp.maximum(
                        jnp.clip((stroke + 0.28 - jnp.abs(d_out)) * (1.0 / 1.28),
                                 0.0, 1.0),
                        jnp.clip((stroke + 0.28 - jnp.abs(d_in)) * (1.0 / 1.28),
                                 0.0, 1.0))

                # reference wrap parity: copies exist only at the 3x3
                # offsets (src/shapes.py:369-375) — pixels whose nearest
                # periodic copy is >= 2 canvases from the element's true
                # position are not covered (see raster.composite_element)
                wrap_ok = ((jnp.abs(px_tile - pxw_t) <= float(W)) &
                           (jnp.abs(py_col - pyw_t) <= float(H))
                           ).astype(jnp.float32)

                def composite():
                    a = fa[:] * meta_ref[0, e, M_FILL] * wrap_ok
                    racc[:] = racc[:] * (1.0 - a) + meta_ref[0, e, M_R] * a
                    gacc[:] = gacc[:] * (1.0 - a) + meta_ref[0, e, M_G] * a
                    bacc[:] = bacc[:] * (1.0 - a) + meta_ref[0, e, M_B] * a
                    s = sa[:] * wrap_ok
                    racc[:] = racc[:] * (1.0 - s)
                    gacc[:] = gacc[:] * (1.0 - s)
                    bacc[:] = bacc[:] * (1.0 - s)

                composite()

                @pl.when(meta_ref[0, e, M_HASP1] > 0.0)
                def _():
                    # part 1 exists only for 'plus' (two 4-vert rects,
                    # reference src/shapes.py:477-509) -> always small
                    poly_part(1, SMALL_V)
                    composite()

        @pl.when(samp_ref[0, 0, 0] > 0.0)
        def _():
            on = jnp.zeros((TH, TW), bool)
            for x in xs_lines:
                on = on | (px_tile == x)
            for y in ys_lines:
                on = on | (py_col == y)
            keep = 1.0 - on.astype(jnp.float32)
            racc[:] = racc[:] * keep
            gacc[:] = gacc[:] * keep
            bacc[:] = bacc[:] * keep

        def to_u8(x):
            # Mosaic lacks a direct f32->u8 cast; go through i32
            return jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32).astype(jnp.uint8)

        out_ref[0, 0] = to_u8(racc[:])
        out_ref[0, 1] = to_u8(gacc[:])
        out_ref[0, 2] = to_u8(bacc[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("W", "H", "grid_size", "interpret"))
def render_batch_pallas(states: ElementState, W: int, H: int, use_grid,
                        grid_size: int = 3, interpret: bool = False):
    """Render a batch of frames -> u8 [N, H, W, 3].

    states: ElementState with leading batch dim N; use_grid: bool [N].

    Any W/H is supported: the tile grid covers ceil-padded dims while the
    kernel keeps the TRUE W/H for its wrap metric / grid lines / culling,
    so padded pixels just render wrapped duplicates and are cropped off.
    (Matches the reference's arbitrary canvas_size, src/config.py:27.)
    """
    N = states.kind.shape[0]
    E = states.kind.shape[1]
    Hp = -(-H // TH) * TH
    Wp = -(-W // TW) * TW
    use_grid = jnp.asarray(use_grid)
    meta, vxs, vys = jax.vmap(
        lambda s, g: prepare_render_data(s, W, H, g, grid_size)
    )(states, use_grid)
    samp = jnp.stack([use_grid.astype(jnp.float32),
                      jnp.zeros(N, jnp.float32)], axis=-1)[:, None, :]

    kernel = _make_kernel(E, W, H, grid_size)
    out = pl.pallas_call(
        kernel,
        grid=(N, Hp // TH, Wp // TW),
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, E, NMETA), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, E, 2, G.MAX_VERTS), lambda n, i, j: (n, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, E, 2, G.MAX_VERTS), lambda n, i, j: (n, 0, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TH, TW), lambda n, i, j: (n, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((N, 3, Hp, Wp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((TH, TW), jnp.float32) for _ in range(5)],
        interpret=interpret,
    )(samp, meta, vxs, vys)
    return jnp.transpose(out[:, :, :H, :W], (0, 2, 3, 1))
