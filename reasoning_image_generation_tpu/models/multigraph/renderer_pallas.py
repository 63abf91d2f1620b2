# renderer_pallas.py — Pallas TPU kernel for multigraph scenes.
"""Tiled stroke rasterizer for the single-image pipeline.

Same design as ops/raster_pallas.py (edge-loop polygon evaluation over
SMEM vertices, (artist, tile) bbox culling in pl.when) specialized to the
multigraph semantics: outline-only shapes, SDF mask boolean algebra
(cut / replace_boundary), decoration line segments, optional radial
gradient fills.

All geometry is converted host-side from data coords to pixel coords
(scene_to_pixel_space) so the kernel is canvas-metric; the canvas width is
padded up to a lane multiple (1600 -> 1664 at dpi 200) and cropped after.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scene import MAX_SHAPES, MAX_MASKS, MAX_LINES, NV
from .renderer import data_to_pixel_transform

TH = 64
TW = 256


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def scene_to_pixel_space(scene, dpi: int):
    """Convert scene arrays (data coords, y-up) to pixel coords (y-down)."""
    scale, x0, y0, size_px = data_to_pixel_transform(dpi)
    H = W = size_px

    def to_px(pts):  # [..., 2] data -> pixel
        px = x0 + pts[..., 0] * scale
        py = H - (y0 + pts[..., 1] * scale)
        return jnp.stack([px, py], -1)

    lw_scale = dpi / 72.0
    shape_verts = to_px(scene["shape_verts"])
    mask_verts = to_px(scene["mask_verts"])
    lp = scene["line_pts"]
    line_p0 = to_px(jnp.stack([lp[..., 0], lp[..., 1]], -1))
    line_p1 = to_px(jnp.stack([lp[..., 2], lp[..., 3]], -1))

    def bbox(verts, valid, margin):
        bx0 = jnp.where(valid, verts[..., 0].min(-1), 1e9) - margin
        bx1 = jnp.where(valid, verts[..., 0].max(-1), -1e9) + margin
        by0 = jnp.where(valid, verts[..., 1].min(-1), 1e9) - margin
        by1 = jnp.where(valid, verts[..., 1].max(-1), -1e9) + margin
        return jnp.stack([bx0, bx1, by0, by1], -1)

    shape_lw_px = scene["shape_lw"] * lw_scale
    line_lw_px = scene["line_lw"] * lw_scale
    lverts = jnp.stack([line_p0, line_p1], -2)  # [K, 2, 2]
    data = {
        "shape_verts": shape_verts,
        "mask_verts": mask_verts,
        "line_p0": line_p0, "line_p1": line_p1,
        "shape_lw": shape_lw_px,
        "line_lw": line_lw_px,
        # culling margins: half stroke + 2px AA fringe
        "shape_bbox": bbox(shape_verts, scene["shape_valid"],
                           shape_lw_px * 0.5 + 2.0),
        "line_bbox": bbox(lverts, scene["line_valid"],
                          line_lw_px * 0.5 + 2.0),
    }
    return data, H, W


def _make_kernel(H: int, Wp: int):
    V = NV

    def kernel(meta_ref, svx_ref, svy_ref, mvx_ref, mvy_ref, lin_ref,
               out_ref, racc, gacc, bacc, msk):
        i = pl.program_id(1)
        j = pl.program_id(2)
        y0 = (i * TH).astype(jnp.float32)
        x0 = (j * TW).astype(jnp.float32)
        px_t = x0 + 0.5 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(jnp.float32)
        py_t = y0 + 0.5 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(jnp.float32)
        racc[:] = jnp.full((TH, TW), 255.0, jnp.float32)
        gacc[:] = jnp.full((TH, TW), 255.0, jnp.float32)
        bacc[:] = jnp.full((TH, TW), 255.0, jnp.float32)

        def poly_sd(vx_ref, vy_ref, idx):
            """Signed distance of the whole tile to polygon idx.

            Edge fori_loop carrying the running min-distance / crossing
            count as full [TH, TW] vregs (vertices are SMEM scalars) —
            same formulation as ops/raster_pallas.poly_part, measured
            ~2.6x faster than the per-row variant it replaced (no per-row
            dynamic-slice stores, no cross-sublane reductions)."""
            def edge(k, carry):
                d2, cross = carry
                kb = jnp.where(k == V - 1, 0, k + 1)
                ax = vx_ref[0, idx, k]
                ay = vy_ref[0, idx, k]
                bx = vx_ref[0, idx, kb]
                by = vy_ref[0, idx, kb]
                ex = bx - ax
                ey = by - ay
                inv = 1.0 / (ex * ex + ey * ey + 1e-9)
                pxe = px_t - ax
                pye = py_t - ay
                t = jnp.clip((pxe * ex + pye * ey) * inv, 0.0, 1.0)
                dx = pxe - t * ex
                dy = pye - t * ey
                d2 = jnp.minimum(d2, dx * dx + dy * dy)
                cond = (ay > py_t) != (by > py_t)
                safe_ey = jnp.where(ey == 0.0, 1.0, ey)
                xint = ax + (py_t - ay) * (ex / safe_ey)
                cross = cross + (cond & (px_t < xint)).astype(jnp.int32)
                return d2, cross

            d2, cross = jax.lax.fori_loop(
                0, V, edge,
                (jnp.full((TH, TW), jnp.inf, jnp.float32),
                 jnp.zeros((TH, TW), jnp.int32)))
            inside = (cross % 2) == 1
            dist = jnp.sqrt(d2)
            return jnp.where(inside, -dist, dist)

        # ---- mask union SDF (shared by base-shape stroke logic)
        mask_mode = meta_ref[0, 0, 0]
        has_mask = mask_mode > 0.0
        msk[:] = jnp.full((TH, TW), 1e9, jnp.float32)

        @pl.when(has_mask)
        def _():
            for m in range(MAX_MASKS):
                @pl.when(meta_ref[0, 1, m] > 0.0)  # mask m valid
                def _():
                    msk[:] = jnp.minimum(msk[:], poly_sd(mvx_ref, mvy_ref, m))

        # ---- shapes (stroke only, mask algebra on shape 0)
        for s in range(MAX_SHAPES):
            valid = meta_ref[0, 2, s] > 0.0
            bx0 = meta_ref[0, 3, s]
            bx1 = meta_ref[0, 4, s]
            by0 = meta_ref[0, 5, s]
            by1 = meta_ref[0, 6, s]
            hit = valid & (bx1 >= x0) & (bx0 <= x0 + TW) & \
                (by1 >= y0) & (by0 <= y0 + TH)
            # masked shapes / gradients can paint anywhere inside the shape;
            # keep the bbox test (bbox covers the whole shape)

            @pl.when(hit)
            def _():
                lw = meta_ref[0, 7, s]
                alpha = meta_ref[0, 8, s]

                def body():
                    sd = poly_sd(svx_ref, svy_ref, s)
                    stroke = alpha * jnp.clip(
                        (lw * 0.5 + 0.5 - jnp.abs(sd)), 0.0, 1.0)
                    # arithmetic masking (Mosaic can't legalize a select of
                    # scalar-cond with mixed vector/python operands)
                    if s == 0:
                        hm = has_mask.astype(jnp.float32)
                        cut = (msk[:] <= 0.0).astype(jnp.float32)
                        keep = 1.0 - hm * cut
                    else:
                        keep = 1.0
                    a = stroke * keep
                    # gradient fill first (inside shape)
                    g_on = meta_ref[0, 9, s] > 0.0

                    @pl.when(g_on)
                    def _():
                        ctrx = meta_ref[0, 10, s]
                        ctry = meta_ref[0, 11, s]
                        rmax = meta_ref[0, 12, s]
                        tfrac = jnp.clip(
                            jnp.sqrt((px_t - ctrx) ** 2 + (py_t - ctry) ** 2)
                            / rmax, 0.0, 1.0)
                        ga = (sd < 0.0).astype(jnp.float32) * meta_ref[0, 13, s]
                        for c, (acc, i0, i1) in enumerate(
                                [(racc, 14, 17), (gacc, 15, 18), (bacc, 16, 19)]):
                            col = meta_ref[0, i0, s] * (1 - tfrac) + \
                                meta_ref[0, i1, s] * tfrac
                            acc[:] = acc[:] * (1 - ga) + col * ga

                    racc[:] = racc[:] * (1.0 - a)
                    gacc[:] = gacc[:] * (1.0 - a)
                    bacc[:] = bacc[:] * (1.0 - a)

                    # replace_boundary: mask boundary inside the base
                    @pl.when((mask_mode == 2.0) & (s == 0))
                    def _():
                        ma = alpha * jnp.clip(
                            (lw * 0.5 + 0.5 - jnp.abs(msk[:])), 0.0, 1.0)
                        ma = ma * (sd < 0.0)
                        racc[:] = racc[:] * (1.0 - ma)
                        gacc[:] = gacc[:] * (1.0 - ma)
                        bacc[:] = bacc[:] * (1.0 - ma)

                body()

        # ---- decoration lines (tile-wise; few segments)
        for k in range(MAX_LINES):
            lvalid = lin_ref[0, k, 0] > 0.0
            lbx0 = lin_ref[0, k, 1]
            lbx1 = lin_ref[0, k, 2]
            lby0 = lin_ref[0, k, 3]
            lby1 = lin_ref[0, k, 4]
            lhit = lvalid & (lbx1 >= x0) & (lbx0 <= x0 + TW) & \
                (lby1 >= y0) & (lby0 <= y0 + TH)

            @pl.when(lhit)
            def _():
                x0l = lin_ref[0, k, 5]
                y0l = lin_ref[0, k, 6]
                x1l = lin_ref[0, k, 7]
                y1l = lin_ref[0, k, 8]
                lw = lin_ref[0, k, 9]
                la = lin_ref[0, k, 10]
                ex = x1l - x0l
                ey = y1l - y0l
                inv = 1.0 / (ex * ex + ey * ey + 1e-9)
                t = jnp.clip(((px_t - x0l) * ex + (py_t - y0l) * ey) * inv,
                             0.0, 1.0)
                dist = jnp.sqrt((px_t - (x0l + t * ex)) ** 2 +
                                (py_t - (y0l + t * ey)) ** 2)
                a = la * jnp.clip(lw * 0.5 + 0.5 - dist, 0.0, 1.0)
                racc[:] = racc[:] * (1 - a) + lin_ref[0, k, 11] * a
                gacc[:] = gacc[:] * (1 - a) + lin_ref[0, k, 12] * a
                bacc[:] = bacc[:] * (1 - a) + lin_ref[0, k, 13] * a

        def to_u8(x):
            return jnp.clip(jnp.round(x), 0, 255).astype(jnp.int32).astype(jnp.uint8)

        out_ref[0, 0] = to_u8(racc[:])
        out_ref[0, 1] = to_u8(gacc[:])
        out_ref[0, 2] = to_u8(bacc[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("dpi", "interpret"))
def render_scene_batch_pallas(batch, dpi: int = 200,
                              interpret: bool = False):
    """Batched mg scene rendering on TPU -> u8 [N, S, S, 3].

    ``interpret=True`` runs the kernel in Pallas interpret mode so CPU CI
    can pin kernel parity without TPU hardware (use a small dpi there)."""
    N = batch["shape_valid"].shape[0]

    def prep(scene):
        data, H, W = scene_to_pixel_space(scene, dpi)
        # meta plane [20, max(S,M)] padded to a fixed row width of 8
        ncol = 8
        meta = jnp.zeros((20, ncol), jnp.float32)
        meta = meta.at[0, 0].set(scene["mask_mode"].astype(jnp.float32))
        meta = meta.at[1, :MAX_MASKS].set(
            scene["mask_valid"].astype(jnp.float32))
        meta = meta.at[2, :MAX_SHAPES].set(
            scene["shape_valid"].astype(jnp.float32))
        meta = meta.at[3, :MAX_SHAPES].set(data["shape_bbox"][:, 0])
        meta = meta.at[4, :MAX_SHAPES].set(data["shape_bbox"][:, 1])
        meta = meta.at[5, :MAX_SHAPES].set(data["shape_bbox"][:, 2])
        meta = meta.at[6, :MAX_SHAPES].set(data["shape_bbox"][:, 3])
        meta = meta.at[7, :MAX_SHAPES].set(data["shape_lw"])
        meta = meta.at[8, :MAX_SHAPES].set(scene["shape_alpha"])
        if "grad_valid" in scene:
            sv = data["shape_verts"]
            ctr = jnp.mean(sv, axis=1)
            rmax = jnp.max(jnp.hypot(sv[..., 0] - ctr[:, None, 0],
                                     sv[..., 1] - ctr[:, None, 1]), axis=1) + 1e-6
            meta = meta.at[9, :MAX_SHAPES].set(
                scene["grad_valid"].astype(jnp.float32))
            meta = meta.at[10, :MAX_SHAPES].set(ctr[:, 0])
            meta = meta.at[11, :MAX_SHAPES].set(ctr[:, 1])
            meta = meta.at[12, :MAX_SHAPES].set(rmax)
            meta = meta.at[13, :MAX_SHAPES].set(scene["grad_alpha"])
            meta = meta.at[14, :MAX_SHAPES].set(scene["grad_c0"][:, 0])
            meta = meta.at[15, :MAX_SHAPES].set(scene["grad_c0"][:, 1])
            meta = meta.at[16, :MAX_SHAPES].set(scene["grad_c0"][:, 2])
            meta = meta.at[17, :MAX_SHAPES].set(scene["grad_c1"][:, 0])
            meta = meta.at[18, :MAX_SHAPES].set(scene["grad_c1"][:, 1])
            meta = meta.at[19, :MAX_SHAPES].set(scene["grad_c1"][:, 2])

        lin = jnp.zeros((MAX_LINES, 16), jnp.float32)
        lin = lin.at[:, 0].set(scene["line_valid"].astype(jnp.float32))
        lin = lin.at[:, 1].set(data["line_bbox"][:, 0])
        lin = lin.at[:, 2].set(data["line_bbox"][:, 1])
        lin = lin.at[:, 3].set(data["line_bbox"][:, 2])
        lin = lin.at[:, 4].set(data["line_bbox"][:, 3])
        lin = lin.at[:, 5].set(data["line_p0"][:, 0])
        lin = lin.at[:, 6].set(data["line_p0"][:, 1])
        lin = lin.at[:, 7].set(data["line_p1"][:, 0])
        lin = lin.at[:, 8].set(data["line_p1"][:, 1])
        lin = lin.at[:, 9].set(data["line_lw"])
        lin = lin.at[:, 10].set(scene["line_alpha"])
        lin = lin.at[:, 11].set(scene["line_color"][:, 0])
        lin = lin.at[:, 12].set(scene["line_color"][:, 1])
        lin = lin.at[:, 13].set(scene["line_color"][:, 2])

        return (meta, data["shape_verts"][..., 0], data["shape_verts"][..., 1],
                data["mask_verts"][..., 0], data["mask_verts"][..., 1], lin)

    scale, x0c, y0c, size_px = data_to_pixel_transform(dpi)
    H = W = size_px
    Wp = _pad_to(W, TW)
    Hp = _pad_to(H, TH)

    metas, svx, svy, mvx, mvy, lins = jax.vmap(prep)(batch)

    kernel = _make_kernel(Hp, Wp)
    img = pl.pallas_call(
        kernel,
        grid=(N, Hp // TH, Wp // TW),
        in_specs=[
            pl.BlockSpec((1, 20, 8), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_SHAPES, NV), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_SHAPES, NV), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_MASKS, NV), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_MASKS, NV), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, MAX_LINES, 16), lambda n, i, j: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, TH, TW), lambda n, i, j: (n, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((N, 3, Hp, Wp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((TH, TW), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(metas, svx, svy, mvx, mvy, lins)
    img = jnp.transpose(img, (0, 2, 3, 1))[:, :H, :W]
    return img
