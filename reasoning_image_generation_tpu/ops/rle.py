# rle.py — lossless run-length codec for the device->host boundary.
"""Row-major RLE over packed-RGB pixels, encoded ON DEVICE.

Rendered canvases are long horizontal runs of identical color (background,
fills), so RLE beats the 8x8 block-sparse codec (ops/sparse.py) ~4x on
measured outputs: a 512^2 state frame is ~2.4k runs (p50, 19 KB at 8
bytes/run) vs 786 KB raw and ~275 KB block-sparse at the tuned budget.

Encoding per frame:
- pixels flatten row-major, RGB packed into one u32;
- run starts = positions where the packed value changes, compacted by
  cumsum + scatter-with-drop into a static [max_runs] buffer (measured
  7 us/frame at 512^2 on v5e; a flatnonzero(size=...) formulation
  measured 62 ms/frame — XLA lowers it through a full sort);
- transfer = (starts u32 [max_runs], colors u32 [max_runs], count i32).

The host reconstructs exactly (`np.repeat` over run lengths).  Frames with
more than `max_runs` runs raise OverflowError on unpack; callers fall back
to fetching the raw device-resident frame, same contract as ops/sparse.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def default_budget(H: int, W: int) -> int:
    """Default max_runs: measured max is ~H*W/80 for rendered frames;
    H*W/32 gives ~2.5x headroom while still transferring 12x fewer bytes
    than raw."""
    return max(1024, (H * W) // 32)


def default_grid_budget(H: int, W: int) -> int:
    """Composed grids are denser (resized cells, AA text labels, borders):
    measured max ~H*W/18.5 runs — H*W/12 gives 1.5x headroom.  An
    undersized budget is costly, not wrong: every overflow falls back to
    a raw device-frame fetch (~60 ms each on the dev relay)."""
    return max(2048, (H * W) // 12)


def pack_frame_rle(img: jnp.ndarray, max_runs: int):
    """u8 [H, W, 3] -> (starts u32 [max_runs], colors u32 [max_runs],
    count i32)."""
    H, W = img.shape[:2]
    n = H * W
    flat = (img[..., 0].astype(jnp.uint32) << 16
            | img[..., 1].astype(jnp.uint32) << 8
            | img[..., 2].astype(jnp.uint32)).reshape(n)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    pos = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    # scatter each boundary pixel's index/color to its run slot; non-
    # boundary pixels and runs past the budget target max_runs -> dropped.
    # `pos` is nondecreasing, so `starts` comes out ascending — the host
    # decode needs no sort.
    tgt = jnp.where(boundary, pos, max_runs)
    starts = jnp.zeros((max_runs,), jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    colors = jnp.zeros((max_runs,), jnp.uint32).at[tgt].set(
        flat, mode="drop")
    return starts.astype(jnp.uint32), colors, count


@partial(jax.jit, static_argnames=("max_runs",))
def pack_batch_rle(imgs: jnp.ndarray, max_runs: int):
    """u8 [..., H, W, 3] with any leading dims."""
    lead = imgs.shape[:-3]
    flat = imgs.reshape((-1,) + imgs.shape[-3:])
    starts, colors, count = jax.vmap(
        lambda x: pack_frame_rle(x, max_runs))(flat)
    return (starts.reshape(lead + starts.shape[1:]),
            colors.reshape(lead + colors.shape[1:]),
            count.reshape(lead))


def unpack_frame_rle(starts: np.ndarray, colors: np.ndarray, count: int,
                     shape) -> np.ndarray:
    """Host-side exact reconstruction.  Raises OverflowError when the frame
    exceeded the run budget (caller falls back to the raw device frame)."""
    H, W = shape[:2]
    n = H * W
    if count > starts.shape[0]:
        raise OverflowError(f"rle frame overflow: {count} > {starts.shape[0]}")
    s = np.asarray(starts[:count], np.int64)
    lengths = np.diff(np.append(s, n))
    flat = np.repeat(np.asarray(colors[:count], np.uint32), lengths)
    img = np.empty((n, 3), np.uint8)
    img[:, 0] = (flat >> 16) & 0xFF
    img[:, 1] = (flat >> 8) & 0xFF
    img[:, 2] = flat & 0xFF
    return img.reshape(H, W, 3)
