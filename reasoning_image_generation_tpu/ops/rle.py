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
    """Default max_runs (capacity of the static device buffer).  Measured
    per-leaf maxima on production 512^2 frames: 3.8k (平移) to 10.6k
    (直接叠加 merged frames) — H*W/24 (~10.9k) covers every observed
    frame.  Capacity is cheap: the host-side adaptive shrink
    (io/transfer.py::coalesce_shrunk) truncates the transfer to the
    largest run count actually seen, so headroom costs device memory and
    first-batch bytes only."""
    return max(1024, (H * W) // 24)


def default_grid_budget(H: int, W: int) -> int:
    """Composed grids are denser (resized cells, AA text labels, borders):
    measured max 11.1k runs on 296x512 grids (组合), 9.3k on 216x512
    (直接叠加) — H*W/9 covers both.  An undersized budget is costly, not
    wrong: every overflow falls back to a raw device-frame fetch (~60 ms
    each on the dev relay); the adaptive shrink reclaims the headroom."""
    return max(2048, (H * W) // 9)


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


# ---- v2: length+color codec at 5 bytes/run (u16 length + u8 RGB) ----
#
# The v1 transfer spends 8 bytes/run (u32 start + u32 packed color); the
# u32 start is redundant — consecutive run lengths describe the same
# positions in 2 bytes once no run exceeds 65535 pixels, which the encoder
# guarantees by forcing a run break at every multiple of 65535 (adds at
# most ceil(H*W/65535)-1 ~ 3 runs on a 512^2 frame).  Colors travel as
# 3 raw u8 channels.  Decode is np.repeat over lengths; the C PNG encoder
# (io/native/fastpng.c::fastpng_write_rle) consumes this stream directly
# without materializing host pixels.

U16_RUN = 65535


def pack_frame_rle2(img: jnp.ndarray, max_runs: int):
    """u8 [H, W, 3] -> (lengths u16 [max_runs], colors u8 [max_runs, 3],
    count i32)."""
    H, W = img.shape[:2]
    n = H * W
    flat = (img[..., 0].astype(jnp.uint32) << 16
            | img[..., 1].astype(jnp.uint32) << 8
            | img[..., 2].astype(jnp.uint32)).reshape(n)
    idx = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    boundary = boundary | (idx % U16_RUN == 0)
    pos = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    # compact boundary positions/colors into static run slots (cumsum +
    # scatter-with-drop; see pack_frame_rle for why not flatnonzero)
    tgt = jnp.where(boundary, pos, max_runs)
    starts = jnp.zeros((max_runs,), jnp.int32).at[tgt].set(idx, mode="drop")
    colors = jnp.zeros((max_runs,), jnp.uint32).at[tgt].set(
        flat, mode="drop")
    # run i length = next start - own start; the slot after the last live
    # run holds 0 (scatter-dropped), so patch it to n via the count test
    slot = jnp.arange(max_runs, dtype=jnp.int32)
    nxt = jnp.concatenate([starts[1:], jnp.zeros((1,), jnp.int32)])
    nxt = jnp.where(slot == count - 1, n, nxt)
    lengths = jnp.where(slot < count, nxt - starts, 0)
    lengths = jnp.clip(lengths, 0, U16_RUN).astype(jnp.uint16)
    rgb = jnp.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF,
                     colors & 0xFF], axis=-1).astype(jnp.uint8)
    return lengths, rgb, count


@partial(jax.jit, static_argnames=("max_runs",))
def pack_batch_rle2(imgs: jnp.ndarray, max_runs: int):
    """u8 [..., H, W, 3] with any leading dims."""
    lead = imgs.shape[:-3]
    flat = imgs.reshape((-1,) + imgs.shape[-3:])
    lengths, colors, count = jax.vmap(
        lambda x: pack_frame_rle2(x, max_runs))(flat)
    return (lengths.reshape(lead + lengths.shape[1:]),
            colors.reshape(lead + colors.shape[1:]),
            count.reshape(lead))


# ---- v2p: palette-indexed runs at 3 bytes/run (u16 length + u8 index) ----
#
# Run colors are heavily repeated: a 512^2 state frame has p50 ~120-138
# DISTINCT colors among thousands of runs (element fills + the AA blend
# ramp against the background), so an on-device per-frame palette turns
# the 3-byte RGB per run into a 1-byte index: 5 -> 3 bytes/run plus a
# fixed 776-byte palette block per frame (~40% fewer link bytes on
# full-export streams).  Frames with >256 distinct run colors (rare;
# composed grids can exceed it, which is why grids stay on rle2) fall
# back to the same raw-frame fetch as run-budget overflow.

MAX_PAL = 256
_PAL_SENTINEL = jnp.uint32(0xFFFFFFFF)


def palettize_runs(colors: jnp.ndarray, count: jnp.ndarray):
    """(colors u8 [cap, 3], count) -> (palette u8 [256, 3], idx u8 [cap],
    n_colors i32).

    Sort-compact over the RUN colors (<= cap values, not H*W pixels):
    dead slots sort to a sentinel past every 24-bit color, unique values
    scatter-compact into the palette exactly like run boundaries do in
    pack_frame_rle, and searchsorted maps each run to its index.  When
    n_colors > 256 the idx column is meaningless — callers must treat the
    frame as overflowed."""
    cap = colors.shape[0]
    col32 = (colors[:, 0].astype(jnp.uint32) << 16
             | colors[:, 1].astype(jnp.uint32) << 8
             | colors[:, 2].astype(jnp.uint32))
    live = jnp.arange(cap, dtype=jnp.int32) < count
    masked = jnp.where(live, col32, _PAL_SENTINEL)
    s = jnp.sort(masked)
    uniq = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    uniq = uniq & (s != _PAL_SENTINEL)
    pos = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    n_colors = jnp.where(jnp.any(uniq), pos[-1] + 1, 0)
    tgt = jnp.where(uniq & (pos < MAX_PAL), pos, MAX_PAL)
    pal32 = jnp.full((MAX_PAL,), _PAL_SENTINEL,
                     jnp.uint32).at[tgt].set(s, mode="drop")
    idx = jnp.searchsorted(pal32, col32).astype(jnp.uint8)
    palette = jnp.stack([(pal32 >> 16) & 0xFF, (pal32 >> 8) & 0xFF,
                         pal32 & 0xFF], axis=-1).astype(jnp.uint8)
    return palette, idx, n_colors


def pack_frame_rle2p(img: jnp.ndarray, max_runs: int):
    """u8 [H, W, 3] -> (lengths u16 [max_runs], idx u8 [max_runs],
    palette u8 [256, 3], n_colors i32, count i32)."""
    lengths, rgb, count = pack_frame_rle2(img, max_runs)
    palette, idx, n_colors = palettize_runs(rgb, count)
    return lengths, idx, palette, n_colors, count


@partial(jax.jit, static_argnames=("max_runs",))
def pack_batch_rle2p(imgs: jnp.ndarray, max_runs: int):
    """u8 [..., H, W, 3] with any leading dims."""
    lead = imgs.shape[:-3]
    flat = imgs.reshape((-1,) + imgs.shape[-3:])
    ln, idx, pal, nc, cnt = jax.vmap(
        lambda x: pack_frame_rle2p(x, max_runs))(flat)
    return (ln.reshape(lead + ln.shape[1:]),
            idx.reshape(lead + idx.shape[1:]),
            pal.reshape(lead + pal.shape[1:]),
            nc.reshape(lead), cnt.reshape(lead))


def rle2p_to_rle2(lengths: np.ndarray, idx: np.ndarray, palette: np.ndarray,
                  n_colors: int, count: int):
    """Host-side: one frame's palette stream -> the rle2 (lengths, rgb)
    form the C PNG encoder consumes.  OverflowError on palette overflow
    (caller fetches the raw frame, same contract as run-budget
    overflow)."""
    if n_colors > MAX_PAL:
        raise OverflowError(f"rle2p palette overflow: {n_colors} colors")
    if count > lengths.shape[0]:
        raise OverflowError(
            f"rle2p frame overflow: {count} > {lengths.shape[0]}")
    rgb = np.asarray(palette, np.uint8)[np.asarray(idx[:count], np.int64)]
    return np.asarray(lengths[:count], np.uint16), rgb


def unpack_frame_rle2p(lengths, idx, palette, n_colors: int, count: int,
                       shape) -> np.ndarray:
    """Host-side exact reconstruction of the palette stream."""
    ln, rgb = rle2p_to_rle2(lengths, idx, palette, n_colors, count)
    return unpack_frame_rle2(ln, rgb, count, shape)


def unpack_frame_rle2(lengths: np.ndarray, colors: np.ndarray, count: int,
                      shape) -> np.ndarray:
    """Host-side exact reconstruction of the v2 stream.  OverflowError when
    the frame exceeded the run budget (caller fetches the raw frame)."""
    H, W = shape[:2]
    n = H * W
    if count > lengths.shape[0]:
        raise OverflowError(
            f"rle2 frame overflow: {count} > {lengths.shape[0]}")
    ln = np.asarray(lengths[:count], np.int64)
    total = int(ln.sum())
    if total != n:  # truncated/corrupt stream — treat as overflow
        raise OverflowError(f"rle2 length sum {total} != {n}")
    return np.repeat(np.asarray(colors[:count], np.uint8), ln,
                     axis=0).reshape(H, W, 3)
