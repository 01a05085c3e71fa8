"""Tile binning with static shapes — the TPU answer to CUDA's atomics+radix.

The reference's CUDA rasterizer builds variable-length per-tile gaussian
lists with atomic counters and a global radix sort. TPUs have neither
atomics nor dynamic shapes, so binning is reformulated as:

  1. depth-argsort the gaussians once per camera (invalid -> back);
  2. expand each gaussian into a *static* number of (tile, rank) candidate
     pairs (`max_dup` covering its clamped tile AABB);
  3. one ascending sort of packed int32 keys `tile * R + rank` — because rank
     is the depth order, the per-tile segments of the sorted key array are
     automatically front-to-back;
  4. segment starts via searchsorted; scatter into a dense
     (num_tiles, tile_capacity) index table padded with -1.

Everything downstream (XLA scan or Pallas kernel) then runs on dense,
statically-shaped tables. Gradients do not flow through binning (indices are
integer data), matching the CUDA design where binning is non-differentiable
bookkeeping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array


class TileBounds(NamedTuple):
    tx0: Array
    ty0: Array
    tw: Array   # tiles covered horizontally (possibly clamped)
    th: Array


def tile_bounds(
    screen: ScreenGaussians, image_shape: tuple[int, int], config: RasterizeConfig
) -> TileBounds:
    """Clamped tile AABB of each gaussian's radius footprint."""
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    side = config.max_tiles_per_gaussian_side

    x, y = screen.xy[..., 0], screen.xy[..., 1]
    r = screen.radius
    tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, tiles_y - 1).astype(jnp.int32)
    # Static cap on the footprint, centered on the AABB's top-left. Gaussians
    # larger than side*tile_size pixels are truncated (configurable; at
    # PF3plat's pixel-aligned scales this is unreachable in practice).
    tw = jnp.minimum(tx1 - tx0 + 1, side)
    th = jnp.minimum(ty1 - ty0 + 1, side)
    visible = screen.valid & (screen.radius > 0)
    tw = jnp.where(visible, tw, 0)
    th = jnp.where(visible, th, 0)
    return TileBounds(tx0, ty0, tw, th)


class BinnedTiles(NamedTuple):
    indices: Array  # (num_tiles, capacity) int32 gaussian ids, -1 padded
    counts: Array   # (num_tiles,) int32
    num_tiles_x: int
    num_tiles_y: int


def bin_gaussians(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
) -> BinnedTiles:
    """Bin one camera's gaussians; see module docstring. Shapes are static."""
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    n = screen.depth.shape[-1]
    side = config.max_tiles_per_gaussian_side
    max_dup = config.max_dup

    # Rank = front-to-back depth order.
    order = jnp.argsort(jnp.where(screen.valid, screen.depth, jnp.inf))  # (n,)
    bounds = tile_bounds(screen, image_shape, config)
    tx0, ty0 = bounds.tx0[order], bounds.ty0[order]
    tw, th = bounds.tw[order], bounds.th[order]

    # Key packing must fit int32: tiles * rank_range < 2^31.
    rank_range = n + 1
    assert num_tiles * rank_range < 2**31, (
        f"int32 key overflow: {num_tiles} tiles x {rank_range} ranks; "
        "use a smaller image or raise tile_size"
    )

    rank = jnp.arange(n, dtype=jnp.int32)
    slot = jnp.arange(max_dup, dtype=jnp.int32)
    dy = slot // side
    dx = slot % side
    in_box = (dy[None, :] < th[:, None]) & (dx[None, :] < tw[:, None])  # (n, dup)
    tile = (ty0[:, None] + dy[None, :]) * tiles_x + (tx0[:, None] + dx[None, :])
    key = jnp.where(
        in_box,
        tile * rank_range + rank[:, None],
        jnp.int32(2**31 - 1),
    ).reshape(-1)

    key_sorted = jnp.sort(key)
    tile_of_pair = key_sorted // rank_range
    rank_of_pair = key_sorted % rank_range
    gauss_of_pair = order[jnp.clip(rank_of_pair, 0, n - 1)].astype(jnp.int32)

    # Per-tile segment starts/ends.
    starts = jnp.searchsorted(
        key_sorted, jnp.arange(num_tiles, dtype=jnp.int32) * rank_range
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        key_sorted, (jnp.arange(num_tiles, dtype=jnp.int32) + 1) * rank_range
    ).astype(jnp.int32)
    counts = jnp.minimum(ends - starts, config.tile_capacity)

    # Dense (num_tiles, capacity) gather of front-to-back gaussian ids.
    k = jnp.arange(config.tile_capacity, dtype=jnp.int32)
    pair_pos = starts[:, None] + k[None, :]
    in_seg = k[None, :] < counts[:, None]
    pair_pos = jnp.clip(pair_pos, 0, key.shape[0] - 1)
    indices = jnp.where(in_seg, gauss_of_pair[pair_pos], -1)

    return BinnedTiles(
        indices=jax.lax.stop_gradient(indices),
        counts=jax.lax.stop_gradient(counts),
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
    )
