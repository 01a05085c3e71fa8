"""Tile-binned XLA rasterizer — the differentiable workhorse path.

Composites the dense per-tile gaussian tables produced by `binning.py` with a
`lax.scan` over depth-ordered chunks. Each step evaluates a
(tiles, pixels_per_tile, chunk) alpha block and reduces it with the
cumsum/matmul formulation in `compositing.py` — shapes the MXU likes
(256 x 128 blocks at the default 16px tiles / 128 chunk). The scan body is
`jax.checkpoint`ed so the backward pass recomputes alphas instead of storing
them — the same trade the reference CUDA backward makes by replaying
compositing in reverse.

Gradients flow to every gaussian attribute through the (differentiable)
feature gather; binning indices are integer data, as in the CUDA original.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import BinnedTiles
from .compositing import composite_chunk, gaussian_alpha
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array


def pack_features(screen: ScreenGaussians) -> Array:
    """Per-gaussian feature rows [x, y, conic(3), color(c), opacity]."""
    return jnp.concatenate(
        [screen.xy, screen.conic, screen.color, screen.opacity[..., None]],
        axis=-1,
    )


def tile_pixel_coords(
    tiles_x: int, num_tiles: int, ts: int, dtype
) -> tuple[Array, Array]:
    """Pixel-center coordinates for each tile: (tiles, ts*ts) px, py."""
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = tile_ids % tiles_x
    ty = tile_ids // tiles_x
    local = jnp.arange(ts * ts, dtype=jnp.int32)
    lx = local % ts
    ly = local // ts
    px = (tx[:, None] * ts + lx[None, :]).astype(dtype) + 0.5
    py = (ty[:, None] * ts + ly[None, :]).astype(dtype) + 0.5
    return px, py


def composite_tables(
    gathered: Array,    # (tiles, cap, f) gathered features
    slot_valid: Array,  # (tiles, cap) bool
    px: Array,          # (tiles, p) pixel x coords
    py: Array,          # (tiles, p)
    background: Array,  # (c,)
    channels: int,
    config: RasterizeConfig,
) -> Array:
    """Scan-composite dense tile tables -> (tiles, p, c).

    Tile-count-agnostic: callers can pass any subset of tiles (this is the
    unit that `shard_map` distributes for multi-chip tile sharding).
    """
    num_tiles, cap, f_dim = gathered.shape
    chunk = config.chunk
    assert cap % chunk == 0, "tile_capacity must be divisible by chunk"
    n_chunks = cap // chunk
    p = px.shape[-1]

    chunks = gathered.reshape(num_tiles, n_chunks, chunk, f_dim).transpose(1, 0, 2, 3)
    chunk_valid = slot_valid.reshape(num_tiles, n_chunks, chunk).transpose(1, 0, 2)

    def body(carry, inputs):
        t_carry, accum = carry
        data, valid = inputs
        xy_c = data[..., 0:2]
        conic_c = data[..., 2:5]
        color_c = data[..., 5 : 5 + channels]
        op_c = data[..., 5 + channels]
        alpha = gaussian_alpha(px, py, xy_c, conic_c, op_c, valid, config)
        t_carry, accum = composite_chunk(alpha, color_c, t_carry, accum, config)
        return (t_carry, accum), None

    init = (
        jnp.ones((num_tiles, p), gathered.dtype),
        jnp.zeros((num_tiles, p, channels), gathered.dtype),
    )
    (t_final, accum), _ = jax.lax.scan(
        jax.checkpoint(body), init, (chunks, chunk_valid)
    )
    return accum + t_final[..., None] * background[None, None, :]


def composite_tiles(
    screen: ScreenGaussians,
    binned: BinnedTiles,
    image_shape: tuple[int, int],
    background: Array,  # (c,)
    config: RasterizeConfig,
) -> Array:
    """Single-camera compositing over binned tiles -> (h, w, c) image."""
    h, w = image_shape
    ts = config.tile_size
    tiles_x, tiles_y = binned.num_tiles_x, binned.num_tiles_y
    num_tiles = tiles_x * tiles_y
    channels = screen.color.shape[-1]

    feat = pack_features(screen)
    safe_idx = jnp.maximum(binned.indices, 0)
    gathered = feat[safe_idx]  # (tiles, cap, f)
    slot_valid = binned.indices >= 0
    px, py = tile_pixel_coords(tiles_x, num_tiles, ts, feat.dtype)

    out = composite_tables(
        gathered, slot_valid, px, py, background, channels, config
    )

    # (tiles, p, c) -> (h, w, c), cropping tile padding.
    out = out.reshape(tiles_y, tiles_x, ts, ts, channels)
    out = out.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, channels)
    return out[:h, :w]
