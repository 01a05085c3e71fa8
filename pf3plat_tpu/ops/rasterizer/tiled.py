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
    cap = config.tile_capacity
    chunk = config.chunk
    assert cap % chunk == 0, "tile_capacity must be divisible by chunk"

    # Pack per-gaussian features once; gather per tile (differentiable).
    feat = jnp.concatenate(
        [screen.xy, screen.conic, screen.color, screen.opacity[..., None]],
        axis=-1,
    )  # (n, f)
    f_dim = feat.shape[-1]
    safe_idx = jnp.maximum(binned.indices, 0)
    gathered = feat[safe_idx]  # (tiles, cap, f)
    slot_valid = binned.indices >= 0

    # Pixel coordinates for every tile (tiles, p).
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = tile_ids % tiles_x
    ty = tile_ids // tiles_x
    local = jnp.arange(ts * ts, dtype=jnp.int32)
    lx = local % ts
    ly = local // ts
    px = (tx[:, None] * ts + lx[None, :]).astype(feat.dtype) + 0.5
    py = (ty[:, None] * ts + ly[None, :]).astype(feat.dtype) + 0.5

    n_chunks = cap // chunk
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
        jnp.ones((num_tiles, ts * ts), feat.dtype),
        jnp.zeros((num_tiles, ts * ts, channels), feat.dtype),
    )
    (t_final, accum), _ = jax.lax.scan(
        jax.checkpoint(body), init, (chunks, chunk_valid)
    )
    out = accum + t_final[..., None] * background[None, None, :]

    # (tiles, p, c) -> (h, w, c), cropping tile padding.
    out = out.reshape(tiles_y, tiles_x, ts, ts, channels)
    out = out.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ts, tiles_x * ts, channels)
    return out[:h, :w]
