"""Tile-sharded multi-chip rendering — the framework's signature parallelism.

The north-star scaling axis for the new framework (SURVEY.md §2.4, §5.8):
pixels/tiles of the rasterizer sharded over chips, gaussians replicated.
Projection and binning are cheap and data-parallel-agnostic, so they run
replicated; the compositing — the O(tiles * capacity * pixels) hot loop —
is distributed with `shard_map` over the mesh's `tile` axis. Each chip
composites its contiguous slice of the (batch * tiles) table; results
concatenate along the tile axis with no cross-chip communication at all
(an all-gather materializes the image only if the caller needs it
replicated).

Gradients: shard_map is differentiable; the backward composites per shard
and the gather VJP's scatter-add back to gaussian parameters is followed by
XLA's automatic psum over `tile` (the only collective in the render path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .binning import bin_gaussians_batched
from .project import make_camera, project_gaussians
from .tiled import pack_features, tile_pixel_coords
from .types import RasterizeConfig

Array = jax.Array


def render_tile_sharded(
    mesh: Mesh,
    extrinsics: Array,   # (b, 4, 4) c2w
    intrinsics: Array,   # (b, 3, 3) normalized
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    background: Array,   # (b, c)
    means: Array,
    covariances: Array,
    sh: Array,
    opacities: Array,
    scale_invariant: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
) -> Array:
    """Batched render with compositing sharded over the mesh `tile` axis.

    Requires (b * num_tiles) divisible by the tile-axis size. -> (b, h, w, c).
    """
    import math

    if scale_invariant:
        scale = 1.0 / near
        extrinsics = extrinsics.at[..., :3, 3].mul(scale[:, None])
        covariances = covariances * (scale[:, None, None, None] ** 2)
        means = means * scale[:, None, None]
        near = near * scale
        far = far * scale

    h, w = image_shape
    ts = config.tile_size
    b = means.shape[0]
    d_sh = sh.shape[-1]
    sh_degree = int(math.isqrt(d_sh)) - 1
    channels = sh.shape[-2]

    camera = make_camera(extrinsics, intrinsics, image_shape)
    screen = jax.vmap(
        lambda cam, m, c, o, s: project_gaussians(
            cam, m, c, o, s, sh_degree, config
        )
    )(camera, means, covariances, opacities, sh)
    binned = bin_gaussians_batched(screen, image_shape, config)
    tiles_x, tiles_y = binned.num_tiles_x, binned.num_tiles_y
    num_tiles = tiles_x * tiles_y
    total = b * num_tiles

    n_shards = mesh.shape["tile"]
    assert total % n_shards == 0, (
        f"{total} tile rows not divisible by tile axis {n_shards}"
    )

    # Flat-gather the dense tables (see pallas_impl for the layout notes).
    feat = pack_features(screen)  # (b, n, f)
    n = feat.shape[1]
    f_dim = feat.shape[-1]
    feat_flat = feat.reshape(b * n, f_dim)
    b_off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat_idx = (jnp.maximum(binned.indices, 0) + b_off).reshape(-1)
    gathered = feat_flat[flat_idx].reshape(total, config.tile_capacity, f_dim)
    slot_valid = (binned.indices >= 0).reshape(total, config.tile_capacity)

    px1, py1 = tile_pixel_coords(tiles_x, num_tiles, ts, feat.dtype)
    px = jnp.tile(px1, (b, 1))
    py = jnp.tile(py1, (b, 1))
    bg_rows = jnp.repeat(background, num_tiles, axis=0)  # (total, c)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("tile"), P("tile"), P("tile"), P("tile"), P("tile")),
        out_specs=P("tile"),
        check_vma=False,
    )
    def sharded_composite(g, sv, pxs, pys, bgs):
        # One shard's slice of tiles; zero cross-chip traffic.
        return composite_tables_bg(g, sv, pxs, pys, bgs, channels, config)

    out = sharded_composite(gathered, slot_valid, px, py, bg_rows)
    out = out.reshape(b, tiles_y, tiles_x, ts, ts, channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, tiles_y * ts, tiles_x * ts, channels
    )
    return out[:, :h, :w]


def composite_tables_bg(g, sv, pxs, pys, bg_rows, channels, config):
    """composite_tables with per-tile background rows."""
    from .compositing import composite_chunk, gaussian_alpha

    num_tiles, cap, f_dim = g.shape
    chunk = config.chunk
    n_chunks = cap // chunk
    p = pxs.shape[-1]
    chunks = g.reshape(num_tiles, n_chunks, chunk, f_dim).transpose(1, 0, 2, 3)
    chunk_valid = sv.reshape(num_tiles, n_chunks, chunk).transpose(1, 0, 2)

    def body(carry, inputs):
        t_carry, accum = carry
        data, valid = inputs
        alpha = gaussian_alpha(
            pxs, pys, data[..., 0:2], data[..., 2:5], data[..., 5 + channels],
            valid, config,
        )
        t_carry, accum = composite_chunk(
            alpha, data[..., 5 : 5 + channels], t_carry, accum, config
        )
        return (t_carry, accum), None

    init = (
        jnp.ones((num_tiles, p), g.dtype),
        jnp.zeros((num_tiles, p, channels), g.dtype),
    )
    (t_final, accum), _ = jax.lax.scan(
        jax.checkpoint(body), init, (chunks, chunk_valid)
    )
    return accum + t_final[..., None] * bg_rows[:, None, :]
