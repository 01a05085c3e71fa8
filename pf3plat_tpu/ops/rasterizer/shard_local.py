"""Shard-local streamed rasterizer — the whole reorder pipeline sharded.

Round 4's mesh path sharded only the compositing kernels' tile rows: the
binning sort, pair compaction, gradient unsort, and banded dup-reduce
(~11 of 20.8 device ms then) ran REPLICATED on every shard, capping
2-chip scaling near ~60% by Amdahl. This module shards the reorder
machinery itself:

  * each mesh shard owns a contiguous range of rows/S flat tile rows
    ([k*rps, (k+1)*rps) of the batch*tile key space);
  * the candidate stream is compacted PER SHARD with the ownership range
    as an extra validity mask (`compact_pairs(tile_lo=, tile_hi=)`) into
    a per-shard budget of ~budget/S rows — the compaction kernel still
    streams the full candidate plane (that scan is the only replicated
    stage, ~0.9 ms of a ~17 ms frame), but everything DOWNSTREAM of it
    is shard-local;
  * the binning sort, segment search, forward compositing, backward
    compositing (the in-place RMW variant — safe again, because a
    shard's sequential grid only ever touches its own gradient plane),
    gradient unsort, and banded dup-reduce all run on the shard's
    ~1/S-sized arrays inside ONE shard_map;
  * the only backward collective is a `psum` of the per-gaussian
    gradient sums ((6+ch) * b*n floats) + the tiny background gradient.

Numerics: a shard's tiles see exactly the same pairs in exactly the same
order as the single-device pipeline; only each tile's 128-lane chunk
ALIGNMENT differs (segment starts are offsets into the shard-local
sorted array), which reassociates the per-chunk transmittance product —
images and gradients match the single-device path to f32 reassociation
(~1e-7), pinned by tests/test_parallel.py.

Replaces the all-replicated sort of round 4 (streamed.py `_shard_rows`,
which remains for the non-compacted mesh path); reference analog: the
per-GPU-local sort inside `diff-gaussian-rasterization` under DDP
(`/root/reference/src/main.py:104-118` — each GPU rasterizes its own
batch elements with its own local sort).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .binning import _INT32_MAX
from .compact import banded_dup_reduce
from .streamed import (
    _F,
    _make_streamed_composite,
    _pair_sort_compacted,
    _tiles_to_image,
)
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array


def shard_pairs_budget(config: RasterizeConfig, b: int, n: int,
                       n_shards: int) -> int:
    """Static per-shard compacted-pair budget: the global fraction split
    over shards with `shard_budget_slack` headroom for tile-load
    imbalance, floored at one full tile window (+ the staged-block slack
    the compaction kernel needs), capped at the always-exact bound."""
    total = b * n * config.max_dup
    c0 = config.compact_window
    cx = c0 + 128
    q = max(128, config.chunk)

    def up(x):
        return -(-x // q) * q

    n_chunks = config.tile_capacity // config.chunk + 1
    floor = up(max(cx + 128, n_chunks * config.chunk + cx))
    want = up(
        int(total * config.pairs_budget_factor
            * config.shard_budget_slack / n_shards) + cx
    )
    return max(floor, min(want, up(total + cx)))


def _flat_shard_index(mesh) -> Array:
    """Flat index of this shard across ALL mesh axes, row-major."""
    idx = jnp.int32(0)
    for name in mesh.axis_names:
        idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
    return idx


def composite_shard_local(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Array,  # (b, c)
    config: RasterizeConfig,
    mesh,
) -> Array:
    """Shard-local streamed rendering -> (b, h, w, c). Requires
    compaction on (`_use_compaction`); `composite_streamed_batched`
    dispatches here for multi-shard meshes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b, n = screen.depth.shape
    channels = screen.color.shape[-1]
    max_dup = config.max_dup
    rows = b * num_tiles
    n_shards = int(np.prod(list(mesh.shape.values())))
    if rows % n_shards:
        raise ValueError(
            f"{rows} tile rows not divisible by mesh size {n_shards}"
        )
    rps = rows // n_shards
    budget_s = shard_pairs_budget(config, b, n, n_shards)
    cap = config.tile_capacity
    ck = config.chunk
    n_chunks = cap // ck + 1
    n_feat = 6 + channels
    p = ts * ts

    ax = tuple(mesh.axis_names)
    row_sp = PartitionSpec(ax)
    plane_sp = PartitionSpec(None, ax)
    rep = PartitionSpec()

    interpret = jax.default_backend() != "tpu"
    fwd_call, bwd_call = _make_streamed_composite(
        rps, budget_s, channels, tiles_x, config, interpret, False
    )

    # Per-row lookup tables (tiny): image-tile id and batch index of each
    # flat tile row; shards dynamic-slice their range.
    tile_ids_full = jnp.tile(jnp.arange(num_tiles, dtype=jnp.int32), b)
    b_idx_full = jnp.repeat(jnp.arange(b, dtype=jnp.int32), num_tiles)

    def per_shard_fwd(xy, conic, opacity, color, bg, depth, radius, valid):
        lo = _flat_shard_index(mesh) * rps
        scr = ScreenGaussians(
            xy=xy, depth=depth, conic=conic, radius=radius,
            color=color, opacity=opacity, valid=valid,
        )
        featP, ids_sorted, starts, _, _, _ = _pair_sort_compacted(
            scr, image_shape, config,
            tile_lo=lo, n_tiles_out=rps, budget_override=budget_s,
        )
        featP = jax.lax.stop_gradient(featP)
        seg = starts[1:] - starts[:-1]
        counts = jnp.minimum(seg, cap)
        max_base = budget_s // ck - n_chunks
        base = jnp.minimum(starts[:-1] // ck, max_base)
        off = starts[:-1] - base * ck
        tile_ids = jax.lax.dynamic_slice(tile_ids_full, (lo,), (rps,))
        b_idx = jax.lax.dynamic_slice(b_idx_full, (lo,), (rps,))
        bg_rows = bg[b_idx][..., None]  # (rps, ch, 1)

        img_tiles, tfin, tchk = fwd_call(
            base, off, counts, tile_ids, featP, bg_rows
        )
        return (
            img_tiles, featP, ids_sorted, base, off, counts, tile_ids,
            bg_rows, tfin, tchk,
        )

    fwd_sharded = shard_map(
        per_shard_fwd,
        mesh=mesh,
        in_specs=(rep,) * 8,
        out_specs=(
            row_sp,            # img_tiles
            plane_sp,          # featP
            row_sp,            # ids_sorted
            row_sp, row_sp, row_sp, row_sp,  # base/off/counts/tile_ids
            row_sp,            # bg_rows
            row_sp, row_sp,    # tfin, tchk
        ),
        check_vma=False,
    )

    def per_shard_bwd(
        featP, ids_sorted, base, off, counts, tile_ids, bg_rows,
        tfin, tchk, g_tiles,
    ):
        nproc = jnp.sum(
            (jnp.max(tchk, axis=2) > 0.0).astype(jnp.int32), axis=1
        )
        gtf = jnp.zeros((rps, 1, p), jnp.float32)
        dP, dbg = bwd_call(
            base, off, counts, tile_ids, nproc, featP,
            bg_rows, tchk, tfin, g_tiles, gtf,
            jnp.zeros((_F, budget_s), jnp.float32),
        )
        # Shard-local unsort + banded reduce -> PARTIAL per-gaussian
        # sums (each gaussian's <= max_dup pairs may span shards).
        cols = [dP[k] for k in range(n_feat)]
        unsorted = jax.lax.sort(
            (ids_sorted,) + tuple(cols), num_keys=1, is_stable=False
        )
        ids_u = unsorted[0]
        ids_bits = jax.lax.bitcast_convert_type(ids_u, jnp.float32)
        rows_g = [ids_bits] + list(unsorted[1:])
        rows_g += [jnp.zeros((budget_s,), jnp.float32)] * (16 - len(rows_g))
        plane = jnp.stack(rows_g, axis=0)
        red = banded_dup_reduce(plane, ids_u, b * n, max_dup)
        d = jnp.stack(
            [red[1 + i] for i in range(n_feat)], axis=-1
        ).reshape(b, n, n_feat)
        d = jax.lax.psum(d, ax)
        # Background gradient: per-shard rows -> per-batch via a tiny
        # one-hot matmul (scatter-free), then psum.
        lo = _flat_shard_index(mesh) * rps
        b_idx = jax.lax.dynamic_slice(b_idx_full, (lo,), (rps,))
        onb = (
            b_idx[:, None] == jnp.arange(b, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # (rps, b)
        d_bg = jnp.einsum("rc,rb->bc", dbg[:, :, 0], onb)
        d_bg = jax.lax.psum(d_bg, ax)
        return d, d_bg

    bwd_sharded = shard_map(
        per_shard_bwd,
        mesh=mesh,
        in_specs=(
            plane_sp, row_sp, row_sp, row_sp, row_sp, row_sp,
            row_sp, row_sp, row_sp, row_sp,
        ),
        out_specs=(rep, rep),
        check_vma=False,
    )

    @jax.custom_vjp
    def rasterize(xy, conic, opacity, color, bg, depth, radius, valid):
        img, _ = _fwd_impl(xy, conic, opacity, color, bg, depth, radius,
                           valid)
        return img

    def _fwd_impl(xy, conic, opacity, color, bg, depth, radius, valid):
        (
            img_tiles, featP, ids_sorted, base, off, counts, tile_ids,
            bg_rows, tfin, tchk,
        ) = fwd_sharded(xy, conic, opacity, color, bg, depth, radius, valid)
        out = _tiles_to_image(img_tiles, b, tiles_x, tiles_y, channels, ts)
        res = (
            featP, ids_sorted, base, off, counts, tile_ids, bg_rows,
            tfin, tchk,
        )
        return out[:, :h, :w], res

    def raster_fwd(xy, conic, opacity, color, bg, depth, radius, valid):
        img, res = _fwd_impl(xy, conic, opacity, color, bg, depth, radius,
                             valid)
        return img, (res, depth, radius)

    def raster_bwd(res_all, g_img):
        res, depth, radius = res_all
        g_pad = jnp.zeros(
            (b, tiles_y * ts, tiles_x * ts, channels), g_img.dtype
        )
        g_pad = g_pad.at[:, :h, :w].set(g_img)
        g_tiles = g_pad.reshape(b, tiles_y, ts, tiles_x, ts, channels)
        g_tiles = g_tiles.transpose(0, 1, 3, 5, 2, 4).reshape(
            rows, channels, p
        )
        d, d_bg = bwd_sharded(*res, g_tiles)
        d_xy = d[..., 0:2]
        d_conic = d[..., 2:5]
        d_op = d[..., 5]
        d_color = d[..., 6:]
        return (
            d_xy, d_conic, d_op, d_color, d_bg,
            jnp.zeros_like(depth), jnp.zeros_like(radius), None,
        )

    rasterize.defvjp(raster_fwd, raster_bwd)
    return rasterize(
        screen.xy, screen.conic, screen.opacity, screen.color, background,
        screen.depth, screen.radius, screen.valid,
    )
