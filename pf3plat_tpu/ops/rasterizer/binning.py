"""Tile binning with static shapes — the TPU answer to CUDA's atomics+radix.

The reference's CUDA rasterizer builds variable-length per-tile gaussian
lists with atomic counters and a global 64-bit radix sort over (tile, depth)
keys. TPUs have neither atomics nor dynamic shapes; additionally, dynamic
gathers are slow (~66M rows/s measured on v5e) and XLA's sort is
comparison-based. The design here minimizes both:

  1. expand each gaussian into a static number of (tile, slot) candidates
     covering its clamped tile AABB (`max_dup`, default 3x3 tiles);
  2. ONE multi-key `lax.sort` over (tile_id, depth_bits, gaussian_id) —
     the float32 depth is bitcast to a monotone int32 key (depths are
     positive after near-culling), so no pre-argsort and no gather-by-rank
     passes are needed at all;
  3. per-tile segment starts via a 1D searchsorted over the sorted tile ids;
  4. one row-gather builds the dense (num_tiles, capacity) index table,
     padded with -1.

Gradients do not flow through binning (indices are integer data), matching
the CUDA design where binning is non-differentiable bookkeeping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array

_INT32_MAX = jnp.int32(2**31 - 1)


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
    # Static cap on the footprint, anchored at the AABB's top-left. Gaussians
    # larger than side*tile_size pixels are truncated (configurable; at
    # PF3plat's pixel-aligned scales this is unreachable in practice).
    tw = jnp.minimum(tx1 - tx0 + 1, side)
    th = jnp.minimum(ty1 - ty0 + 1, side)
    visible = screen.valid & (screen.radius > 0)
    tw = jnp.where(visible, tw, 0)
    th = jnp.where(visible, th, 0)
    return TileBounds(tx0, ty0, tw, th)


def tile_alpha_cull(
    mu_x: Array,
    mu_y: Array,
    ca: Array,
    cb: Array,
    cc: Array,
    opacity: Array,
    tx: Array,
    ty: Array,
    config: RasterizeConfig,
) -> Array:
    """Opacity-aware tight tile culling: keep mask for candidate pairs.

    A candidate (gaussian, tile) pair contributes to the composite only
    where its alpha = opacity * exp(-Q(p - mu)) clears `alpha_min` — the
    compositing kernels zero every contribution below it (image AND
    gradients are exactly zero for a fully sub-threshold pair). This
    computes the EXACT minimum of the positive-definite quadratic
    Q(d) = 0.5*(ca dx^2 + cc dy^2) + cb dx dy over the tile's pixel-center
    rectangle (interior => 0; otherwise the min lies on one of the four
    edges, each a clamped 1D quadratic), and drops pairs whose best-case
    alpha still misses the cutoff. A relative+absolute relaxation of Qmin
    absorbs the float32 evaluation differences vs the kernels' per-pixel
    power computation, keeping the cull strictly conservative — dropped
    pairs are exactly-zero pairs, so compositing order is unchanged and
    images/gradients match AABB-only binning to f32 reassociation
    (removing a zero pair shifts later pairs across chunk boundaries,
    reassociating the transmittance product: ~1e-7 image / ~1e-8 gradient
    deltas, measured). Capacity-truncated tiles aside, where culling only
    ADMITS more contributing gaussians.

    The reference's CUDA rasterizer bins by the same AABB-only test
    (diff-gaussian-rasterization `duplicateWithKeys`); tighter per-tile
    culling is the standard follow-up in the 3DGS literature and measures
    a large dead-pair reduction on pixel-aligned PF3plat scenes.

    All args broadcast together over the candidate layout ((b, n, dup) or
    (dup, b, n)); `tx`/`ty` are the candidate's integer tile coords.
    Returns True where the pair may contribute.
    """
    ts = config.tile_size
    f = jnp.float32
    rx0 = tx.astype(f) * ts + 0.5
    ry0 = ty.astype(f) * ts + 0.5
    dxl = rx0 - mu_x
    dxh = rx0 + (ts - 1.0) - mu_x
    dyl = ry0 - mu_y
    dyh = ry0 + (ts - 1.0) - mu_y
    inside = (dxl <= 0) & (dxh >= 0) & (dyl <= 0) & (dyh >= 0)

    tiny = jnp.float32(1e-12)
    ca_s = jnp.maximum(ca, tiny)
    cc_s = jnp.maximum(cc, tiny)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(a):  # dx fixed at a, dy free in [dyl, dyh]
        d = jnp.clip(-cb * a / cc_s, dyl, dyh)
        return q(a, d)

    def edge_y(b_):  # dy fixed at b_, dx free in [dxl, dxh]
        d = jnp.clip(-cb * b_ / ca_s, dxl, dxh)
        return q(d, b_)

    q_edge = jnp.minimum(
        jnp.minimum(edge_x(dxl), edge_x(dxh)),
        jnp.minimum(edge_y(dyl), edge_y(dyh)),
    )
    q_min = jnp.where(inside, 0.0, q_edge)
    # Strictly-conservative relaxation: inflate the alpha bound beyond any
    # f32 evaluation skew between this bound and the kernels' power math.
    q_relaxed = jnp.maximum(q_min * (1.0 - 1e-4) - 1e-5, 0.0)
    return opacity * jnp.exp(-q_relaxed) >= config.alpha_min


class BinnedTiles(NamedTuple):
    indices: Array  # (num_tiles, capacity) int32 gaussian ids, -1 padded
    counts: Array   # (num_tiles,) int32
    num_tiles_x: int
    num_tiles_y: int


def _depth_sort_key(depth: Array, valid: Array) -> Array:
    """Monotone int32 sort key from positive float32 depths."""
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    return jnp.where(valid & (depth > 0), bits, _INT32_MAX)


def bin_gaussians(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
) -> BinnedTiles:
    """Bin one camera's gaussians ((n,)-shaped screen fields)."""
    batched = jax.tree_util.tree_map(lambda x: x[None], screen)
    out = bin_gaussians_batched(batched, image_shape, config)
    return BinnedTiles(
        out.indices[0], out.counts[0], out.num_tiles_x, out.num_tiles_y
    )


def bin_gaussians_batched(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
) -> BinnedTiles:
    """Bin a batch of cameras' gaussians; see module docstring.

    All ScreenGaussians fields carry a leading batch dim (b, n, ...). Uses a
    single batched multi-key `lax.sort` along the pair axis and a manual
    vectorized binary search for segment boundaries (vmapping the 1D
    formulation lowers ~4x slower on TPU). Returns (b, tiles, cap) indices.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b, n = screen.depth.shape
    side = config.max_tiles_per_gaussian_side
    max_dup = config.max_dup
    cap = config.tile_capacity
    p = n * max_dup

    bounds = tile_bounds(screen, image_shape, config)
    visible = (bounds.tw > 0) & (bounds.th > 0)
    depth_key = _depth_sort_key(screen.depth, visible)  # (b, n)

    # Everything below runs on FLAT 1D arrays with the batch folded into the
    # tile key (key = b_idx * num_tiles + tile): any leading batch dim — even
    # b=1 — makes lax.sort / take_along_axis lower ~4x slower on TPU.
    total_pairs = b * p
    total_tiles = b * num_tiles
    assert total_tiles * 2 < 2**31

    slot = jnp.arange(max_dup, dtype=jnp.int32)
    dy = slot // side
    dx = slot % side
    in_box = (dy < bounds.th[..., None]) & (dx < bounds.tw[..., None])  # (b, n, dup)
    if config.tight_cull:
        in_box &= tile_alpha_cull(
            screen.xy[..., 0:1], screen.xy[..., 1:2],
            screen.conic[..., 0:1], screen.conic[..., 1:2],
            screen.conic[..., 2:3], screen.opacity[..., None],
            bounds.tx0[..., None] + dx, bounds.ty0[..., None] + dy,
            config,
        )
    tile = (bounds.ty0[..., None] + dy) * tiles_x + (bounds.tx0[..., None] + dx)
    b_off = (jnp.arange(b, dtype=jnp.int32) * num_tiles)[:, None, None]
    tile_key = jnp.where(in_box, tile + b_off, _INT32_MAX).reshape(total_pairs)
    depth_keys = jnp.broadcast_to(
        depth_key[..., None], (b, n, max_dup)
    ).reshape(total_pairs)
    ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :, None], (b, n, max_dup)
    ).reshape(total_pairs)

    # One flat lexicographic sort: (batch*tile, depth) -> per-tile
    # front-to-back segments. Optionally fused into a single int32 key
    # with quantized depth bits (~2x faster; see RasterizeConfig).
    if config.fused_sort_key:
        bits_d = 31 - max(1, (total_tiles - 1)).bit_length() - 1
        # Range-normalized quantization: bits_d levels spread uniformly over
        # the scene's [min, max] depth (not truncated float bits, which waste
        # precision on the exponent range). Gaussians whose depths quantize
        # to the same level keep their id order (the sort is stable), exactly
        # like true depth ties under the 2-key sort — so divergence is
        # bounded by reorderings within one level (range / 2^bits_d deep).
        d = screen.depth
        dvalid = visible & (d > 0)
        dmin = jnp.min(jnp.where(dvalid, d, jnp.inf))
        dmax = jnp.max(jnp.where(dvalid, d, -jnp.inf))
        levels = jnp.float32((1 << bits_d) - 1)
        dq = jnp.clip(
            (d - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0
        ) * levels
        # levels rounds UP in float32 once bits_d > 24, so the product can
        # hit 2^bits_d exactly at max depth — clamp after the integer cast
        # or the top level overflows into the tile bits.
        dq = jnp.minimum(dq.astype(jnp.int32), (1 << bits_d) - 1)
        dq = jnp.broadcast_to(
            dq[..., None], (b, n, max_dup)
        ).reshape(total_pairs)
        fused = jnp.where(
            tile_key == _INT32_MAX, _INT32_MAX, (tile_key << bits_d) | dq
        )
        # ids ascend with input order inside every equal-key run (g-major
        # layout; one gaussian never hits the same tile twice), so making
        # them an explicit key reproduces the stable tie order exactly while
        # letting XLA drop the stability machinery (is_stable=False).
        fused_sorted, ids_sorted = jax.lax.sort(
            (fused, ids), num_keys=2, is_stable=False
        )
        tile_sorted = jnp.where(
            fused_sorted == _INT32_MAX,
            _INT32_MAX,
            jax.lax.shift_right_logical(fused_sorted, bits_d),
        )
    else:
        # Same tie-order argument as the fused branch: ids-as-third-key ==
        # stable input order, and (tile, depth, id) triples never repeat
        # within one tile, so the unstable sort is exact.
        tile_sorted, _, ids_sorted = jax.lax.sort(
            (tile_key, depth_keys, ids), num_keys=3, is_stable=False
        )

    # Segment starts via manual vectorized binary search (jnp.searchsorted
    # lowers very poorly on TPU for batched/2D inputs).
    targets = jnp.arange(total_tiles + 1, dtype=jnp.int32)
    lo = jnp.zeros((total_tiles + 1,), jnp.int32)
    hi = jnp.full((total_tiles + 1,), total_pairs, jnp.int32)
    for _ in range(max(1, int(total_pairs).bit_length())):
        mid = (lo + hi) // 2
        v = tile_sorted[jnp.minimum(mid, total_pairs - 1)]
        # `mid >= total_pairs` counts as >= target: once lo == hi ==
        # total_pairs (target beyond every key) a further probe must not
        # push lo past total_pairs, or the last tile double-composites its
        # deepest gaussian when no padding rows exist.
        ge = (v >= targets) | (mid >= total_pairs)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    starts = lo
    counts = jnp.minimum(starts[1:] - starts[:-1], cap)  # (b*T,)

    k = jnp.arange(cap, dtype=jnp.int32)
    pair_pos = jnp.minimum(starts[:-1, None] + k[None, :], total_pairs - 1)
    in_seg = k[None, :] < counts[:, None]
    gathered = ids_sorted[pair_pos.reshape(-1)].reshape(total_tiles, cap)
    indices = jnp.where(in_seg, gathered, -1).reshape(b, num_tiles, cap)
    counts = counts.reshape(b, num_tiles)

    return BinnedTiles(
        indices=jax.lax.stop_gradient(indices),
        counts=jax.lax.stop_gradient(counts),
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
    )
