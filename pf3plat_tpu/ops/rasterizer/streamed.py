"""Streamed rasterizer pipeline — sort-carried features, zero row gathers.

Round-2 trace attribution of the dense-table ("pallas") pipeline showed 55%
of the frame spent in three row-addressed XLA passes (feature gather, its
scatter-add VJP, ids gather). TPU gathers/scatters are row-latency-bound
(~85-140 M rows/s measured); `lax.sort` moves the same rows ~10x faster.
This pipeline therefore carries the feature channels THROUGH the binning
sort as sort payload operands, after which every downstream access is
**contiguous**:

  1. projection (unchanged, `project.py`);
  2. ONE unstable `lax.sort` over the (batch*tile | quantized-depth) fused
     key with the g-major pair id as tiebreak key, carrying
     [x, y, conic(3), opacity, color(ch)] — the sorted feature arrays ARE
     the compositing input, no dense per-tile table;
  3. per-tile segment boundaries via the same vectorized binary search as
     `binning.py`;
  4. the Pallas forward kernel walks tile t's segment
     [starts[t], starts[t]+count) directly in the sorted array — ONE
     whole-window async DMA per tile (n_chunks*chunk 128-aligned lanes,
     double-buffered across consecutive tiles), then a VPU chunk loop
     with row masks, early-exiting on transmittance saturation — the
     CUDA rasterizer's "global sorted list + per-tile ranges" design,
     with DMA replacing shared-memory staging;
  5. the backward kernel re-DMAs the same windows, computes per-chunk
     feature gradients, and ACCUMULATES them in-place into HBM gradient
     buffers laid out exactly like the sorted features (read-modify-write
     window DMAs; the sequential Pallas grid plus per-step drains order the
     writes, so adjacent tiles sharing a boundary window merge correctly
     with ZERO XLA glue — measured on-chip, this replaced a 1.7 ms block
     transpose + 2.1 ms block scatter-add). Under a mesh the kernel falls
     back to emitting per-(tile, chunk) gradient blocks merged by one XLA
     block scatter-add (pure writes — order-independent and shardable);
  6. ONE unstable `lax.sort` keyed on the carried pair ids restores
     original pair order, and a reshape-sum over the max_dup axis yields
     per-gaussian gradients — replacing a row scatter-add entirely.

Feature layout: ONE 9-row stacked plane
`featP = [x, y, ca, cb, cc, op, c0, c1, c2]`. Round 4 fetched it in
per-chunk DMA rings on the theory that DMA start/wait ops dominated;
round 5 moved to one whole-window DMA per tile and measured it
PERF-NEUTRAL — the kernels are VPU-bound (alpha/transmittance
transcendentals), not DMA-bound (see ROADMAP "Speed of light") — and
kept the whole-window form for its simpler pipeline (no ring
bookkeeping or early-exit drains in the fwd/blocks kernels).

Same capacity/ordering semantics as the dense-table pipeline (count =
min(segment, tile_capacity), fused or exact 2-key sort), so the oracle
parity tests cover it unchanged.

Replaces the CUDA binning/sort/compositing stages of
`diff-gaussian-rasterization` (SURVEY.md §2.3 row 1; reference glue at
`src/model/decoder/cuda_splatting.py:99-126`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import (
    tile_bounds, tile_alpha_cull, _depth_sort_key, _INT32_MAX
)
from .compact import banded_dup_reduce, compact_pairs
from .pallas_impl import _tri_incl, _tri_suffix
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array

# Feature plane sublane rows: [x, y, ca, cb, cc, op, c0, c1, c2] + 7 zero
# pad rows (Mosaic DMA slices must be 8-sublane aligned). The 7/16 pad
# bytes cost ~0.03 ms of HBM bandwidth per frame — noise against a
# VPU-bound ~17 ms frame — and buy a single clean 16-row window per
# whole-tile DMA.
_F = 16


def _pair_sort(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
):
    """Expand gaussians into (tile, depth)-sorted pairs CARRYING features.

    Returns (featP (9, padded), ids_sorted (padded,), starts (bT+1,),
    tiles_x, tiles_y, total_pairs). Identical
    key construction (and thus identical compositing order/capacity
    semantics) to `binning.bin_gaussians_batched`.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b, n = screen.depth.shape
    side = config.max_tiles_per_gaussian_side
    max_dup = config.max_dup
    total_pairs = b * n * max_dup
    total_tiles = b * num_tiles

    assert total_tiles * 2 < 2**31  # fused-key bit budget (cf. binning.py)

    bounds = tile_bounds(screen, image_shape, config)
    visible = (bounds.tw > 0) & (bounds.th > 0)

    # Pairs are laid out SLOT-MAJOR — (max_dup, b, n) — so every feature
    # broadcast is a leading-axis copy of a contiguous (b, n) block (the
    # (b, n, max_dup) layout put the dup axis innermost: 4-lane strided
    # writes, measured ~6x slower materialization). Tie order is preserved
    # exactly by sorting with the g-major pair id as a SECOND key instead
    # of relying on stable input order.
    slot = jnp.arange(max_dup, dtype=jnp.int32)[:, None, None]
    dy = slot // side
    dx = slot % side
    in_box = (dy < bounds.th[None]) & (dx < bounds.tw[None])
    if config.tight_cull:
        in_box &= tile_alpha_cull(
            screen.xy[None, ..., 0], screen.xy[None, ..., 1],
            screen.conic[None, ..., 0], screen.conic[None, ..., 1],
            screen.conic[None, ..., 2], screen.opacity[None],
            bounds.tx0[None] + dx, bounds.ty0[None] + dy,
            config,
        )
    tile = (bounds.ty0[None] + dy) * tiles_x + (bounds.tx0[None] + dx)
    b_off = (jnp.arange(b, dtype=jnp.int32) * num_tiles)[None, :, None]
    tile_key = jnp.where(in_box, tile + b_off, _INT32_MAX).reshape(total_pairs)
    # g-major pair id (gaussian * max_dup + slot): the VALUE ordering other
    # stages rely on (bwd unsort + reshape over the dup axis).
    g_idx = jnp.arange(b * n, dtype=jnp.int32).reshape(1, b, n)
    ids = (g_idx * max_dup + slot).reshape(total_pairs)

    def pairify(x):  # (b, n) -> (total_pairs,), slot-major
        return jnp.broadcast_to(x[None], (max_dup, b, n)).reshape(
            total_pairs
        )

    # Sanitize culled gaussians' features: projection leaves garbage (up to
    # inf/NaN) in invisible rows, and although the kernels seg-mask their
    # alpha/gradient CONTRIBUTIONS, a non-finite feature inside a shared DMA
    # window would still poison the masked arithmetic (inf * 0 = NaN).
    def feat(x):
        return pairify(jnp.where(visible, x, 0.0))

    channels = screen.color.shape[-1]
    if channels > 3:
        raise ValueError(
            f"streamed pipeline supports at most 3 color channels, got "
            f"{channels}"
        )
    feats = [
        feat(screen.xy[..., 0]),
        feat(screen.xy[..., 1]),
        feat(screen.conic[..., 0]),
        feat(screen.conic[..., 1]),
        feat(screen.conic[..., 2]),
        feat(screen.opacity),
    ] + [feat(screen.color[..., c]) for c in range(channels)]

    if config.fused_sort_key:
        bits_d = 31 - max(1, (total_tiles - 1)).bit_length() - 1
        d = screen.depth
        dvalid = visible & (d > 0)
        dmin = jnp.min(jnp.where(dvalid, d, jnp.inf))
        dmax = jnp.max(jnp.where(dvalid, d, -jnp.inf))
        levels = jnp.float32((1 << bits_d) - 1)
        dq = jnp.clip(
            (d - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0
        ) * levels
        dq = jnp.minimum(dq.astype(jnp.int32), (1 << bits_d) - 1)
        dq = pairify(dq)
        fused = jnp.where(
            tile_key == _INT32_MAX, _INT32_MAX, (tile_key << bits_d) | dq
        )
        # (fused, id) pairs are unique (ids enumerate pairs), so the
        # unstable sort is deterministic and identical to the stable one.
        sorted_ops = jax.lax.sort(
            (fused, ids) + tuple(feats), num_keys=2, is_stable=False
        )
        key_sorted = sorted_ops[0]
        tile_sorted = jnp.where(
            key_sorted == _INT32_MAX,
            _INT32_MAX,
            jax.lax.shift_right_logical(key_sorted, bits_d),
        )
        ids_sorted = sorted_ops[1]
        feats_sorted = sorted_ops[2:]
    else:
        depth_keys = pairify(_depth_sort_key(screen.depth, visible))
        sorted_ops = jax.lax.sort(
            (tile_key, depth_keys, ids) + tuple(feats),
            num_keys=3, is_stable=False,  # (tile, depth, id) unique
        )
        tile_sorted = sorted_ops[0]
        ids_sorted = sorted_ops[2]
        feats_sorted = sorted_ops[3:]

    # Segment starts: same fixed-iteration binary search as binning.py.
    targets = jnp.arange(total_tiles + 1, dtype=jnp.int32)
    lo = jnp.zeros((total_tiles + 1,), jnp.int32)
    hi = jnp.full((total_tiles + 1,), total_pairs, jnp.int32)
    for _ in range(max(1, int(total_pairs).bit_length())):
        mid = (lo + hi) // 2
        v = tile_sorted[jnp.minimum(mid, total_pairs - 1)]
        ge = (v >= targets) | (mid >= total_pairs)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    starts = lo

    # Pad rows only up to the next 128 multiple (none at all for 128-aligned
    # pair counts, i.e. every power-of-two image); windows near the array
    # end are handled by CLAMPING each tile's base so
    # [base*128, (base+n_chunks)*128) stays in bounds — the kernel's
    # absolute [off, off+count) masking is exact for any off, so a clamped
    # window composites identically.
    c = config.chunk
    n_chunks = config.tile_capacity // c + 1
    padded = max(-(-total_pairs // c), n_chunks) * c
    if padded == total_pairs:
        cols = list(feats_sorted)
    else:
        cols = [jnp.pad(f, (0, padded - total_pairs)) for f in feats_sorted]
    cols += [jnp.zeros((padded,), jnp.float32)] * (_F - len(cols))
    featP = jnp.stack(cols, axis=0)  # (16, padded)
    return featP, ids_sorted, starts, tiles_x, tiles_y, total_pairs


def _use_compaction(config: RasterizeConfig, b: int, n: int) -> bool:
    """Compaction engages only when enabled AND the scene is big enough
    for the sort savings to matter (small scenes are often densely
    covered, where a fractional budget would truncate)."""
    return (
        config.pairs_budget_factor > 0
        and b * n * config.max_dup >= config.compact_min_pairs
    )


def _pair_sort_compacted(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
    tile_lo=None,
    n_tiles_out: int | None = None,
    budget_override: int | None = None,
):
    """Compacted variant of `_pair_sort`: expand + compact candidates to
    a static budget (compact.py), then run the SAME keyed sorts over the
    budget rows (~2x fewer on PF3plat scenes; lax.sort cost scales with
    rows x operands). Composite order is identical — the carried pair
    ids reproduce the uncompacted tie order exactly.

    `tile_lo` + `n_tiles_out` (+ `budget_override`) restrict the pipeline
    to the flat tile-key range [tile_lo, tile_lo + n_tiles_out): the
    shard-local mesh path (shard_local.py), where each shard compacts and
    sorts ONLY its own tile rows. `tile_lo` may be traced (it depends on
    the shard index); `n_tiles_out` and the budget are static.

    Returns (featP, ids_sorted, starts, tiles_x, tiles_y, budget); starts
    has n_tiles_out + 1 entries relative to the range.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b, n = screen.depth.shape
    total_tiles = b * num_tiles
    channels = screen.color.shape[-1]
    if n_tiles_out is None:
        n_tiles_out = total_tiles
    t0 = 0 if tile_lo is None else tile_lo

    cp = compact_pairs(
        screen, image_shape, config,
        tile_lo=tile_lo,
        tile_hi=None if tile_lo is None else tile_lo + n_tiles_out,
        budget_override=budget_override,
    )
    budget = cp["budget"]
    feats = tuple(cp["feats"][: 6 + channels])

    if config.fused_sort_key:
        fused = jnp.where(
            cp["tile"] == _INT32_MAX,
            _INT32_MAX,
            (cp["tile"] << cp["bits_d"]) | cp["dkey"],
        )
        sorted_ops = jax.lax.sort(
            (fused, cp["ids"]) + feats, num_keys=2, is_stable=False
        )
        key_sorted = sorted_ops[0]
        tile_sorted = jnp.where(
            key_sorted == _INT32_MAX,
            _INT32_MAX,
            jax.lax.shift_right_logical(key_sorted, cp["bits_d"]),
        )
        ids_sorted = sorted_ops[1]
        feats_sorted = sorted_ops[2:]
    else:
        sorted_ops = jax.lax.sort(
            (cp["tile"], cp["dkey"], cp["ids"]) + feats,
            num_keys=3, is_stable=False,
        )
        tile_sorted = sorted_ops[0]
        ids_sorted = sorted_ops[2]
        feats_sorted = sorted_ops[3:]

    # Segment starts: same fixed-iteration binary search as _pair_sort.
    targets = t0 + jnp.arange(n_tiles_out + 1, dtype=jnp.int32)
    lo = jnp.zeros((n_tiles_out + 1,), jnp.int32)
    hi = jnp.full((n_tiles_out + 1,), budget, jnp.int32)
    for _ in range(max(1, int(budget).bit_length())):
        mid = (lo + hi) // 2
        v = tile_sorted[jnp.minimum(mid, budget - 1)]
        ge = (v >= targets) | (mid >= budget)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    starts = lo

    c = config.chunk
    n_chunks = config.tile_capacity // c + 1
    if budget < n_chunks * c or budget % c:
        raise ValueError(
            f"pairs budget {budget} must be a chunk multiple covering one "
            f"tile window ({n_chunks * c} rows); raise pairs_budget_factor "
            "or compact_window"
        )
    cols = list(feats_sorted)
    cols += [jnp.zeros((budget,), jnp.float32)] * (_F - len(cols))
    featP = jnp.stack(cols, axis=0)  # (16, budget)
    return featP, ids_sorted, starts, tiles_x, tiles_y, budget


def _chunk_alpha_cols(data, px, py, config):
    """(8, C) chunk data -> alpha (C, P) block + residuals (cf.
    pallas_impl._chunk_alpha with f_major columns)."""
    x0 = data[0, :][:, None]
    y0 = data[1, :][:, None]
    ca = data[2, :][:, None]
    cb = data[3, :][:, None]
    cc = data[4, :][:, None]
    op = data[5, :][:, None]
    dx = px - x0
    dy = py - y0
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * g
    alpha = jnp.minimum(alpha_raw, config.alpha_clamp)
    keep = (power <= 0.0) & (alpha >= config.alpha_min)
    alpha = jnp.where(keep, alpha, 0.0)
    unclamped = keep & (alpha_raw < config.alpha_clamp)
    return alpha, dx, dy, g, unclamped


def _color_rows(dataP, channels):
    """The (channels, C) color block of a feature-plane chunk."""
    return dataP[6 : 6 + channels, :]


def _streamed_fwd_kernel(
    base_ref,        # scalar prefetch (rows,): 128-aligned chunk base
    off_ref,         # scalar prefetch (rows,): start offset within window
    counts_ref,      # scalar prefetch (rows,)
    tile_ids_ref,    # scalar prefetch (rows,)
    featP_hbm,       # (16, padded) ANY
    bg_ref,          # (T, ch, 1) VMEM
    img_ref,         # (T, ch, P) out
    tfin_ref,        # (T, 1, P) out
    tchk_ref,        # (T, n_chunks, P) out
    buf,             # VMEM (2, 16, n_chunks*c) whole-window double buffer
    accum,           # VMEM (ch, P)
    tcar,            # VMEM (1, P)
    sem,             # DMA sem (2,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
    t_step: int,
    rows: int,
):
    """Composites `t_step` tiles per grid step (python-unrolled): the
    per-step pipeline machinery (block copies, semaphores, prologue) is
    a measured ~3 us/tile at t_step=1 — amortizing it across tiles is
    worth more than any chunk-level tuning.

    Feature fetch is ONE whole-window DMA per tile (n_chunks*c lanes),
    double-buffered across consecutive tiles: the per-chunk prefetch
    ring paid ~1 us of scalar-core DMA start/wait per chunk REGARDLESS
    of depth (v5e-measured, round 4), so one DMA per tile replaces
    ~n_proc of them; the extra bytes past the early-exit point are HBM
    bandwidth, which the streamed frame has in abundance (the whole
    feature plane is ~2 ms of traffic against a ~17 ms frame)."""
    c = config.chunk  # multiple of 128
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32
    r = pl.program_id(0)
    l_incl = _tri_incl(c, dtype)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)

    def window_dma(row, slot):
        return pltpu.make_async_copy(
            featP_hbm.at[:, pl.ds(base_ref[row] * c, n_chunks * c)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(r == 0)
    def _():
        window_dma(0, 0).start()

    for t in range(t_step):
        _fwd_one_tile(
            r * t_step + t, t, off_ref, counts_ref, tile_ids_ref,
            bg_ref, img_ref, tfin_ref, tchk_ref,
            buf, accum, tcar, window_dma,
            config=config, channels=channels, tiles_x=tiles_x,
            n_chunks=n_chunks, l_incl=l_incl, lane_col=lane_col,
            local=local, rows=rows,
        )


def _fwd_one_tile(
    row, t, off_ref, counts_ref, tile_ids_ref,
    bg_ref, img_ref, tfin_ref, tchk_ref,
    buf, accum, tcar, window_dma,
    *, config, channels, tiles_x, n_chunks, l_incl, lane_col, local, rows,
):
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32

    t_img = tile_ids_ref[row]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    off = off_ref[row]
    count = counts_ref[row]

    accum[...] = jnp.zeros((channels, p), dtype)
    tcar[...] = jnp.ones((1, p), dtype)
    tchk_ref[t] = jnp.zeros((n_chunks, p), dtype)

    slot = jax.lax.rem(row, 2)
    # Prefetch the NEXT tile's window into the other slot, then wait for
    # this tile's — consecutive tiles overlap fetch with compute. The
    # other slot is free: its previous owner (row-1) was waited one tile
    # ago.
    @pl.when(row + 1 < rows)
    def _():
        window_dma(row + 1, jax.lax.rem(row + 1, 2)).start()

    window_dma(row, slot).wait()

    E = config.chunks_per_iter
    n_groups = -(-n_chunks // E)

    def chunk_body(i):
        data = buf[slot, :, pl.ds(i * c, c)]   # (16, c)
        alpha, _, _, _, _ = _chunk_alpha_cols(data, px, py, config)
        # Mask rows outside this tile's segment [off, off+count).
        j = i * c + lane_col                   # global window position
        seg = (j >= off) & (j < off + count)
        alpha = jnp.where(seg, alpha, 0.0)
        color = _color_rows(data, channels)

        tchk_ref[t, i, :] = tcar[0, :]
        s = jnp.log1p(-alpha)
        incl = jax.lax.dot_general(
            l_incl, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_after = tcar[...] * jnp.exp(incl)
        alive = (t_after >= config.transmittance_min) & seg
        one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
        t_before = t_after / one_m
        wgt = jnp.where(alive, t_before * alpha, 0.0)
        accum[...] += jax.lax.dot_general(
            color, wgt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        any_alive = jnp.any(alive, axis=0, keepdims=True)
        t_last = jnp.min(
            jnp.where(alive, t_after, jnp.inf), axis=0, keepdims=True
        )
        tcar[...] = jnp.where(any_alive, t_last, tcar[...])

    # Loop over GROUPS of E chunks: the early-exit/segment-end condition
    # is evaluated once per group (scalar<->vector sync + loop control are
    # the measured per-iteration cost), and the up-to-E-1 overshoot chunks
    # composite exact zeros (alpha fully masked once past the segment or
    # saturation), so the image is bit-equal to the E=1 walk.
    def cond(g):
        return (g * E * c < off + count) & (
            jnp.max(tcar[...]) >= config.transmittance_min
        )

    def body(g):
        for e in range(E):
            ci = g * E + e

            @pl.when(ci < n_chunks)
            def _(ci=ci):
                chunk_body(ci)
        return g + 1

    jax.lax.while_loop(lambda g: (g < n_groups) & cond(g), body, 0)

    img_ref[t] = accum[...] + bg_ref[t] * tcar[...]
    tfin_ref[t] = tcar[...]


def _bwd_chunk_grads(
    dataP, tchk_row, g, gt_tail, px, py, off, count,
    lane_col, l_incl, u_suf, config, channels, i,
):
    """Shared backward math for one chunk: returns (d_chunk (16, C),
    m (C, P) for the running tail update)."""
    c = config.chunk
    alpha, dx, dy, gexp, unclamped = _chunk_alpha_cols(
        dataP, px, py, config
    )
    j = i * c + lane_col
    seg = (j >= off) & (j < off + count)
    alpha = jnp.where(seg, alpha, 0.0)
    unclamped = unclamped & seg
    color = _color_rows(dataP, channels)

    t_start = tchk_row
    s = jnp.log1p(-alpha)
    incl = jax.lax.dot_general(
        l_incl, s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_after = t_start * jnp.exp(incl)
    alive = (t_after >= config.transmittance_min) & seg
    one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
    t_before = t_after / one_m
    wgt = jnp.where(alive, t_before * alpha, 0.0)

    cg = jax.lax.dot_general(
        color, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, P)
    m = wgt * cg
    suffix = jax.lax.dot_general(
        u_suf, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + gt_tail

    dalpha = jnp.where(alive, t_before * cg - suffix / one_m, 0.0)
    dalpha = jnp.where(unclamped, dalpha, 0.0)

    op = dataP[5, :][:, None]
    dpow = alpha * dalpha
    ca = dataP[2, :][:, None]
    cb = dataP[3, :][:, None]
    cc = dataP[4, :][:, None]

    d_op = jnp.sum(gexp * dalpha, axis=1)[None, :]
    d_ca = jnp.sum(-0.5 * dx * dx * dpow, axis=1)[None, :]
    d_cb = jnp.sum(-dx * dy * dpow, axis=1)[None, :]
    d_cc = jnp.sum(-0.5 * dy * dy * dpow, axis=1)[None, :]
    d_x0 = jnp.sum((ca * dx + cb * dy) * dpow, axis=1)[None, :]
    d_y0 = jnp.sum((cc * dy + cb * dx) * dpow, axis=1)[None, :]
    d_col = jax.lax.dot_general(
        g, wgt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (ch, C)
    rows = [d_x0, d_y0, d_ca, d_cb, d_cc, d_op, d_col]
    pad = _F - 6 - channels
    if pad:
        rows.append(jnp.zeros((pad, c), jnp.float32))
    d_chunk = jnp.concatenate(rows, axis=0)  # (16, C)
    return d_chunk, m


def _streamed_bwd_rmw_kernel(
    base_ref,
    off_ref,
    counts_ref,
    tile_ids_ref,
    nproc_ref,       # scalar prefetch (rows,): chunks the fwd processed
    featP_hbm,       # (16, padded) ANY
    bg_ref,          # (T, ch, 1)
    tchk_ref,        # (T, n_chunks, P)
    tfin_ref,        # (T, 1, P)
    gimg_ref,        # (T, ch, P)
    gtf_ref,         # (T, 1, P)
    gP_in,           # (16, padded) ANY — aliased to gP_hbm (zero-filled)
    gP_hbm,          # (16, padded) ANY out: in-place gradient accumulator
    dbg_ref,         # (T, ch, 1) out
    fbuf,            # VMEM (2, 16, n_chunks*c) feature window double buffer
    gbuf,            # VMEM (2D, 16, c) gradient RMW ring
    tail,            # VMEM (1, P)
    semF,            # DMA sems (2,)
    semGR, semGW,    # DMA sems (2D,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
    t_step: int,
    rows: int,
):
    """In-place (read-modify-write) backward: gradients accumulate directly
    into HBM buffers laid out like the sorted features. Correctness of the
    overlapping boundary windows relies on the sequential TPU grid plus the
    per-(sub-)tile DMA drain: a tile's writes complete before the next
    tile's reads of the shared window start. NOT safe under a sharded grid
    — the mesh path uses `_streamed_bwd_blocks_kernel` instead. Processes
    `t_step` tiles per grid step (cf. `_streamed_fwd_kernel`).

    Features arrive as ONE whole-window DMA per tile, double-buffered
    across tiles (same rationale as the forward: the per-chunk ring's
    DMA start/wait ops are ~1 us of scalar-core time each). The GRADIENT
    streams stay per-chunk RMW rings: their HBM windows are read-modify-
    written and shared with the next tile, so whole-window double
    buffering would race the neighbor's drain."""
    r = pl.program_id(0)

    def window_dma(row, slot):
        return pltpu.make_async_copy(
            featP_hbm.at[:, pl.ds(base_ref[row] * config.chunk,
                                  n_chunks * config.chunk)],
            fbuf.at[slot],
            semF.at[slot],
        )

    @pl.when(r == 0)
    def _():
        window_dma(0, 0).start()

    for t in range(t_step):
        _bwd_rmw_one_tile(
            r * t_step + t, t, base_ref, off_ref, counts_ref, tile_ids_ref,
            nproc_ref, bg_ref, tchk_ref, tfin_ref,
            gimg_ref, gtf_ref, gP_hbm, dbg_ref, fbuf, gbuf, tail,
            window_dma, semGR, semGW, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks, rows=rows,
        )


def _bwd_rmw_one_tile(
    row, t, base_ref, off_ref, counts_ref, tile_ids_ref, nproc_ref,
    bg_ref, tchk_ref, tfin_ref, gimg_ref, gtf_ref,
    gP_hbm, dbg_ref, fbuf, gbuf, tail, window_dma, semGR, semGW,
    *, config, channels, tiles_x, n_chunks, rows,
):
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32

    t_img = tile_ids_ref[row]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    base = base_ref[row]
    off = off_ref[row]
    count = counts_ref[row]

    g = gimg_ref[t]
    gt = jnp.sum(bg_ref[t] * g, axis=0, keepdims=True) + gtf_ref[t]
    dbg_ref[t] = jnp.sum(g * tfin_ref[t], axis=1, keepdims=True)
    tail[...] = tfin_ref[t] * gt

    l_incl = _tri_incl(c, dtype)
    u_suf = _tri_suffix(c, dtype)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    fslot = jax.lax.rem(row, 2)

    @pl.when(row + 1 < rows)
    def _():
        window_dma(row + 1, jax.lax.rem(row + 1, 2)).start()

    window_dma(row, fslot).wait()

    def dma_grad_read(i, slot, start):
        d = pltpu.make_async_copy(
            gP_hbm.at[:, pl.ds((base + i) * c, c)],
            gbuf.at[slot], semGR.at[slot],
        )
        d.start() if start else d.wait()

    def dma_grad_write(i, slot, start):
        d = pltpu.make_async_copy(
            gbuf.at[slot], gP_hbm.at[:, pl.ds((base + i) * c, c)],
            semGW.at[slot],
        )
        d.start() if start else d.wait()

    # Walk ONLY the chunks the forward actually processed (its early-exit
    # count, recovered from the transmittance checkpoints on the XLA side),
    # in reverse — the all-n_chunks walk cost ~3 ms of dead DMA waits on the
    # bench scene (fwd averages ~1/3 of the capacity before saturating).
    n_proc = nproc_ref[row]
    D = config.prefetch_depth
    Dg = 2 * D  # grad ring: extra depth so write drains trail D steps
    E = config.chunks_per_iter

    # Warm-up: D-1 outstanding grad-read fetches, reverse order.
    for d0 in range(D - 1):
        @pl.when(n_proc - 1 - d0 >= 0)
        def _(d0=d0):
            idx = n_proc - 1 - d0
            dma_grad_read(idx, jax.lax.rem(idx, Dg), True)

    def chunk_step(i):
        slot_g = jax.lax.rem(i, Dg)

        idx2 = i - (D - 1)

        @pl.when(idx2 >= 0)
        def _():
            sg2 = jax.lax.rem(idx2, Dg)

            # gbuf[sg2]'s previous owner is chunk idx2 + Dg (processed Dg
            # steps ago — its write has had D spare steps to land, unlike
            # the 2-slot ring whose drain chased the 1-step-old write);
            # drain it before the new read overwrites the buffer.
            @pl.when(idx2 + Dg <= n_proc - 1)
            def _():
                dma_grad_write(idx2 + Dg, sg2, False)

            dma_grad_read(idx2, sg2, True)

        d_chunk, m = _bwd_chunk_grads(
            fbuf[fslot, :, pl.ds(i * c, c)], tchk_ref[t, i, :][None, :],
            g, tail[...], px, py, off, count, lane_col, l_incl, u_suf,
            config, channels, i,
        )

        dma_grad_read(i, slot_g, False)
        gbuf[slot_g] = gbuf[slot_g] + d_chunk
        dma_grad_write(i, slot_g, True)

        tail[...] += jnp.sum(m, axis=0, keepdims=True)

    # E chunks per fori iteration (same loop-machinery amortization as the
    # forward); the tail group's out-of-range chunks are skipped by the
    # i >= 0 guard, so the walk is identical to the E=1 reverse walk.
    def body(gk, _):
        for e in range(E):
            i = n_proc - 1 - (gk * E + e)

            @pl.when(i >= 0)
            def _(i=i):
                chunk_step(i)
        return ()

    jax.lax.fori_loop(0, (n_proc + E - 1) // E, body, ())

    # Drain every write still in flight (the in-loop drains cover chunks
    # >= Dg only). This is also the cross-step ordering barrier for
    # boundary windows shared with the next tile.
    for j in range(Dg):
        @pl.when(j <= n_proc - 1)
        def _(j=j):
            dma_grad_write(j, jax.lax.rem(j, Dg), False)


def _streamed_bwd_blocks_kernel(
    base_ref,
    off_ref,
    counts_ref,
    tile_ids_ref,
    nproc_ref,
    featP_hbm,       # (16, padded) ANY
    bg_ref,          # (1, ch, 1)
    tchk_ref,        # (1, n_chunks, P)
    tfin_ref,        # (1, 1, P)
    gimg_ref,        # (1, ch, P)
    gtf_ref,         # (1, 1, P)
    dblk_ref,        # (1, n_chunks, 16, c) out: per-chunk gradient blocks
    dbg_ref,         # (1, ch, 1) out
    fbuf,            # VMEM (2, 16, n_chunks*c) feature window double buffer
    tail,            # VMEM (1, P)
    semF,            # DMA sems (2,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
    rows: int,
):
    """Block-output backward (mesh path): emits per-(tile, chunk) gradient
    blocks — pure writes, no cross-step ordering requirement, so the grid
    can be sharded; one XLA block scatter-add merges boundary windows.
    Features arrive as ONE whole-window DMA per tile, double-buffered
    across tiles (cf. `_streamed_fwd_kernel`)."""
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32
    r = pl.program_id(0)

    def window_dma(row, slot):
        return pltpu.make_async_copy(
            featP_hbm.at[:, pl.ds(base_ref[row] * c, n_chunks * c)],
            fbuf.at[slot],
            semF.at[slot],
        )

    @pl.when(r == 0)
    def _():
        window_dma(0, 0).start()

    t_img = tile_ids_ref[r]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    off = off_ref[r]
    count = counts_ref[r]

    g = gimg_ref[0]
    gt = jnp.sum(bg_ref[0] * g, axis=0, keepdims=True) + gtf_ref[0]
    dbg_ref[0] = jnp.sum(g * tfin_ref[0], axis=1, keepdims=True)
    tail[...] = tfin_ref[0] * gt
    dblk_ref[...] = jnp.zeros((1, n_chunks, _F, c), jnp.float32)

    l_incl = _tri_incl(c, dtype)
    u_suf = _tri_suffix(c, dtype)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    fslot = jax.lax.rem(r, 2)

    @pl.when(r + 1 < rows)
    def _():
        window_dma(r + 1, jax.lax.rem(r + 1, 2)).start()

    window_dma(r, fslot).wait()

    n_proc = nproc_ref[r]

    def chunk_step(i):
        d_chunk, m = _bwd_chunk_grads(
            fbuf[fslot, :, pl.ds(i * c, c)], tchk_ref[0, i, :][None, :],
            g, tail[...], px, py, off, count, lane_col, l_incl, u_suf,
            config, channels, i,
        )

        # Pure block write (no RMW): boundary windows shared with
        # adjacent tiles are merged by the XLA scatter-add outside.
        dblk_ref[0, i] = d_chunk

        tail[...] += jnp.sum(m, axis=0, keepdims=True)

    E = config.chunks_per_iter

    def body(gk, _):
        for e in range(E):
            i = n_proc - 1 - (gk * E + e)

            @pl.when(i >= 0)
            def _(i=i):
                chunk_step(i)
        return ()

    jax.lax.fori_loop(0, (n_proc + E - 1) // E, body, ())


@functools.lru_cache(maxsize=32)
def _make_streamed_composite(
    rows: int,
    padded: int,
    channels: int,
    tiles_x: int,
    config: RasterizeConfig,
    interpret: bool,
    sharded: bool,
):
    if config.chunk % 128 or config.chunk <= 0:
        raise ValueError(
            "the streamed pipeline requires chunk to be a positive "
            f"multiple of 128 (DMA window tiling); got {config.chunk}"
        )
    if config.tile_capacity % config.chunk != 0:
        raise ValueError(
            "the streamed pipeline requires tile_capacity to be a multiple "
            f"of chunk ({config.chunk}): a capacity like {config.tile_capacity} would "
            "silently composite fewer gaussians than min(segment, capacity) "
            "whenever a segment's 128-aligned window cannot cover both the "
            "start offset and the full capacity"
        )
    c = config.chunk
    dpf = config.prefetch_depth
    n_chunks = config.tile_capacity // c + 1
    p = config.tile_size**2
    n_win = padded // c
    # Tiles composited per grid step: the largest configured value that
    # divides this shard's row count (amortizes the measured ~3 us/step
    # pipeline overhead).
    tps = config.tiles_per_step
    while rows % tps:
        tps //= 2
    tps = max(tps, 1)

    fwd_call = pl.pallas_call(
        functools.partial(
            _streamed_fwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks, t_step=tps, rows=rows,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(rows // tps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((tps, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tps, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tps, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tps, n_chunks, p), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _F, n_chunks * c), jnp.float32),
                pltpu.VMEM((channels, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, channels, p), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((rows, n_chunks, p), jnp.float32),
        ],
        interpret=interpret,
    )

    if not sharded:
        # Single-shard backward: in-place RMW gradient accumulation.
        # Call args: 5 scalar-prefetch (0-4), featP=5, bg=6, tchk=7,
        # tfin=8, gimg=9, gtf=10, gP0=11 -> outputs gP=0, dbg=1.
        bwd_call = pl.pallas_call(
            functools.partial(
                _streamed_bwd_rmw_kernel, config=config, channels=channels,
                tiles_x=tiles_x, n_chunks=n_chunks, t_step=tps, rows=rows,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(rows // tps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec(
                        (tps, channels, 1), lambda t, *_: (t, 0, 0)
                    ),
                    pl.BlockSpec(
                        (tps, n_chunks, p), lambda t, *_: (t, 0, 0)
                    ),
                    pl.BlockSpec((tps, 1, p), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec(
                        (tps, channels, p), lambda t, *_: (t, 0, 0)
                    ),
                    pl.BlockSpec((tps, 1, p), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec(
                        (tps, channels, 1), lambda t, *_: (t, 0, 0)
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, _F, n_chunks * c), jnp.float32),
                    pltpu.VMEM((2 * dpf, _F, c), jnp.float32),
                    pltpu.VMEM((1, p), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2 * dpf,)),
                    pltpu.SemaphoreType.DMA((2 * dpf,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((_F, padded), jnp.float32),
                jax.ShapeDtypeStruct((rows, channels, 1), jnp.float32),
            ],
            input_output_aliases={11: 0},
            interpret=interpret,
        )
    else:
        bwd_call = pl.pallas_call(
            functools.partial(
                _streamed_bwd_blocks_kernel, config=config,
                channels=channels, tiles_x=tiles_x, n_chunks=n_chunks,
                rows=rows,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(rows,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec((1, n_chunks, p), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                    pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, n_chunks, _F, c), lambda t, *_: (t, 0, 0, 0)
                    ),
                    pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, _F, n_chunks * c), jnp.float32),
                    pltpu.VMEM((1, p), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((rows, n_chunks, _F, c), jnp.float32),
                jax.ShapeDtypeStruct((rows, channels, 1), jnp.float32),
            ],
            interpret=interpret,
        )
    return fwd_call, bwd_call


def _shard_rows(call, mesh, specs_in, n_outs):
    """shard_map a streamed pallas call over its leading tile-row axis:
    row-indexed operands (scalar prefetch + per-tile blocks) split over ALL
    mesh axes, the sorted feature arrays replicated, outputs row-sharded —
    the same zero-forward-traffic layout as pallas_impl's tile sharding.

    `specs_in`: sequence of "row" / "rep" tags for the call's positional
    args, in order."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    spec = PartitionSpec(tuple(mesh.axis_names))
    rep = PartitionSpec()
    return shard_map(
        call,
        mesh=mesh,
        in_specs=tuple(spec if s == "row" else rep for s in specs_in),
        out_specs=tuple([spec] * n_outs) if n_outs > 1 else spec,
        check_vma=False,
    )


def composite_streamed_batched(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Array,  # (b, c)
    config: RasterizeConfig,
    mesh=None,
) -> Array:
    """Streamed-pipeline rendering of a batch of cameras -> (b, h, w, c).

    `mesh`: optional jax.sharding.Mesh. With compaction on (the
    production default) multi-shard meshes take the SHARD-LOCAL pipeline
    (shard_local.py): each shard compacts, sorts, composites, unsorts,
    and reduces only its own tile rows, with one psum merging the
    per-gaussian gradients. Without compaction this falls back to the
    replicated-sort path: only the compositing kernels' rows shard; the
    binning sort and gradient unsort stay global.
    """
    h, w = image_shape
    ts = config.tile_size
    b, n = screen.depth.shape
    channels = screen.color.shape[-1]
    max_dup = config.max_dup

    if mesh is not None and _use_compaction(config, b, n):
        n_shards = int(np.prod(list(mesh.shape.values())))
        if n_shards > 1:
            from .shard_local import composite_shard_local

            return composite_shard_local(
                screen, image_shape, background, config, mesh
            )

    # depth/radius/valid only steer binning (non-differentiable bookkeeping,
    # like the CUDA sort): they are explicit args with zero cotangents so the
    # custom_vjp closure holds no tracers. background IS differentiable (the
    # bwd kernel computes d(bg)), so it must be an explicit arg too.
    @jax.custom_vjp
    def rasterize(xy, conic, opacity, color, bg, depth, radius, valid):
        img, _ = _raster_fwd_impl(
            xy, conic, opacity, color, bg, depth, radius, valid
        )
        return img

    def _raster_fwd_impl(xy, conic, opacity, color, bg, depth, radius, valid):
        scr = ScreenGaussians(
            xy=xy, depth=depth, conic=conic, radius=radius,
            color=color, opacity=opacity, valid=valid,
        )
        pair_sort = (
            _pair_sort_compacted if _use_compaction(config, b, n)
            else _pair_sort
        )
        (
            featP, ids_sorted, starts, tiles_x, tiles_y, total_pairs
        ) = pair_sort(scr, image_shape, config)
        featP = jax.lax.stop_gradient(featP)
        num_tiles = tiles_x * tiles_y
        rows = b * num_tiles

        cap = config.tile_capacity
        seg = starts[1:] - starts[:-1]
        counts = jnp.minimum(seg, cap)
        # Clamp each tile's window base so all n_chunks 128-row windows stay
        # inside the (barely padded) feature array; the kernels' absolute
        # [off, off+count) masking handles off >= 128 exactly (off+count <=
        # n_chunks*128 holds because count <= min(segment remainder, cap)).
        ck = config.chunk
        n_chunks = config.tile_capacity // ck + 1
        max_base = featP.shape[1] // ck - n_chunks
        base = jnp.minimum(starts[:-1] // ck, max_base)
        off = starts[:-1] - base * ck
        tile_ids = jnp.tile(jnp.arange(num_tiles, dtype=jnp.int32), b)
        bg_rows = jnp.repeat(bg, num_tiles, axis=0)[..., None]

        interpret = jax.default_backend() != "tpu"
        n_shards = 1 if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        )
        if rows % n_shards:
            raise ValueError(
                f"{rows} tile rows not divisible by mesh size {n_shards}"
            )
        fwd_call, _ = _make_streamed_composite(
            rows // n_shards, featP.shape[1], channels, tiles_x,
            config, interpret, n_shards > 1,
        )
        if n_shards > 1:
            fwd_call = _shard_rows(
                fwd_call, mesh,
                ["row"] * 4 + ["rep", "row"], 3,
            )
        img_tiles, tfin, tchk = fwd_call(
            base, off, counts, tile_ids, featP, bg_rows
        )
        res = (
            featP, ids_sorted, base, off, counts, tile_ids,
            bg_rows, tfin, tchk, tiles_x, total_pairs,
        )
        out = _tiles_to_image(img_tiles, b, tiles_x, tiles_y, channels, ts)
        return out[:, :h, :w], res

    def raster_fwd(xy, conic, opacity, color, bg, depth, radius, valid):
        img, res = _raster_fwd_impl(
            xy, conic, opacity, color, bg, depth, radius, valid
        )
        return img, (res, depth, radius, valid)

    def raster_bwd(res_all, g_img):
        res, depth, radius, valid = res_all
        (
            featP, ids_sorted, base, off, counts, tile_ids,
            bg_rows, tfin, tchk, tiles_x, total_pairs,
        ) = res
        tiles_y = -(-h // ts)
        num_tiles = tiles_x * tiles_y
        rows = b * num_tiles
        p = ts * ts

        # Pad the cotangent image back to the tile grid layout.
        g_pad = jnp.zeros((b, tiles_y * ts, tiles_x * ts, channels),
                          g_img.dtype)
        g_pad = g_pad.at[:, :h, :w].set(g_img)
        g_tiles = g_pad.reshape(b, tiles_y, ts, tiles_x, ts, channels)
        g_tiles = g_tiles.transpose(0, 1, 3, 5, 2, 4).reshape(
            rows, channels, p
        )

        interpret = jax.default_backend() != "tpu"
        padded = featP.shape[1]
        ck = config.chunk
        n_win = padded // ck
        n_shards = 1 if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        )
        _, bwd_call = _make_streamed_composite(
            rows // n_shards, padded, channels, tiles_x, config,
            interpret, n_shards > 1,
        )
        # Chunks the forward actually processed per tile (its early-exit
        # count): chunk i was processed iff its transmittance checkpoint was
        # written (checkpoints are written pre-compositing and transmittance
        # is strictly positive, so processed <=> max > 0, monotone in i).
        n_chunks = config.tile_capacity // config.chunk + 1
        nproc = jnp.sum(
            (jnp.max(tchk, axis=2) > 0.0).astype(jnp.int32), axis=1
        )
        gtf = jnp.zeros((rows, 1, p), jnp.float32)
        if n_shards == 1:
            dP, dbg = bwd_call(
                base, off, counts, tile_ids, nproc, featP,
                bg_rows, tchk, tfin, g_tiles, gtf,
                jnp.zeros((_F, padded), jnp.float32),
            )
        else:
            sharded = _shard_rows(
                bwd_call, mesh,
                ["row"] * 5 + ["rep"] + ["row"] * 5, 2,
            )
            dblk, dbg = sharded(
                base, off, counts, tile_ids, nproc, featP,
                bg_rows, tchk, tfin, g_tiles, gtf,
            )
            # Merge the per-(tile, chunk) gradient blocks into sorted order:
            # adjacent tiles sharing a boundary window accumulate via
            # scatter-add (~rows * n_chunks block indices — negligible next
            # to a row scatter).
            win = (
                base[:, None]
                + jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            accP = jnp.zeros((n_win, _F, ck), jnp.float32)
            accP = accP.at[win].add(
                dblk.reshape(rows * n_chunks, _F, ck)
            )
            dP = accP.transpose(1, 0, 2).reshape(_F, padded)

        # Unsort: ONE sort keyed on carried pair ids restores original pair
        # order. The first total_pairs sorted rows are exactly the real
        # pairs (pad rows carry key INT32_MAX and sit after every real
        # row).
        total = total_pairs
        n_feat = 6 + channels
        cols = [dP[k, :total] for k in range(n_feat)]
        unsorted = jax.lax.sort(
            (ids_sorted,) + tuple(cols),
            # Real pair ids are unique; compacted-path pad rows share
            # INT32_MAX but carry identical all-zero payloads, so the
            # unstable sort stays deterministic in value.
            num_keys=1, is_stable=False,
        )
        if _use_compaction(config, b, n):
            # Variable surviving pairs per gaussian: banded id-driven
            # reduce instead of the fixed reshape-sum (compact.py).
            ids_u = unsorted[0]
            ids_bits = jax.lax.bitcast_convert_type(ids_u, jnp.float32)
            rows = [ids_bits] + list(unsorted[1:])
            rows += [jnp.zeros((total,), jnp.float32)] * (16 - len(rows))
            plane = jnp.stack(rows, axis=0)  # (16, budget)
            red = banded_dup_reduce(plane, ids_u, b * n, max_dup)
            d = jnp.stack(
                [red[1 + i] for i in range(n_feat)], axis=-1
            ).reshape(b, n, n_feat)
        else:
            d = jnp.stack(unsorted[1:], axis=-1)  # (total, 6+ch)
            d = d.reshape(b, n, max_dup, n_feat).sum(axis=2)
        d_xy = d[..., 0:2]
        d_conic = d[..., 2:5]
        d_op = d[..., 5]
        d_color = d[..., 6:]
        d_bg = dbg.reshape(b, num_tiles, channels).sum(axis=1)
        return (
            d_xy, d_conic, d_op, d_color, d_bg,
            jnp.zeros_like(depth), jnp.zeros_like(radius), None,
        )

    rasterize.defvjp(raster_fwd, raster_bwd)
    return rasterize(
        screen.xy, screen.conic, screen.opacity, screen.color, background,
        screen.depth, screen.radius, screen.valid,
    )


def _tiles_to_image(img_tiles, b, tiles_x, tiles_y, channels, ts):
    out = img_tiles.reshape(b, tiles_y, tiles_x, channels, ts, ts)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(
        b, tiles_y * ts, tiles_x * ts, channels
    )
