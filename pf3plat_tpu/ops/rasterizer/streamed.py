"""Streamed rasterizer pipeline — sort-carried features, zero row gathers.

Round-2 trace attribution of the default ("pallas") pipeline on the bench
scene (29.9 ms device fwd+bwd) showed 16.5 ms — 55% — spent in THREE
row-addressed XLA passes around the compositing kernel:

    table gather   feat_flat[flat_idx]        (524288 x 9 f32)   6.2 ms
    its VJP        scatter-add to (n, 9)                          6.6 ms
    ids gather     ids_sorted[pair_pos]       (524288 x 1 s32)   3.7 ms

TPU gathers/scatters are row-latency-bound (~85-140 M rows/s measured);
`lax.sort` by contrast moves the same rows ~10x faster. This pipeline
therefore carries the 9 feature channels THROUGH the binning sort as sort
payload operands, after which every downstream access is **contiguous**:

  1. projection (unchanged, `project.py`);
  2. ONE `lax.sort` over the (batch*tile | quantized-depth) fused key,
     carrying [pair_id, x, y, conic(3), opacity, color(ch)] — the sorted
     feature array IS the compositing input, no dense per-tile table;
  3. per-tile segment boundaries via the same vectorized binary search as
     `binning.py`;
  4. the Pallas forward kernel walks tile t's segment
     [starts[t], starts[t]+count) directly in the sorted array with
     chunk-granular async DMAs from HBM (128-aligned windows + row masks),
     double-buffered, early-exiting on transmittance saturation — the CUDA
     rasterizer's "global sorted list + per-tile ranges" design, with DMA
     replacing shared-memory staging;
  5. the backward kernel re-DMAs the same windows, computes per-chunk
     feature gradients, and EMITS them as per-(tile, chunk) output blocks
     (pure writes — no read-modify-write DMA serialization, and no
     ordering dependency between grid steps); one XLA block scatter-add
     over the ~tiles*n_chunks 128-row windows merges the shared boundary
     chunks into the sorted-order gradient array;
  6. ONE `lax.sort` keyed on the carried pair ids restores original pair
     order, and a reshape-sum over the max_dup axis yields per-gaussian
     gradients — replacing the scatter-add entirely.

Same capacity/ordering semantics as the default pipeline (count =
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

from .binning import tile_bounds, _depth_sort_key, _INT32_MAX
from .pallas_impl import _tri_incl, _tri_suffix
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array

# Feature rows in the sorted array: [x, y, ca, cb, cc, op, color...] padded
# to 16 sublanes so every (F, 128) chunk window is a 512-byte-aligned 8 KiB
# DMA (measured on-chip: sub-8-row windows make the kernel's HBM RMW/read
# offsets 512-byte-UNaligned, which faults the DMA engine — worker crash).
_F = 16


def _pair_sort(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
):
    """Expand gaussians into (tile, depth)-sorted pairs CARRYING features.

    Returns (feat_sorted (F, padded), ids_sorted (padded,), starts (bT+1,),
    tiles_x, tiles_y, total_pairs). Identical key construction (and thus
    identical compositing order/capacity semantics) to
    `binning.bin_gaussians_batched`.
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

    # Stack features as (F, padded): chunk c's window is rows [:, c*128+128)
    # — every DMA window 128-lane aligned. Rows are padded only up to the
    # next 128 multiple (none at all for 128-aligned pair counts, i.e. every
    # power-of-two image); windows near the array end are handled by
    # CLAMPING each tile's base so [base*128, (base+n_chunks)*128) stays in
    # bounds — the kernel's absolute [off, off+count) masking is exact for
    # any off, so a clamped window composites identically.
    n_chunks = config.tile_capacity // config.chunk + 1
    padded = max(-(-total_pairs // 128), n_chunks) * 128
    if padded == total_pairs:
        pad_cols = list(feats_sorted)
    else:
        pad_cols = [
            jnp.pad(f, (0, padded - total_pairs)) for f in feats_sorted
        ]
    pad_cols += [jnp.zeros((padded,), pad_cols[0].dtype)] * (
        _F - len(pad_cols)
    )
    feat_sorted = jnp.stack(pad_cols, axis=0)  # (_F, padded)
    return (
        feat_sorted, ids_sorted, starts, tiles_x, tiles_y, total_pairs
    )


def _chunk_alpha_cols(data, px, py, config):
    """(F, C) chunk data -> alpha (C, P) block + residuals (cf.
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


def _streamed_fwd_kernel(
    base_ref,        # scalar prefetch (rows,): 128-aligned chunk base
    off_ref,         # scalar prefetch (rows,): start offset within window
    counts_ref,      # scalar prefetch (rows,)
    tile_ids_ref,    # scalar prefetch (rows,)
    feat_hbm,        # (_F, padded) ANY
    bg_ref,          # (1, ch, 1) VMEM
    img_ref,         # (1, ch, P) out
    tfin_ref,        # (1, 1, P) out
    tchk_ref,        # (1, n_chunks, P) out
    buf,             # VMEM (2, _F, 128) double buffer
    accum,           # VMEM (ch, P)
    tcar,            # VMEM (1, P)
    sem,             # DMA sem (2,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
):
    c = config.chunk  # == 128
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32
    r = pl.program_id(0)

    t_img = tile_ids_ref[r]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    base = base_ref[r]
    off = off_ref[r]
    count = counts_ref[r]

    accum[...] = jnp.zeros((channels, p), dtype)
    tcar[...] = jnp.ones((1, p), dtype)
    tchk_ref[...] = jnp.zeros((1, n_chunks, p), dtype)

    l_incl = _tri_incl(c, dtype)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    def dma(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((base + i) * c, c)],
            buf.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()

    def chunk_body(i):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        data = buf[slot]                       # (_F, 128)
        alpha, _, _, _, _ = _chunk_alpha_cols(data, px, py, config)
        # Mask rows outside this tile's segment [off, off+count).
        j = i * c + lane_col                   # global window position
        seg = (j >= off) & (j < off + count)
        alpha = jnp.where(seg, alpha, 0.0)
        color = data[6 : 6 + channels, :]

        tchk_ref[0, i, :] = tcar[0, :]
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

    def cond(i):
        return (i * c < off + count) & (
            jnp.max(tcar[...]) >= config.transmittance_min
        )

    def body(i):
        chunk_body(i)
        return i + 1

    i_final = jax.lax.while_loop(lambda i: (i < n_chunks) & cond(i), body, 0)

    # Early exit leaves chunk i_final's prefetch DMA in flight (started by
    # body(i_final - 1) or the warm-up start) — drain it, or the kernel ends
    # with an outstanding DMA and the next grid step faults.
    @pl.when(i_final < n_chunks)
    def _():
        dma(i_final, jax.lax.rem(i_final, 2)).wait()

    img_ref[0] = accum[...] + bg_ref[0] * tcar[...]
    tfin_ref[0] = tcar[...]


def _streamed_bwd_kernel(
    base_ref,
    off_ref,
    counts_ref,
    tile_ids_ref,
    nproc_ref,       # scalar prefetch (rows,): chunks the fwd processed
    feat_hbm,        # (_F, padded) ANY
    bg_ref,          # (1, ch, 1)
    tchk_ref,        # (1, n_chunks, P)
    tfin_ref,        # (1, 1, P)
    gimg_ref,        # (1, ch, P)
    gtf_ref,         # (1, 1, P)
    dblk_ref,        # (1, n_chunks, _F, 128) out: per-chunk gradient blocks
    dbg_ref,         # (1, ch, 1) out
    buf,             # VMEM (2, _F, 128)
    tail,            # VMEM (1, P)
    sem,             # DMA sems (2,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
):
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = jnp.float32
    r = pl.program_id(0)

    t_img = tile_ids_ref[r]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    base = base_ref[r]
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

    def dma(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((base + i) * c, c)],
            buf.at[slot],
            sem.at[slot],
        )

    # Walk ONLY the chunks the forward actually processed (its early-exit
    # count, recovered from the transmittance checkpoints on the XLA side),
    # in reverse — the all-n_chunks walk cost ~3 ms of dead DMA waits on the
    # bench scene (fwd averages ~1/3 of the capacity before saturating).
    n_proc = nproc_ref[r]

    @pl.when(n_proc > 0)
    def _():
        dma(n_proc - 1, jax.lax.rem(n_proc - 1, 2)).start()

    def body(k, _):
        i = n_proc - 1 - k
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            dma(i - 1, jax.lax.rem(i - 1, 2)).start()

        dma(i, slot).wait()

        data = buf[slot]
        alpha, dx, dy, gexp, unclamped = _chunk_alpha_cols(
            data, px, py, config
        )
        j = i * c + lane_col
        seg = (j >= off) & (j < off + count)
        alpha = jnp.where(seg, alpha, 0.0)
        unclamped = unclamped & seg
        color = data[6 : 6 + channels, :]

        t_start = tchk_ref[0, i, :][None, :]
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
        ) + tail[...]

        dalpha = jnp.where(alive, t_before * cg - suffix / one_m, 0.0)
        dalpha = jnp.where(unclamped, dalpha, 0.0)

        op = data[5, :][:, None]
        dpow = alpha * dalpha
        ca = data[2, :][:, None]
        cb = data[3, :][:, None]
        cc = data[4, :][:, None]

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
        zeros = jnp.zeros((_F - 6 - channels, c), jnp.float32)
        d_chunk = jnp.concatenate(
            [d_x0, d_y0, d_ca, d_cb, d_cc, d_op, d_col, zeros], axis=0
        )  # (_F, C)

        # Pure block write (no RMW): boundary windows shared with
        # adjacent tiles are merged by the XLA scatter-add outside.
        dblk_ref[0, i] = d_chunk

        tail[...] += jnp.sum(m, axis=0, keepdims=True)

        return ()

    jax.lax.fori_loop(0, n_proc, body, ())


@functools.lru_cache(maxsize=32)
def _make_streamed_composite(
    rows: int,
    padded: int,
    channels: int,
    tiles_x: int,
    config: RasterizeConfig,
    interpret: bool,
):
    if config.chunk != 128:
        raise ValueError(
            "the streamed pipeline requires chunk == 128 (DMA window "
            f"granularity); got {config.chunk}"
        )
    if config.tile_capacity % config.chunk != 0:
        raise ValueError(
            "the streamed pipeline requires tile_capacity to be a multiple "
            f"of chunk (128): a capacity like {config.tile_capacity} would "
            "silently composite fewer gaussians than min(segment, capacity) "
            "whenever a segment's 128-aligned window cannot cover both the "
            "start offset and the full capacity"
        )
    n_chunks = config.tile_capacity // config.chunk + 1
    p = config.tile_size**2

    fwd_call = pl.pallas_call(
        functools.partial(
            _streamed_fwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_chunks, p), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _F, 128), jnp.float32),
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

    bwd_call = pl.pallas_call(
        functools.partial(
            _streamed_bwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks,
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
                    (1, n_chunks, _F, 128), lambda t, *_: (t, 0, 0, 0)
                ),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _F, 128), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, n_chunks, _F, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, channels, 1), jnp.float32),
        ],
        interpret=interpret,
    )
    return fwd_call, bwd_call


def _shard_rows(call, mesh, n_row_args, n_outs):
    """shard_map a streamed pallas call over its leading tile-row axis:
    row-indexed operands (scalar prefetch + per-tile blocks) split over ALL
    mesh axes, the sorted feature array replicated, outputs row-sharded —
    the same zero-forward-traffic layout as pallas_impl's tile sharding."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    spec = PartitionSpec(tuple(mesh.axis_names))
    rep = PartitionSpec()
    return shard_map(
        call,
        mesh=mesh,
        in_specs=tuple(
            [spec] * n_row_args[0] + [rep] + [spec] * n_row_args[1]
        ),
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

    `mesh`: optional jax.sharding.Mesh — shards the compositing kernels'
    (batch * tiles) rows over all mesh axes; the binning sort and the
    gradient unsort stay global (replicated), so the only backward
    collective is XLA's reduction of the sharded gradient blocks.
    """
    h, w = image_shape
    ts = config.tile_size
    b, n = screen.depth.shape
    channels = screen.color.shape[-1]
    max_dup = config.max_dup

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
        (
            feat_sorted, ids_sorted, starts, tiles_x, tiles_y, total_pairs
        ) = _pair_sort(scr, image_shape, config)
        feat_sorted = jax.lax.stop_gradient(feat_sorted)
        num_tiles = tiles_x * tiles_y
        rows = b * num_tiles

        cap = config.tile_capacity
        seg = starts[1:] - starts[:-1]
        counts = jnp.minimum(seg, cap)
        # Clamp each tile's window base so all n_chunks 128-row windows stay
        # inside the (barely padded) feature array; the kernels' absolute
        # [off, off+count) masking handles off >= 128 exactly (off+count <=
        # n_chunks*128 holds because count <= min(segment remainder, cap)).
        n_chunks = config.tile_capacity // config.chunk + 1
        max_base = feat_sorted.shape[1] // 128 - n_chunks
        base = jnp.minimum(starts[:-1] // 128, max_base)
        off = starts[:-1] - base * 128
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
        fwd_call, bwd_call = _make_streamed_composite(
            rows // n_shards, feat_sorted.shape[1], channels, tiles_x,
            config, interpret,
        )
        if n_shards > 1:
            fwd_call = _shard_rows(fwd_call, mesh, (4, 1), 3)
        img_tiles, tfin, tchk = fwd_call(
            base, off, counts, tile_ids, feat_sorted, bg_rows
        )
        res = (
            feat_sorted, ids_sorted, base, off, counts, tile_ids,
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
            feat_sorted, ids_sorted, base, off, counts, tile_ids,
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
        padded = feat_sorted.shape[1]
        n_shards = 1 if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        )
        fwd_call, bwd_call = _make_streamed_composite(
            rows // n_shards, padded, channels, tiles_x, config, interpret
        )
        if n_shards > 1:
            bwd_call = _shard_rows(bwd_call, mesh, (5, 5), 2)
        # Chunks the forward actually processed per tile (its early-exit
        # count): chunk i was processed iff its transmittance checkpoint was
        # written (checkpoints are written pre-compositing and transmittance
        # is strictly positive, so processed <=> max > 0, monotone in i).
        nproc = jnp.sum(
            (jnp.max(tchk, axis=2) > 0.0).astype(jnp.int32), axis=1
        )
        dblk, dbg = bwd_call(
            base, off, counts, tile_ids, nproc, feat_sorted,
            bg_rows, tchk, tfin, g_tiles,
            jnp.zeros((rows, 1, p), jnp.float32),
        )
        # Merge the per-(tile, chunk) gradient blocks into sorted order:
        # adjacent tiles sharing a boundary window accumulate via scatter-add
        # (~rows * n_chunks block indices — negligible next to a row scatter).
        n_chunks = config.tile_capacity // config.chunk + 1
        n_win = padded // 128
        win = (base[:, None] + jnp.arange(n_chunks, dtype=jnp.int32)[None, :])
        acc = jnp.zeros((n_win, _F, 128), jnp.float32)
        acc = acc.at[win.reshape(-1)].add(
            dblk.reshape(rows * n_chunks, _F, 128)
        )
        dfeat_sorted = acc.transpose(1, 0, 2).reshape(_F, padded)

        # Unsort: ONE sort keyed on carried pair ids restores original pair
        # order; a reshape-sum over dup slots gives per-gaussian grads.
        # The first total_pairs sorted rows are exactly the real pairs (pad
        # rows carry key INT32_MAX and sit stably after every real row).
        total = total_pairs
        cols = [dfeat_sorted[k, :total] for k in range(6 + channels)]
        unsorted = jax.lax.sort(
            (ids_sorted,) + tuple(cols),
            num_keys=1, is_stable=False,  # pair ids are unique
        )
        d = jnp.stack(unsorted[1:], axis=-1)  # (total, 6+ch) in pair order
        d = d.reshape(b, n, max_dup, 6 + channels).sum(axis=2)
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
