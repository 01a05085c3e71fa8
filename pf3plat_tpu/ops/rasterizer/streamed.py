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
     feature gradients, and accumulates them into a sorted-order gradient
     array with read-modify-write DMAs (correct because TPU Pallas grid
     steps execute sequentially on a core — adjacent tiles' boundary
     chunks never race);
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
# DMA (see anchored.py's alignment note: sub-8-row windows fault the DMA
# engine on unaligned HBM offsets).
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

    slot = jnp.arange(max_dup, dtype=jnp.int32)
    dy = slot // side
    dx = slot % side
    in_box = (dy < bounds.th[..., None]) & (dx < bounds.tw[..., None])
    tile = (bounds.ty0[..., None] + dy) * tiles_x + (bounds.tx0[..., None] + dx)
    b_off = (jnp.arange(b, dtype=jnp.int32) * num_tiles)[:, None, None]
    tile_key = jnp.where(in_box, tile + b_off, _INT32_MAX).reshape(total_pairs)
    ids = jnp.arange(total_pairs, dtype=jnp.int32)  # unique PAIR ids

    # (b, n) feature channels broadcast to pairs lazily via reshape tricks:
    # build (b, n, 1) -> broadcast (b, n, dup) -> flat. XLA fuses these
    # broadcasts into the sort's operand materialization.
    def pairify(x):  # (b, n) -> (total_pairs,)
        return jnp.broadcast_to(x[..., None], (b, n, max_dup)).reshape(
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
        sorted_ops = jax.lax.sort(
            (fused, ids) + tuple(feats), num_keys=1
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
            (tile_key, depth_keys, ids) + tuple(feats), num_keys=2
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

    # Stack features as (F, padded): chunk c's window is rows [:, c*128 +128)
    # — every DMA window 128-lane aligned; max window must stay in bounds.
    n_chunks = config.tile_capacity // config.chunk + 1
    padded = -(-total_pairs // 128) * 128 + n_chunks * 128
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
    feat_hbm,        # (_F, padded) ANY
    dfeat_init_hbm,  # (_F, padded) ANY (aliased to dfeat output)
    bg_ref,          # (1, ch, 1)
    tchk_ref,        # (1, n_chunks, P)
    tfin_ref,        # (1, 1, P)
    gimg_ref,        # (1, ch, P)
    gtf_ref,         # (1, 1, P)
    dfeat_hbm,       # (_F, padded) ANY out (aliased)
    dbg_ref,         # (1, ch, 1) out
    buf,             # VMEM (2, _F, 128)
    rmw,             # VMEM (_F, 128)
    tail,            # VMEM (1, P)
    sem,             # DMA sems (2,)
    rmw_sem,         # DMA sem (1,)
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

    l_incl = _tri_incl(c, dtype)
    u_suf = _tri_suffix(c, dtype)
    lane_col = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    def dma(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((base + i) * c, c)],
            buf.at[slot],
            sem.at[slot],
        )

    # Highest chunk index the forward actually processed, walked in reverse.
    dma(n_chunks - 1, (n_chunks - 1) % 2).start()

    def body(k, _):
        i = n_chunks - 1 - k
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            dma(i - 1, jax.lax.rem(i - 1, 2)).start()

        dma(i, slot).wait()

        processed = (i * c < off + count) & (
            jnp.max(tchk_ref[0, i, :]) > 0.0
        )

        @pl.when(processed)
        def _():
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

            # Read-modify-write into the sorted-order gradient array.
            # Boundary windows shared with the previous/next tile accumulate
            # correctly because grid steps run sequentially on the core.
            cin = pltpu.make_async_copy(
                dfeat_hbm.at[:, pl.ds((base + i) * c, c)], rmw, rmw_sem.at[0]
            )
            cin.start()
            cin.wait()
            rmw[...] += d_chunk
            cout = pltpu.make_async_copy(
                rmw, dfeat_hbm.at[:, pl.ds((base + i) * c, c)], rmw_sem.at[0]
            )
            cout.start()
            cout.wait()

            tail[...] += jnp.sum(m, axis=0, keepdims=True)

        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())


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
            num_scalar_prefetch=4,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_chunks, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _F, 128), jnp.float32),
                pltpu.VMEM((_F, 128), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((_F, padded), jnp.float32),
            jax.ShapeDtypeStruct((rows, channels, 1), jnp.float32),
        ],
        input_output_aliases={5: 0},  # dfeat_init (after 4 prefetch) -> dfeat
        interpret=interpret,
    )
    return fwd_call, bwd_call


def composite_streamed_batched(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Array,  # (b, c)
    config: RasterizeConfig,
) -> Array:
    """Streamed-pipeline rendering of a batch of cameras -> (b, h, w, c)."""
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
        base = starts[:-1] // 128
        off = starts[:-1] - base * 128
        tile_ids = jnp.tile(jnp.arange(num_tiles, dtype=jnp.int32), b)
        bg_rows = jnp.repeat(bg, num_tiles, axis=0)[..., None]

        interpret = jax.default_backend() != "tpu"
        fwd_call, bwd_call = _make_streamed_composite(
            rows, feat_sorted.shape[1], channels, tiles_x, config, interpret
        )
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
        fwd_call, bwd_call = _make_streamed_composite(
            rows, feat_sorted.shape[1], channels, tiles_x, config, interpret
        )
        dfeat_init = jnp.zeros_like(feat_sorted)
        dfeat_sorted, dbg = bwd_call(
            base, off, counts, tile_ids, feat_sorted, dfeat_init,
            bg_rows, tchk, tfin, g_tiles,
            jnp.zeros((rows, 1, p), jnp.float32),
        )

        # Unsort: ONE sort keyed on carried pair ids restores original pair
        # order; a reshape-sum over dup slots gives per-gaussian grads.
        total = total_pairs
        cols = [dfeat_sorted[k, :total] for k in range(6 + channels)]
        unsorted = jax.lax.sort(
            (ids_sorted,) + tuple(cols), num_keys=1
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
