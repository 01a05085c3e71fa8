"""Pallas TPU kernels for tile compositing — forward + analytic backward.

This is the hand-scheduled hot path replacing the reference's CUDA
`renderCUDA` forward/backward kernels. The surrounding stages (projection,
binning, per-tile feature gather) stay in differentiable XLA; the custom_vjp
boundary is exactly the dense-table compositing:

    (table, counts, background) -> (image_tiles, t_final)

so the backward kernel emits d(table)/d(background) and XLA's autodiff
handles the scatter back to per-gaussian parameters through the gather.

Layout (TPU-first): everything inside the kernel keeps *pixels on lanes*:
  table      (tiles, F, cap)   F = [x, y, conic_a, conic_b, conic_c,
                                    opacity, color...]; cap on lanes
  image      (tiles, ch, P)    P = tile_size^2 pixels on lanes
Per chunk of C gaussians the kernel computes a (C, P) alpha block on the
VPU, turns the front-to-back transmittance recurrence into a triangular
(C, C) x (C, P) matmul on the MXU (exclusive cumsum of log(1-alpha)), and
accumulates color with a (ch, C) x (C, P) matmul. The backward replays
chunks in reverse using per-chunk transmittance checkpoints and a running
suffix accumulator — the same structure as the CUDA backward, but with the
per-gaussian atomics replaced by lane reductions.

Chunks beyond a tile's gaussian count are skipped via scalar-prefetched
counts, so sparse tiles cost almost nothing (the CUDA kernel gets this for
free from variable-length lists; here it is explicit predication).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BinnedTiles
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array


def _tri_incl(c: int, dtype) -> Array:
    """L[i, j] = 1 if i >= j (inclusive-prefix when applied as L @ s)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row >= col).astype(dtype)


def _tri_suffix(c: int, dtype) -> Array:
    """U[i, j] = 1 if j > i (strict-suffix when applied as U @ m)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (col > row).astype(dtype)


def _chunk_slices(table_ref, start, c, channels, slot_major):
    """One chunk's (data, color, per-feature column accessor).

    data is (F, C) for the f_major table layout, (C, F_pad) for slot_major;
    col(k) is always (C, 1). The single place layout indexing lives.
    """
    if slot_major:
        data = table_ref[0, pl.ds(start, c), :]
        return data, data[:, 6 : 6 + channels], (
            lambda k: data[:, k][:, None]
        )
    data = table_ref[0, :, pl.ds(start, c)]
    return data, data[6 : 6 + channels, :], (
        lambda k: data[k, :][:, None]
    )


def _chunk_alpha(col, px, py, config):
    """Alpha block (C, P) + residuals from one chunk's feature columns."""
    x0 = col(0)
    y0 = col(1)
    ca = col(2)
    cb = col(3)
    cc = col(4)
    op = col(5)
    dx = px - x0                  # (C, P)
    dy = py - y0
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * g
    alpha = jnp.minimum(alpha_raw, config.alpha_clamp)
    keep = (power <= 0.0) & (alpha >= config.alpha_min)
    alpha = jnp.where(keep, alpha, 0.0)
    unclamped = keep & (alpha_raw < config.alpha_clamp)
    return alpha, dx, dy, g, unclamped


def _fwd_kernel(
    counts_ref,      # scalar prefetch (rows,)
    tile_ids_ref,    # scalar prefetch (rows,) image-tile index per table row
    table_ref,       # (1, F, cap) VMEM
    bg_ref,          # (1, ch, 1) VMEM per-row background
    img_ref,         # (1, ch, P) VMEM out
    tfin_ref,        # (1, 1, P) VMEM out
    tchk_ref,        # (1, n_chunks, P) VMEM out
    accum,           # (ch, P) scratch
    tcar,            # (1, P) scratch
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
):
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = table_ref.dtype

    # The image-tile index comes from prefetched data, not program_id, so the
    # grid can be an arbitrary row slice — this is what lets shard_map split
    # the (batch * tiles) rows across chips (each shard's ids stay global).
    t_img = tile_ids_ref[pl.program_id(0)]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5  # (1, P)
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    accum[...] = jnp.zeros((channels, p), dtype)
    tcar[...] = jnp.ones((1, p), dtype)
    # Zero-init: chunks never processed (early exit / beyond count) leave
    # T_start = 0, which the backward reads as fully-saturated -> zero grads.
    tchk_ref[...] = jnp.zeros((1, n_chunks, p), dtype)

    count = counts_ref[pl.program_id(0)]
    l_incl = _tri_incl(c, dtype)

    slot_major = config.table_layout == "slot_major"

    # contract over C: slot_major color is (C, ch), f_major (ch, C)
    color_dims = (
        (((0,), (0,)), ((), ())) if slot_major else (((1,), (0,)), ((), ()))
    )

    def chunk_body(i):
        start = pl.multiple_of(i * c, c)
        _, color, col = _chunk_slices(table_ref, start, c, channels, slot_major)
        alpha, _, _, _, _ = _chunk_alpha(col, px, py, config)

        tchk_ref[0, i, :] = tcar[0, :]
        s = jnp.log1p(-alpha)                    # (C, P)
        incl = jax.lax.dot_general(
            l_incl, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_after = tcar[...] * jnp.exp(incl)      # (C, P) via broadcast
        alive = t_after >= config.transmittance_min
        one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
        t_before = t_after / one_m               # exp(incl - s) without the exp
        w = jnp.where(alive, t_before * alpha, 0.0)  # (C, P)
        accum[...] += jax.lax.dot_general(
            color, w, color_dims,
            preferred_element_type=jnp.float32,
        )
        # Frozen-at-first-dead transmittance without another exp: the LAST
        # alive row's t_after — the smallest among the alive prefix
        # (t_after decreases monotonically along C).
        any_alive = jnp.any(alive, axis=0, keepdims=True)
        t_last = jnp.min(
            jnp.where(alive, t_after, jnp.inf), axis=0, keepdims=True
        )
        tcar[...] = jnp.where(any_alive, t_last, tcar[...])

    def cond(i):
        return (i * c < count) & (jnp.max(tcar[...]) >= config.transmittance_min)

    def body(i):
        chunk_body(i)
        return i + 1

    jax.lax.while_loop(lambda i: (i < n_chunks) & cond(i), body, 0)

    img_ref[0] = accum[...] + bg_ref[0] * tcar[...]
    tfin_ref[0] = tcar[...]


def _bwd_kernel(
    counts_ref,      # scalar prefetch (rows,)
    tile_ids_ref,    # scalar prefetch (rows,)
    table_ref,       # (1, F, cap)
    bg_ref,          # (1, ch, 1) per-row background
    tchk_ref,        # (1, n_chunks, P)
    tfin_ref,        # (1, 1, P)
    gimg_ref,        # (1, ch, P) cotangent of image
    gtf_ref,         # (1, 1, P) cotangent of t_final
    dtab_ref,        # (1, F, cap) out
    dbg_ref,         # (1, ch, 1) out per-row
    tail,            # (1, P) scratch: suffix sum of w_j (c_j . g) + T_fin*(...)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    n_chunks: int,
):
    c = config.chunk
    ts = config.tile_size
    p = ts * ts
    dtype = table_ref.dtype

    t_img = tile_ids_ref[pl.program_id(0)]
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    dtab_ref[...] = jnp.zeros(dtab_ref.shape, dtab_ref.dtype)
    g = gimg_ref[0]                 # (ch, P)
    # d(out)/d(T_final) = bg; plus the direct t_final cotangent.
    gt = jnp.sum(bg_ref[0] * g, axis=0, keepdims=True) + gtf_ref[0]  # (1, P)
    dbg_ref[0] = jnp.sum(g * tfin_ref[0], axis=1, keepdims=True)
    tail[...] = tfin_ref[0] * gt

    count = counts_ref[pl.program_id(0)]
    l_incl = _tri_incl(c, dtype)
    u_suf = _tri_suffix(c, dtype)
    slot_major = config.table_layout == "slot_major"

    def body(k, _):
        i = n_chunks - 1 - k

        # Skip chunks beyond the tile's count AND chunks the forward never
        # reached (early exit leaves their T checkpoint at the zero init).
        @pl.when((i * c < count) & (jnp.max(tchk_ref[0, i, :]) > 0.0))
        def _():
            start = pl.multiple_of(i * c, c)
            _, color, col = _chunk_slices(
                table_ref, start, c, channels, slot_major
            )
            # -> (C, P): slot_major (C,ch)x(ch,P); f_major (ch,C)^T x (ch,P)
            cg_dims = (
                (((1,), (0,)), ((), ()))
                if slot_major
                else (((0,), (0,)), ((), ()))
            )
            alpha, dx, dy, gexp, unclamped = _chunk_alpha(col, px, py, config)

            t_start = tchk_ref[0, i, :][None, :]     # (1, P)
            s = jnp.log1p(-alpha)
            incl = jax.lax.dot_general(
                l_incl, s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_after = t_start * jnp.exp(incl)
            alive = t_after >= config.transmittance_min
            one_m_t = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
            t_before = t_after / one_m_t
            w = jnp.where(alive, t_before * alpha, 0.0)

            # cg[c_i, p] = color_i . g_p
            cg = jax.lax.dot_general(
                color, g, cg_dims,
                preferred_element_type=jnp.float32,
            )  # (C, P)
            m = w * cg
            suffix = jax.lax.dot_general(
                u_suf, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + tail[...]

            one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
            dalpha = jnp.where(
                alive, t_before * cg - suffix / one_m, 0.0
            )
            dalpha = jnp.where(unclamped, dalpha, 0.0)

            op = col(5)
            dpow = alpha * dalpha
            ca = col(2)
            cb = col(3)
            cc = col(4)

            d_op = jnp.sum(gexp * dalpha, axis=1)            # (C,)
            d_ca = jnp.sum(-0.5 * dx * dx * dpow, axis=1)
            d_cb = jnp.sum(-dx * dy * dpow, axis=1)
            d_cc = jnp.sum(-0.5 * dy * dy * dpow, axis=1)
            d_x0 = jnp.sum((ca * dx + cb * dy) * dpow, axis=1)
            d_y0 = jnp.sum((cc * dy + cb * dx) * dpow, axis=1)

            sl = pl.ds(start, c)
            if slot_major:
                d_col = jax.lax.dot_general(
                    w, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, ch)
                f_pad = dtab_ref.shape[2]
                block = jnp.concatenate(
                    [
                        d_x0[:, None], d_y0[:, None], d_ca[:, None],
                        d_cb[:, None], d_cc[:, None], d_op[:, None], d_col,
                        jnp.zeros((c, f_pad - 6 - channels), d_col.dtype),
                    ],
                    axis=1,
                )  # (C, F_pad)
                dtab_ref[0, sl, :] = block
            else:
                d_col = jax.lax.dot_general(
                    g, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (ch, C)
                dtab_ref[0, 0, sl] = d_x0
                dtab_ref[0, 1, sl] = d_y0
                dtab_ref[0, 2, sl] = d_ca
                dtab_ref[0, 3, sl] = d_cb
                dtab_ref[0, 4, sl] = d_cc
                dtab_ref[0, 5, sl] = d_op
                dtab_ref[0, 6 : 6 + channels, sl] = d_col

            tail[...] += jnp.sum(m, axis=0, keepdims=True)

        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())


@functools.lru_cache(maxsize=32)
def _make_composite(
    rows: int,
    f_dim: int,
    channels: int,
    tiles_x: int,
    config: RasterizeConfig,
    interpret: bool,
):
    """Row-oriented compositor: (rows, F, cap) tables -> (rows, ch, P) tiles.

    Rows are (batch * image-tile) entries in any order/slice; each row's
    image-tile index and background arrive as data (scalar prefetch /
    per-row input), so a mesh shard holding a contiguous row slice runs the
    identical kernel — the basis of tile-axis sharding (SURVEY §2.4).
    """
    cap = config.tile_capacity
    n_chunks = cap // config.chunk
    p = config.tile_size**2
    if not interpret and config.chunk % 128 != 0:
        raise ValueError(
            "RasterizeConfig.chunk must be a multiple of 128 for the compiled "
            f"TPU pallas path (lane alignment); got {config.chunk}. "
            "Use chunk=128 (default) or the 'tiled' impl."
        )

    # f_major: table (rows, F, cap); slot_major: table (rows, cap, F_pad)
    # (the gather's native order — f_dim arrives pre-padded by the caller).
    if config.table_layout not in ("f_major", "slot_major"):
        raise ValueError(
            f"unknown table_layout {config.table_layout!r}; "
            "expected 'f_major' or 'slot_major'"
        )
    slot_major = config.table_layout == "slot_major"
    table_block = (1, cap, f_dim) if slot_major else (1, f_dim, cap)

    fwd_call = pl.pallas_call(
        functools.partial(
            _fwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec(table_block, lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_chunks, p), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((channels, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
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
            _bwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, n_chunks=n_chunks,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows,),
            in_specs=[
                pl.BlockSpec(table_block, lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_chunks, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(table_block, lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, p), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (rows, cap, f_dim) if slot_major else (rows, f_dim, cap),
                jnp.float32,
            ),
            jax.ShapeDtypeStruct((rows, channels, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(table, counts, tile_ids, bg_rows):
        img, tfin, _ = fwd_call(counts, tile_ids, table, bg_rows[..., None])
        return img, tfin[:, 0, :]

    def composite_fwd(table, counts, tile_ids, bg_rows):
        img, tfin, tchk = fwd_call(counts, tile_ids, table, bg_rows[..., None])
        return (img, tfin[:, 0, :]), (
            table, counts, tile_ids, bg_rows, tfin, tchk
        )

    def composite_bwd(res, cots):
        table, counts, tile_ids, bg_rows, tfin, tchk = res
        g_img, g_tfin = cots
        dtab, dbg = bwd_call(
            counts, tile_ids, table, bg_rows[..., None], tchk, tfin,
            g_img, g_tfin[:, None, :],
        )
        return dtab, None, None, dbg[:, :, 0]

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_tiles_pallas(
    screen: ScreenGaussians,
    binned: BinnedTiles,
    image_shape: tuple[int, int],
    background: Array,  # (c,)
    config: RasterizeConfig,
) -> Array:
    """Single-camera Pallas compositing over binned tiles -> (h, w, c)."""
    screen_b = jax.tree_util.tree_map(lambda x: x[None], screen)
    binned_b = BinnedTiles(
        binned.indices[None], binned.counts[None],
        binned.num_tiles_x, binned.num_tiles_y,
    )
    return composite_tiles_pallas_batched(
        screen_b, binned_b, image_shape, background[None], config
    )[0]


def composite_tiles_pallas_batched(
    screen: ScreenGaussians,
    binned: BinnedTiles,
    image_shape: tuple[int, int],
    background: Array,  # (b, c)
    config: RasterizeConfig,
    mesh=None,
) -> Array:
    """Batched Pallas compositing over binned tiles -> (b, h, w, c).

    Flattens the batch into the tile grid (grid = b * tiles) instead of
    vmapping — batching the pipeline under vmap lowers ~4x slower on TPU.

    With a `jax.sharding.Mesh`, the (batch * tiles) rows are sharded over
    ALL mesh axes via shard_map — batch rows follow the `data` axis and
    each example's tiles split across the `tile` axis, with zero cross-chip
    traffic in the forward (the backward's only collective is XLA's psum of
    gaussian grads over `tile`). A 1-sized mesh (or None) compiles to the
    identical unsharded kernel.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles_x, tiles_y = binned.num_tiles_x, binned.num_tiles_y
    num_tiles = tiles_x * tiles_y
    channels = screen.color.shape[-1]
    f_dim = 6 + channels
    b = screen.depth.shape[0]
    cap = config.tile_capacity

    # Dense per-tile feature tables. Invalid slots zeroed so the gather's
    # VJP doesn't leak gradient into gaussian 0.
    slot_major = config.table_layout == "slot_major"
    feat_parts = [
        screen.xy,
        screen.conic,
        screen.opacity[..., None],
        screen.color,
    ]  # order [x, y, ca, cb, cc, op, color...]
    if slot_major:
        # Pad the feature channel to a sublane multiple at the SOURCE (n
        # rows) so the gather emits the kernel's layout directly — the
        # gather is index-bound, so the extra channels are free, and the
        # (rows, cap, F) -> (rows, F, cap) relayout disappears entirely.
        f_dim = -(-f_dim // 8) * 8
        pad = f_dim - 6 - channels
        feat_parts.append(
            jnp.zeros(screen.color.shape[:-1] + (pad,), screen.color.dtype)
        )
    feat = jnp.concatenate(feat_parts, axis=-1)  # (b, n, F)
    # Flat row gather (batched gathers lower poorly on TPU; see binning.py).
    n = feat.shape[1]
    feat_flat = feat.reshape(b * n, f_dim)
    b_off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat_idx = (jnp.maximum(binned.indices, 0) + b_off).reshape(-1)
    gathered = feat_flat[flat_idx].reshape(b * num_tiles, cap, f_dim)
    slot_valid = (binned.indices >= 0).reshape(b * num_tiles, cap, 1)
    gathered = jnp.where(slot_valid, gathered, 0.0)
    table = gathered if slot_major else gathered.swapaxes(1, 2)

    interpret = jax.default_backend() != "tpu"
    total = b * num_tiles
    counts = binned.counts.reshape(-1)
    tile_ids = jnp.tile(jnp.arange(num_tiles, dtype=jnp.int32), b)
    bg_rows = jnp.repeat(background, num_tiles, axis=0)  # (total, ch)

    n_shards = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
    if n_shards > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec

        if total % n_shards:
            raise ValueError(
                f"{total} tile rows not divisible by mesh size {n_shards}"
            )
        rows = total // n_shards
        composite = _make_composite(
            rows, f_dim, channels, tiles_x, config, interpret
        )
        spec = PartitionSpec(tuple(mesh.axis_names))
        composite = shard_map(
            composite,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec),
            check_vma=False,
        )
    else:
        composite = _make_composite(
            total, f_dim, channels, tiles_x, config, interpret
        )
    img_tiles, _ = composite(table, counts, tile_ids, bg_rows)

    out = img_tiles.reshape(b, tiles_y, tiles_x, channels, ts, ts)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(
        b, tiles_y * ts, tiles_x * ts, channels
    )
    return out[:, :h, :w]
