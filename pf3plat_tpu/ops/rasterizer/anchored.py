"""Anchor-tile rasterization — the gather-minimal TPU pipeline.

The round-1 pipeline expanded every gaussian into `max_dup` (tile, depth)
candidate pairs, sorted ~1M rows, and built a dense per-tile feature table
with two 0.5M-row gathers (and a matching scatter in the VJP). Measured on
v5e, those row-addressed passes (~66M rows/s) dominated the frame.

This pipeline exploits the static 2x2-tile footprint bound
(`max_tiles_per_gaussian_side == 2`): a gaussian can only touch its ANCHOR
tile (the tile of its AABB top-left corner) and that tile's right/down/
down-right neighbors. Equivalently, a tile's gaussians all come from the
anchor segments of itself and its left/up/up-left neighbors. So:

  * sort only (anchor_tile, id) over n gaussians — no pair expansion
    (~4x fewer rows than round 1);
  * ONE feature gather of n rows into anchor-sorted order (the only
    row-addressed pass in the pipeline; its VJP is a unique-index scatter
    of the same n rows);
  * the Pallas compositing kernel DMAs each of the 4 neighbor anchor
    segments from HBM at 128-aligned offsets, filters by exact tile
    coverage, depth-sorts a packed (depth_bits | slot) key IN VMEM with a
    bitonic network, and applies the resulting permutation to feature rows
    with one-hot matmuls on the MXU — the TPU's answer to CUDA's
    per-tile radix sort + shared-memory staging;
  * the backward kernel reuses the forward's saved sorted keys and
    transmittance checkpoints, un-permutes per-chunk gradients with the
    transposed one-hot matmuls, and accumulates them back into the sorted
    feature layout with read-modify-write DMAs (safe: TPU Pallas grids
    execute sequentially on a core).

Depth ordering: the packed key keeps the top 20 bits of the positive-float
depth (monotone) and uses the table slot as tiebreak, i.e. gaussians closer
than ~2^-11 relative depth may composite in either order — the same
quantization class as `fused_sort_key` (cf. `binning.py`), with the
difference documented in tests.

Replaces the CUDA stages of `diff-gaussian-rasterization` (binning/sort/
compositing, SURVEY.md §2.3 row 1) behind the same `render` API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import tile_bounds
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array

# Mosaic lowers f32 dot_general at DEFAULT precision to a single bf16 MXU
# pass (~2^-8 rel error — measured 1e-2 abs on the one-hot gather). The
# permutation matmuls must be exact (they implement a gather): with HIGHEST
# the one-hot side is exact in bf16 and the value side is split exactly, so
# the result is bit-exact f32.
_EXACT = jax.lax.Precision.HIGHEST

_INT32_MAX = jnp.int32(2**31 - 1)
_MAXI = 2**31 - 1  # python int: safe to close over inside pallas kernels
# x, y, ca, cb, cc, op, r, g, b, depth, aabb + 5 pad rows. Padded to a
# multiple of 8 sublanes: a feature chunk is then 16*128*4 = 8 KiB, so the
# kernel's chunk-granular HBM DMA windows stay 512-byte aligned — an
# 11-row (5632 B) chunk makes the backward's VMEM->HBM RMW writes land on
# unaligned HBM offsets, which faults the DMA engine (worker crash).
_F = 16
_DEPTH_CH = 9
_AABB_CH = 10


# ---------------------------------------------------------------------------
# XLA side: anchor sort + single feature gather
# ---------------------------------------------------------------------------


def anchor_sort(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
):
    """Sort gaussian ids by (batch, anchor tile). -> (starts, ids, valid).

    starts: (b*T + 1,) int32 segment boundaries into the sorted id array;
    ids:    (b*n,) int32 flat gaussian indices in anchor order;
    valid:  (b*n,) bool in sorted order.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b, n = screen.depth.shape

    bounds = tile_bounds(screen, image_shape, config)
    visible = (bounds.tw > 0) & (bounds.th > 0) & (screen.depth > 0)
    anchor = bounds.ty0 * tiles_x + bounds.tx0
    b_off = (jnp.arange(b, dtype=jnp.int32) * num_tiles)[:, None]
    key = jnp.where(visible, anchor + b_off, _INT32_MAX).reshape(b * n)
    ids = jnp.arange(b * n, dtype=jnp.int32)

    key_sorted, ids_sorted = jax.lax.sort((key, ids), num_keys=1)

    total = b * num_tiles
    total_rows = b * n
    targets = jnp.arange(total + 1, dtype=jnp.int32)
    lo = jnp.zeros((total + 1,), jnp.int32)
    hi = jnp.full((total + 1,), total_rows, jnp.int32)
    for _ in range(max(1, int(total_rows).bit_length())):
        mid = (lo + hi) // 2
        v = key_sorted[jnp.minimum(mid, total_rows - 1)]
        ge = (v >= targets) | (mid >= total_rows)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    starts = lo
    return starts, ids_sorted, key_sorted != _INT32_MAX, (tiles_x, tiles_y)


def pack_features(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
) -> Array:
    """Per-gaussian feature rows (b*n, F): the compositing channels plus
    depth and the bit-packed anchor AABB used for in-kernel coverage."""
    bounds = tile_bounds(screen, image_shape, config)
    aabb = (
        bounds.tx0
        | (bounds.ty0 << 12)
        | (bounds.tw << 24)
        | (bounds.th << 26)
    ).astype(jnp.int32)
    b, n = screen.depth.shape
    feat = jnp.concatenate(
        [
            screen.xy,
            screen.conic,
            screen.opacity[..., None],
            screen.color,
            screen.depth[..., None],
            jax.lax.bitcast_convert_type(aabb, jnp.float32)[..., None],
            jnp.zeros((b, n, _F - 11), feat_dtype(screen)),
        ],
        axis=-1,
    )
    return feat.reshape(b * n, _F)


def feat_dtype(screen: ScreenGaussians):
    return screen.xy.dtype


def gather_sorted_features(
    feat_rows: Array,      # (b*n, F) differentiable
    ids_sorted: Array,     # (b*n,)
    valid_sorted: Array,   # (b*n,)
    config: RasterizeConfig,
) -> Array:
    """One row gather into anchor order, chunked for the kernel's DMAs:
    -> (n_chunks, F, 128) with `anchor_capacity` zero rows of tail pad."""
    rows = feat_rows[ids_sorted]
    rows = jnp.where(valid_sorted[:, None], rows, 0.0)
    total = rows.shape[0]
    cap = config.anchor_capacity
    padded = -(-total // 128) * 128 + cap
    rows = jnp.pad(rows, ((0, padded - total), (0, 0)))
    return rows.reshape(padded // 128, 128, _F).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _bitonic_sort_keys(keys: Array) -> Array:
    """Ascending bitonic sort of a (rows, 128) int32 array flattened
    row-major. Strides < 128 move along lanes, >= 128 along sublanes."""
    rows, lanes = keys.shape
    n = rows * lanes
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes
        + jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    )
    n_stages = max(1, (n - 1).bit_length())
    for k in range(1, n_stages + 1):
        for j in range(k - 1, -1, -1):
            s = 1 << j
            if s < lanes:
                up = pltpu.roll(keys, lanes - s, axis=1)   # x[i + s]
                down = pltpu.roll(keys, s, axis=1)         # x[i - s]
            else:
                r = s // lanes
                up = pltpu.roll(keys, rows - r, axis=0)
                down = pltpu.roll(keys, r, axis=0)
            is_upper = (idx & s) != 0
            partner = jnp.where(is_upper, down, up)
            dir_up = (idx & (1 << k)) == 0
            take_min = dir_up ^ is_upper
            # pure logical form — a `where` between two i1 vectors trips
            # Mosaic's i8->i1 truncation path
            take_partner = (take_min & (partner < keys)) | (
                ~take_min & (partner > keys)
            )
            keys = jnp.where(take_partner, partner, keys)
    return keys


def _permute_chunk(table, perm, valid, n_slots_rows):
    """Gather feature rows `perm` (128,) from the chunked VMEM table
    ((rows, F, 128)) via one-hot matmuls. -> (F, 128)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)  # l index
    pcol = perm[None, :]                                        # (1, 128)
    sub = pcol >> 7
    low = pcol & 127
    acc = None
    for c in range(n_slots_rows):
        m = ((sub == c) & (lane == low) & valid[None, :]).astype(jnp.float32)
        part = jax.lax.dot_general(
            table[c], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT,
        )  # (F, 128)
        acc = part if acc is None else acc + part
    return acc


def _unpermute_add(dtable_ref, d_chunk, perm, valid, n_slots_rows):
    """Scatter-add d_chunk (F, 128) rows back to table slots (transposed
    one-hot matmuls); accumulates into the VMEM ref in place."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    pcol = perm[None, :]
    sub = pcol >> 7
    low = pcol & 127
    for c in range(n_slots_rows):
        m = ((sub == c) & (lane == low) & valid[None, :]).astype(jnp.float32)
        # dtable[c][f, l] += sum_r m[l, r] * d_chunk[f, r]
        add = jax.lax.dot_general(
            d_chunk, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT,
        )
        dtable_ref[c] = dtable_ref[c] + add


def _segment_params(starts_ref, t, tiles_x, tiles_y, num_tiles, cap):
    """Per-neighbor-segment (aligned chunk base, in-window offset, count)."""
    b_idx = t // num_tiles
    t_img = t % num_tiles
    tx = t_img % tiles_x
    ty = t_img // tiles_x
    out = []
    for dy in (0, 1):
        for dx in (0, 1):
            ax = tx - dx
            ay = ty - dy
            ok = (ax >= 0) & (ay >= 0)
            a = b_idx * num_tiles + ay * tiles_x + ax
            a = jnp.where(ok, a, 0)
            start = starts_ref[a]
            seg_len = starts_ref[a + 1] - start
            base = start // 128
            off = start - base * 128
            eff = jnp.minimum(seg_len, cap - off)
            eff = jnp.where(ok, eff, 0)
            out.append((base, off, eff))
    return out, tx, ty


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _chunk_alpha_rows(data, px, py, config):
    """As pallas_impl._chunk_alpha but for (F, 128) chunk data."""
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


def _anchored_fwd_kernel(
    starts_ref,        # scalar prefetch (b*T + 1,)
    feat_hbm,          # (n_chunks_total, F, 128) ANY
    bg_ref,            # (1, ch, 1) VMEM
    img_ref,           # (1, ch, P) out
    tfin_ref,          # (1, 1, P) out
    tchk_ref,          # (1, n_rows, P) out
    keys_ref,          # (1, n_rows, 128) int32 out
    table,             # VMEM (n_rows, F, 128)
    accum,             # VMEM (ch, P)
    tcar,              # VMEM (1, P)
    sem,               # DMA sem (4,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    tiles_y: int,
    num_tiles: int,
):
    cap = config.anchor_capacity
    rows_per_seg = cap // 128
    n_rows = 4 * rows_per_seg
    ts = config.tile_size
    p = ts * ts
    t = pl.program_id(0)

    segs, tx, ty = _segment_params(
        starts_ref, t, tiles_x, tiles_y, num_tiles, cap
    )

    # DMA the 4 anchor segments (128-aligned windows) into the table.
    copies = []
    for s, (base, off, eff) in enumerate(segs):
        c = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(base, rows_per_seg)],
            table.at[pl.ds(s * rows_per_seg, rows_per_seg)],
            sem.at[s],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    # Packed sort keys with coverage + window masking.
    depth = table[:, _DEPTH_CH, :]                    # (n_rows, 128)
    aabb = jax.lax.bitcast_convert_type(table[:, _AABB_CH, :], jnp.int32)
    ax0 = aabb & 0xFFF
    ay0 = (aabb >> 12) & 0xFFF
    aw = (aabb >> 24) & 3
    ah = (aabb >> 26) & 3
    covered = (
        (ax0 <= tx) & (tx < ax0 + aw) & (ay0 <= ty) & (ty < ay0 + ah)
    )
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    seg_i = row_i // rows_per_seg
    j = (row_i % rows_per_seg) * 128 + lane_i          # window position
    # per-row window bounds assembled from the 4 segments' scalars
    off_row = jnp.zeros((n_rows, 128), jnp.int32)
    eff_row = jnp.zeros((n_rows, 128), jnp.int32)
    for s, (base, off, eff) in enumerate(segs):
        off_row = jnp.where(seg_i == s, off, off_row)
        eff_row = jnp.where(seg_i == s, eff, eff_row)
    valid = (
        covered & (j >= off_row) & (j < off_row + eff_row) & (depth > 0)
    )

    slot = row_i * 128 + lane_i
    dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
    key = jnp.where(valid, (dbits & ~0xFFF) | slot, _MAXI)
    key = _bitonic_sort_keys(key)
    keys_ref[0] = key
    valid_total = jnp.sum((key != _MAXI).astype(jnp.int32))

    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    dtype = table.dtype
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    accum[...] = jnp.zeros((channels, p), dtype)
    tcar[...] = jnp.ones((1, p), dtype)
    tchk_ref[...] = jnp.zeros((1, n_rows, p), dtype)

    from .pallas_impl import _tri_incl

    l_incl = _tri_incl(128, dtype)

    def chunk_body(i):
        kc = keys_ref[0, i, :]                                 # (128,)
        vc = kc != _MAXI
        perm = kc & 0xFFF
        # invalid columns were zeroed by the one-hot mask: zero features
        # give power=0, alpha_raw=0 -> keep=False -> alpha=0, so no extra
        # per-row mask is needed (a (128,)->(128,1) bool reshape is also a
        # Mosaic relayout to avoid).
        data = _permute_chunk(table, perm, vc, n_rows)  # (F, 128)
        alpha, _, _, _, _ = _chunk_alpha_rows(data, px, py, config)
        color = data[6 : 6 + channels, :]

        tchk_ref[0, i, :] = tcar[0, :]
        s = jnp.log1p(-alpha)
        incl = jax.lax.dot_general(
            l_incl, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT,
        )
        t_after = tcar[...] * jnp.exp(incl)
        alive = t_after >= config.transmittance_min
        one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
        t_before = t_after / one_m
        w = jnp.where(alive, t_before * alpha, 0.0)
        accum[...] += jax.lax.dot_general(
            color, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT,
        )
        any_alive = jnp.any(alive, axis=0, keepdims=True)
        t_last = jnp.min(
            jnp.where(alive, t_after, jnp.inf), axis=0, keepdims=True
        )
        tcar[...] = jnp.where(any_alive, t_last, tcar[...])

    def cond(i):
        return (
            (i * 128 < valid_total)
            & (jnp.max(tcar[...]) >= config.transmittance_min)
        )

    def body(i):
        chunk_body(i)
        return i + 1

    jax.lax.while_loop(lambda i: (i < n_rows) & cond(i), body, 0)

    img_ref[0] = accum[...] + bg_ref[0] * tcar[...]
    tfin_ref[0] = tcar[...]


def _anchored_bwd_kernel(
    starts_ref,
    feat_hbm,          # ANY
    dfeat_init_hbm,    # ANY (aliased to dfeat output)
    bg_ref,
    tchk_ref,          # (1, n_rows, P)
    tfin_ref,          # (1, 1, P)
    keys_ref,          # (1, n_rows, 128) int32
    gimg_ref,          # (1, ch, P)
    gtf_ref,           # (1, 1, P)
    dfeat_hbm,         # (n_chunks_total, F, 128) ANY out (aliased)
    dbg_ref,           # (1, ch, 1) out
    table,             # VMEM (n_rows, F, 128)
    dtable,            # VMEM (n_rows, F, 128)
    rmw,               # VMEM (rows_per_seg, F, 128)
    tail,              # VMEM (1, P)
    sem,               # DMA sems (4,)
    rmw_sem,           # DMA sem (1,)
    *,
    config: RasterizeConfig,
    channels: int,
    tiles_x: int,
    tiles_y: int,
    num_tiles: int,
):
    cap = config.anchor_capacity
    rows_per_seg = cap // 128
    n_rows = 4 * rows_per_seg
    ts = config.tile_size
    p = ts * ts
    t = pl.program_id(0)
    dtype = table.dtype

    segs, tx, ty = _segment_params(
        starts_ref, t, tiles_x, tiles_y, num_tiles, cap
    )

    copies = []
    for s, (base, off, eff) in enumerate(segs):
        c = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(base, rows_per_seg)],
            table.at[pl.ds(s * rows_per_seg, rows_per_seg)],
            sem.at[s],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    key = keys_ref[0]                                  # (n_rows, 128)
    valid_total = jnp.sum((key != _MAXI).astype(jnp.int32))

    local = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (tx * ts + local % ts).astype(dtype) + 0.5
    py = (ty * ts + local // ts).astype(dtype) + 0.5

    dtable[...] = jnp.zeros_like(dtable)
    g = gimg_ref[0]
    gt = jnp.sum(bg_ref[0] * g, axis=0, keepdims=True) + gtf_ref[0]
    dbg_ref[0] = jnp.sum(g * tfin_ref[0], axis=1, keepdims=True)
    tail[...] = tfin_ref[0] * gt

    from .pallas_impl import _tri_incl, _tri_suffix

    l_incl = _tri_incl(128, dtype)
    u_suf = _tri_suffix(128, dtype)

    n_active = jnp.minimum((valid_total + 127) // 128, n_rows)

    def body(kk, _):
        i = n_active - 1 - kk

        @pl.when(i >= 0)
        def do():
            kc = keys_ref[0, i, :]
            vc = kc != _MAXI
            perm = kc & 0xFFF
            data = _permute_chunk(table, perm, vc, n_rows)
            alpha, dx, dy, gexp, unclamped = _chunk_alpha_rows(
                data, px, py, config
            )
            color = data[6 : 6 + channels, :]

            t_start = tchk_ref[0, i, :][None, :]
            s = jnp.log1p(-alpha)
            incl = jax.lax.dot_general(
                l_incl, s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )
            t_after = t_start * jnp.exp(incl)
            alive = t_after >= config.transmittance_min
            one_m = jnp.maximum(1.0 - alpha, 1.0 - config.alpha_clamp)
            t_before = t_after / one_m
            w = jnp.where(alive, t_before * alpha, 0.0)

            cg = jax.lax.dot_general(
                color, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )
            m = w * cg
            suffix = jax.lax.dot_general(
                u_suf, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
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
                g, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_EXACT,
            )  # (ch, 128)
            # depth/aabb channels and the alignment pad rows get zero grads
            zeros = jnp.zeros((_F - 6 - channels, 128), jnp.float32)
            d_chunk = jnp.concatenate(
                [d_x0, d_y0, d_ca, d_cb, d_cc, d_op, d_col, zeros],
                axis=0,
            )  # (F, 128)
            _unpermute_add(dtable, d_chunk, perm, vc, n_rows)

            tail[...] += jnp.sum(m, axis=0, keepdims=True)

        return ()

    jax.lax.fori_loop(0, n_rows, body, ())

    # Read-modify-write each segment window back to HBM. Sequential within
    # the kernel AND across grid steps, so overlapping windows (a gaussian
    # is read by up to 4 tiles; adjacent anchors share boundary chunks)
    # accumulate correctly.
    for s, (base, off, eff) in enumerate(segs):
        cin = pltpu.make_async_copy(
            dfeat_hbm.at[pl.ds(base, rows_per_seg)], rmw, rmw_sem.at[0]
        )
        cin.start()
        cin.wait()
        rmw[...] += dtable[pl.ds(s * rows_per_seg, rows_per_seg)]
        cout = pltpu.make_async_copy(
            rmw, dfeat_hbm.at[pl.ds(base, rows_per_seg)], rmw_sem.at[0]
        )
        cout.start()
        cout.wait()


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public entry
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _make_anchored_composite(
    batch: int,
    num_tiles: int,
    n_chunks_total: int,
    channels: int,
    tiles_x: int,
    tiles_y: int,
    config: RasterizeConfig,
    interpret: bool,
):
    cap = config.anchor_capacity
    if cap < 128 or (cap & (cap - 1)) != 0:
        # 4*cap keys feed the in-VMEM bitonic network, which needs a
        # power-of-two length (the roll-based exchanges wrap otherwise).
        raise ValueError("anchor_capacity must be a power of two >= 128")
    if cap > 1024:
        # The packed sort key reserves 12 bits for the slot index
        # ((dbits & ~0xFFF) | slot with slot < 4*cap); beyond 1024 the slot
        # would overflow into the depth bits and silently corrupt both the
        # depth ordering and the permutation indices.
        raise ValueError(
            "anchor_capacity must be <= 1024 (12-bit slot field in the "
            f"packed depth|slot sort key); got {cap}"
        )
    n_rows = 4 * cap // 128
    p = config.tile_size**2
    total = batch * num_tiles

    fwd_call = pl.pallas_call(
        functools.partial(
            _anchored_fwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, tiles_y=tiles_y, num_tiles=num_tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(
                    (1, channels, 1), lambda t, *_: (t // num_tiles, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_rows, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_rows, 128), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_rows, _F, 128), jnp.float32),
                pltpu.VMEM((channels, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((total, channels, p), jnp.float32),
            jax.ShapeDtypeStruct((total, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((total, n_rows, p), jnp.float32),
            jax.ShapeDtypeStruct((total, n_rows, 128), jnp.int32),
        ],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(
            _anchored_bwd_kernel, config=config, channels=channels,
            tiles_x=tiles_x, tiles_y=tiles_y, num_tiles=num_tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(
                    (1, channels, 1), lambda t, *_: (t // num_tiles, 0, 0)
                ),
                pl.BlockSpec((1, n_rows, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_rows, 128), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, channels, p), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, channels, 1), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_rows, _F, 128), jnp.float32),
                pltpu.VMEM((n_rows, _F, 128), jnp.float32),
                pltpu.VMEM((cap // 128, _F, 128), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks_total, _F, 128), jnp.float32),
            jax.ShapeDtypeStruct((total, channels, 1), jnp.float32),
        ],
        input_output_aliases={2: 0},  # dfeat_init (arg 2 incl. prefetch) -> dfeat
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(feat_chunked, starts, background):
        img, tfin, _, _ = fwd_call(starts, feat_chunked, background[..., None])
        return img

    def composite_fwd(feat_chunked, starts, background):
        img, tfin, tchk, keys = fwd_call(
            starts, feat_chunked, background[..., None]
        )
        return img, (feat_chunked, starts, background, tfin, tchk, keys)

    def composite_bwd(res, g_img):
        feat_chunked, starts, background, tfin, tchk, keys = res
        dfeat_init = jnp.zeros_like(feat_chunked)
        dfeat, dbg = bwd_call(
            starts, feat_chunked, dfeat_init, background[..., None],
            tchk, tfin, keys, g_img,
            jnp.zeros((batch * num_tiles, 1, p), jnp.float32),
        )
        dbg = dbg[:, :, 0].reshape(batch, num_tiles, -1).sum(axis=1)
        return dfeat, None, dbg

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_anchored_batched(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Array,  # (b, c)
    config: RasterizeConfig,
) -> Array:
    """Anchor-pipeline rendering of a batch of cameras -> (b, h, w, c)."""
    if config.max_tiles_per_gaussian_side != 2:
        raise ValueError("anchored pipeline requires a 2x2 footprint bound")
    h, w = image_shape
    ts = config.tile_size
    tiles_x = -(-w // ts)
    tiles_y = -(-h // ts)
    num_tiles = tiles_x * tiles_y
    b = screen.depth.shape[0]
    channels = screen.color.shape[-1]

    starts, ids_sorted, valid_sorted, _ = anchor_sort(
        screen, image_shape, config
    )
    starts = jax.lax.stop_gradient(starts)
    ids_sorted = jax.lax.stop_gradient(ids_sorted)
    valid_sorted = jax.lax.stop_gradient(valid_sorted)
    feat_rows = pack_features(screen, image_shape, config)
    feat_chunked = gather_sorted_features(
        feat_rows, ids_sorted, valid_sorted, config
    )

    interpret = jax.default_backend() != "tpu"
    composite = _make_anchored_composite(
        b, num_tiles, feat_chunked.shape[0], channels, tiles_x, tiles_y,
        config, interpret,
    )
    img_tiles = composite(feat_chunked, starts, background)
    out = img_tiles.reshape(b, tiles_y, tiles_x, channels, ts, ts)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(
        b, tiles_y * ts, tiles_x * ts, channels
    )
    return out[:, :h, :w]
