"""Pair compaction + banded dup-reduce for the streamed rasterizer.

The streamed pipeline (streamed.py) expands every gaussian into a STATIC
`max_dup` candidate pairs and carries all of them — features included —
through two big `lax.sort`s. On the bench scene only ~47% of the 1M
candidate rows are real (most gaussians touch 1-2 tiles, not 4); the
sorts move the dead rows' payload anyway, and `lax.sort` cost scales with
rows x operands. This module removes the dead rows BEFORE the sorts:

  1. `compact_pairs` — a Pallas kernel streams the (16, P) candidate
     plane (built by XLA in the fast slot-major broadcast layout), moves
     each block's valid rows to the front with a log-shift network
     (shift amounts are monotone along lanes, which makes the
     power-of-two moves collision-free), and appends them to a static
     `budget`-row output plane with a running cursor. Writes use the
     overwrite trick: each step writes its full (junk-tailed) block at
     the cursor and the next write starts at cursor+count, overwriting
     the junk — writes are explicitly serialized so the overlapping
     stores land in grid order. TPUs have no fast row gather/scatter
     (~66M rows/s measured); this kernel moves rows at streaming-DMA
     speed precisely because compaction is an order-preserving,
     cursor-addressed append. The kernel does NO arithmetic on the
     feature channels (rolls + selects only), so compaction is bit-exact.
  2. The caller sorts the compacted `budget` rows instead of the full
     b*n*max_dup candidates (~2x fewer rows on PF3plat scenes). Original
     pair ids ride along as a (f32-exact) channel, so the sort's
     id-as-tiebreak semantics — and therefore the composite order — are
     IDENTICAL to the uncompacted pipeline.
  3. `banded_dup_reduce` — the backward's gradient unsort (sort by pair
     id) restores ascending-pair-id order, where each gaussian's
     surviving pair gradients form a CONTIGUOUS run of <= max_dup rows.
     A Pallas kernel reduces those banded runs with a windowed DMA +
     one-hot MXU matmul, deriving row ownership from the pair ids
     carried IN the window (owner = id // max_dup) — replacing the fixed
     reshape-sum over the dup axis with no gather, no scatter, and no
     per-gaussian prefix array (window bases come from a binary search
     with only one target per 512-gaussian block).

Overflow policy (static shapes require one): if the scene produces more
real pairs than `budget`, the kernel stops appending at the first block
that no longer fits — the TAIL of slot-major candidate order is dropped,
as if those pairs were never binned. The kernel reports (written, total)
counts so callers can detect truncation, and the id-driven backward
reduce stays CORRECT (merely truncated) under overflow. `streamed.py`
sizes budgets with measured-occupancy headroom and the parity tests pin
bit-equality whenever budget >= real.

Replaces the variable-length pair list the reference's CUDA rasterizer
builds with atomic counters + prefix sums (SURVEY.md §2.3 row 1;
duplicateWithKeys in diff-gaussian-rasterization, glue at
`src/model/decoder/cuda_splatting.py:99-126`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import (
    tile_bounds, tile_alpha_cull, _depth_sort_key, _INT32_MAX
)
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array

# Sublane rows of the candidate/compacted planes (2x the f32 VMEM tile
# height). Integer rows (tile id, depth key bits, pair id) are BITCAST
# into the f32 plane — the kernel only moves rows (rolls + selects, no
# arithmetic), so arbitrary bit patterns are safe and exact; the valid
# flag stays a real 0.0/1.0 f32 because the kernel compares it.
# Row map: 0 tile id, 1 depth sort-key bits (quantized level in fused
# mode, `_depth_sort_key` bits otherwise), 2 pair id, 3..11 features
# [x, y, ca, cb, cc, op, c0, c1, c2], 12 valid flag, 13..15 zero.
_R = 16
_ROW_TILE = 0
_ROW_DSEC = 1
_ROW_PID = 2
_ROW_FEAT = 3
_N_FEAT = 9
_ROW_VALID = 12


def _compact_kernel(
    cand_ref,       # (16, C0) VMEM block of the candidate plane
    outC_hbm,       # (16, budget) ANY out: compacted plane
    counts_ref,     # (1, 2) SMEM out: [written, total_valid]
    stage,          # VMEM (2, 16, C0 + 128) write staging double buffer
    carry,          # VMEM (16, 128): sub-128 remainder rows
    st,             # SMEM (5,) i32: [cursor_tiles, total, wrote_last,
                    #                 carry_len, prev_base_tiles]
    semW,           # DMA sem (2,)
    semF,           # DMA sem: final carry flush
    *,
    budget: int,
    c0: int,
    n_steps: int,
):
    """One grid step: log-shift-compact the block's valid rows, merge
    them after the carried remainder, append to the output plane.

    Mosaic only allows lane-dim DMA offsets that are PROVABLY multiples
    of the 128 tiling, so the cursor advances in whole 128-row tiles
    (`cursor_tiles * 128` is provable) and the sub-128 remainder rides a
    VMEM carry buffer into the next step's merge."""
    cx = c0 + 128  # staged block width (carry prefix + compacted rows)
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        for i in range(5):
            st[i] = 0

    data = cand_ref[...]                      # (16, c0)
    valid = data[_ROW_VALID : _ROW_VALID + 1, :] > 0.5
    inv = jnp.where(valid, 0, 1)

    # Exclusive cumsum of invalid-count along lanes (Hillis-Steele).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c0), 1)
    incl = inv
    k = 1
    while k < c0:
        moved = pltpu.roll(incl, k, 1)
        incl = incl + jnp.where(lane >= k, moved, 0)
        k <<= 1
    shift = jnp.where(valid, incl - inv, 0)

    # Log-shift compaction: each valid lane moves left past the invalid
    # lanes before it. Shifts are non-decreasing along lanes, so the
    # LSB->MSB power-of-two moves never collide; circular wrap is
    # harmless because lane i always has shift <= i < k for wrapped
    # sources, which clears bit k.
    val_i = jnp.where(valid, 1, 0)
    k = 1
    while k < c0:
        sh_r = pltpu.roll(shift, c0 - k, 1)    # == roll by -k
        val_r = pltpu.roll(val_i, c0 - k, 1)
        data_r = pltpu.roll(data, c0 - k, 1)
        take = ((sh_r & k) != 0) & (val_r != 0)
        data = jnp.where(take, data_r, data)
        stay = jnp.where((shift & k) != 0, 0, val_i)
        val_i = jnp.where(take, 1, stay)
        shift = jnp.where(take, sh_r & ~k, shift)
        k <<= 1
    cnt = jnp.sum(val_i)

    # Merge [carry rows | compacted rows] into the (16, cx) staged block.
    c_len = st[3]
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (1, cx), 1)
    data_x = jnp.pad(data, ((0, 0), (0, 128)))
    rolled = pltpu.roll(data_x, c_len, 1)      # dynamic shift < 128
    carry_x = jnp.pad(carry[...], ((0, 0), (0, c0)))
    merged = jnp.where(lane_x < c_len, carry_x, rolled)

    w_total = c_len + cnt
    w_tiles = w_total // 128
    new_c_len = w_total - w_tiles * 128
    cur_t = st[0]
    wrote_last = st[2]
    # Monotone: once a block no longer fits, none after it does.
    fits = cur_t * 128 + cx <= budget
    slot_w = jax.lax.rem(r, 2)

    def write(slot, base_t):
        return pltpu.make_async_copy(
            stage.at[slot],
            outC_hbm.at[:, pl.ds(base_t * 128, cx)],
            semW.at[slot],
        )

    @pl.when(fits)
    def _():
        # stage[slot_w] was last written out two writing steps ago; that
        # DMA was drained by the previous writing step, so the slot is
        # free to mutate.
        stage[slot_w] = merged
        # New carry: merged rows [w_tiles*128, w_total) — they are also
        # inside this write's region and get re-written (identically) at
        # the start of the next one.
        ext = jax.lax.rem(cx - w_tiles * 128, cx)
        carry[...] = pltpu.roll(merged, ext, 1)[:, :128]

        @pl.when(wrote_last == 1)
        def _():
            # Serialize with the previous write: its junk tail overlaps
            # this write's rows, so it must land first.
            write(1 - slot_w, st[4]).wait()

        write(slot_w, cur_t).start()
        st[0] = cur_t + w_tiles
        st[3] = new_c_len
        st[4] = cur_t

    @pl.when(jnp.logical_not(fits) & (wrote_last == 1))
    def _():
        # First non-fitting step drains the last write ever issued.
        write(1 - slot_w, st[4]).wait()

    st[2] = jnp.where(fits, 1, 0)
    st[1] = st[1] + cnt
    counts_ref[0, 0] = st[0] * 128 + st[3]
    counts_ref[0, 1] = st[1]

    @pl.when(r == n_steps - 1)
    def _():
        @pl.when(fits)
        def _():
            write(slot_w, st[4]).wait()

        # Flush the remainder rows (the overwrite trick has no further
        # write to cover them). Always fits when any block did: the last
        # write's region [st[4]*128, st[4]*128 + cx) contains it.
        flushable = (st[3] > 0) & (st[0] * 128 + 128 <= budget)

        @pl.when(flushable)
        def _():
            fl = pltpu.make_async_copy(
                carry, outC_hbm.at[:, pl.ds(st[0] * 128, 128)], semF
            )
            fl.start()
            fl.wait()

        @pl.when(jnp.logical_not(flushable))
        def _():
            counts_ref[0, 0] = st[0] * 128  # remainder dropped


@functools.lru_cache(maxsize=16)
def _make_compact_call(
    n_cand: int, budget: int, c0: int, interpret: bool
):
    assert c0 % 128 == 0 and n_cand % c0 == 0
    assert budget % 128 == 0 and budget >= c0 + 128
    n_steps = n_cand // c0
    return pl.pallas_call(
        functools.partial(
            _compact_kernel, budget=budget, c0=c0, n_steps=n_steps
        ),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((_R, c0), lambda r: (0, r))],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_R, budget), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _R, c0 + 128), jnp.float32),
            pltpu.VMEM((_R, 128), jnp.float32),
            pltpu.SMEM((5,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


def pairs_budget(config: RasterizeConfig, b: int, n: int) -> int:
    """Static compacted-pair budget: `pairs_budget_factor` of the full
    b*n*max_dup expansion plus one staged block of slack (the kernel
    appends a block only while cursor + block <= budget, so the slack
    makes `factor * total >= real_pairs` a COVERAGE guarantee — in
    particular factor 1.0 never truncates). Capped at the always-exact
    bound; rounded to the 128 DMA tiling."""
    total = b * n * config.max_dup
    c0 = config.compact_window
    cx = c0 + 128
    # Quantum: the 128 DMA tiling AND the compositing chunk (featB is
    # reshaped to (budget // chunk, chunk) windows downstream).
    q = max(128, config.chunk)

    def up(x):
        return -(-x // q) * q

    want = up(int(total * config.pairs_budget_factor) + cx)
    return max(up(cx + 128), min(want, up(total + cx)))


def compact_pairs(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    config: RasterizeConfig,
    tile_lo=None,
    tile_hi=None,
    budget_override: int | None = None,
):
    """Expand candidate pairs (slot-major, like streamed._pair_sort) and
    compact the valid rows into a static `budget`-row plane.

    `tile_lo`/`tile_hi` (optional, traced or static i32): keep only pairs
    whose flat batch*tile key lies in [tile_lo, tile_hi) — the shard-local
    pipeline's ownership mask (each mesh shard compacts just its own tile
    rows out of the full candidate stream). `budget_override` sets the
    static output budget directly (the per-shard budget differs from the
    global formula).

    Returns a dict:
      tile (budget,) i32 (INT32_MAX pad), dkey (budget,) i32 monotone
      depth sort key, ids (budget,) i32 original pair ids
      (g * max_dup + slot; INT32_MAX pad), feats list of 9 (budget,) f32,
      written () i32, total () i32, budget int.
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
    assert total_tiles * 2 < 2**31

    bounds = tile_bounds(screen, image_shape, config)
    visible = (bounds.tw > 0) & (bounds.th > 0)

    # Slot-major (max_dup, b, n) candidate layout — every channel is a
    # leading-axis broadcast of a contiguous (b, n) block (the measured
    # fast layout; see streamed._pair_sort). Compaction order therefore
    # differs from pair-id order, which is fine: the sorts key on the
    # carried pair ids, so tie order and the backward unsort layout are
    # identical to the uncompacted pipeline.
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
    if tile_lo is not None:
        key = tile + b_off
        in_box = in_box & (key >= tile_lo) & (key < tile_hi)

    def as_bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    tile_f = as_bits(jnp.where(in_box, tile + b_off, 0))
    g_idx = jnp.arange(b * n, dtype=jnp.int32).reshape(1, b, n)
    pid_f = as_bits(g_idx * max_dup + slot)

    def pairify(x):
        return jnp.broadcast_to(x[None], (max_dup, b, n)).reshape(
            total_pairs
        )

    def feat(x):
        # Sanitize culled rows: projection leaves inf/NaN there, and a
        # non-finite value inside a shared DMA window poisons the masked
        # compositing arithmetic (inf * 0 = NaN).
        return pairify(jnp.where(visible, x, 0.0).astype(jnp.float32))

    channels = screen.color.shape[-1]
    if channels > 3:
        raise ValueError("compact pipeline supports at most 3 channels")
    feats = [
        feat(screen.xy[..., 0]),
        feat(screen.xy[..., 1]),
        feat(screen.conic[..., 0]),
        feat(screen.conic[..., 1]),
        feat(screen.conic[..., 2]),
        feat(screen.opacity),
    ] + [feat(screen.color[..., c]) for c in range(channels)]
    feats += [jnp.zeros((total_pairs,), jnp.float32)] * (
        _N_FEAT - len(feats)
    )

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
        dsec = pairify(as_bits(dq))
    else:
        bits_d = None
        dsec = pairify(as_bits(_depth_sort_key(screen.depth, visible)))

    rows = (
        [tile_f.reshape(total_pairs), dsec, pid_f.reshape(total_pairs)]
        + feats
        + [in_box.astype(jnp.float32).reshape(total_pairs)]
        + [jnp.zeros((total_pairs,), jnp.float32)] * (_R - _ROW_VALID - 1)
    )
    cand = jnp.stack(rows, axis=0)  # (16, total_pairs)

    c0 = config.compact_window
    n_cand = total_pairs
    if n_cand % c0:
        cand = jnp.pad(cand, ((0, 0), (0, c0 - n_cand % c0)))
        n_cand += c0 - n_cand % c0
    budget = (
        budget_override if budget_override is not None
        else pairs_budget(config, b, n)
    )

    interpret = jax.default_backend() != "tpu"
    call = _make_compact_call(n_cand, budget, c0, interpret)
    outC, counts = call(cand)

    written = counts[0, 0]
    total = counts[0, 1]

    # Mask the junk tail ([written, budget)): keys/ids to INT32_MAX so
    # the rows sort last everywhere; features to zero.
    pos = jnp.arange(budget, dtype=jnp.int32)
    in_use = pos < written

    def from_bits(row):
        return jax.lax.bitcast_convert_type(row, jnp.int32)

    tile_c = jnp.where(in_use, from_bits(outC[_ROW_TILE]), _INT32_MAX)
    dkey = jnp.where(in_use, from_bits(outC[_ROW_DSEC]), _INT32_MAX)
    ids = jnp.where(in_use, from_bits(outC[_ROW_PID]), _INT32_MAX)
    feats_c = [
        jnp.where(in_use, outC[_ROW_FEAT + i], 0.0) for i in range(_N_FEAT)
    ]

    return dict(
        tile=tile_c, dkey=dkey, ids=ids, feats=feats_c,
        written=written, total=total, budget=budget,
        bits_d=bits_d,
    )


# Row of the gradient plane carrying the pair id (as an exact f32 value).
_GROW_ID = 0
_GROW_GRAD = 1


def _banded_reduce_kernel(
    base_ref,       # scalar prefetch (n_blocks,): window base per block,
                    # in 128-row TILES (Mosaic needs provably aligned
                    # lane-dim DMA offsets: base * 128)
    flag_ref,       # scalar prefetch (n_blocks,): 1 iff the block owns
                    # any rows (empty blocks skip DMA + matmul entirely
                    # and write exact zeros — the value they would have
                    # computed). Under the shard-local mesh pipeline a
                    # shard's rows cluster into contiguous gaussian-id
                    # bands, so ~(S-1)/S of the blocks skip and the
                    # reduce cost scales with the shard's occupancy.
    grads_hbm,      # (16, budget) ANY: ascending-pair-id gradient plane
    out_ref,        # (16, T*G1) VMEM out block: per-gaussian sums
    win,            # VMEM (2, 16, W) double buffer
    sem,            # DMA sem (2,)
    *,
    w_rows: int,
    g1: int,
    max_dup: int,
    n_blocks: int,
    t_step: int,
):
    r = pl.program_id(0)

    def dma(i, s):
        return pltpu.make_async_copy(
            grads_hbm.at[:, pl.ds(base_ref[i] * 128, w_rows)],
            win.at[s], sem.at[s],
        )

    # `t_step` blocks per grid step (amortizes the per-step pipeline
    # machinery); the 2-slot prefetch ring spans sub-blocks AND grid
    # steps (semaphores persist across the sequential grid). Skipped
    # blocks advance the ring parity without starting/waiting a DMA, so
    # slot ownership is unchanged: a slot's previous occupant was waited
    # when ITS block ran (or never started).
    for t in range(t_step):
        bb = r * t_step + t
        slot = jax.lax.rem(bb, 2)

        @pl.when((bb == 0) & (flag_ref[0] == 1))
        def _():
            dma(0, 0).start()

        @pl.when(bb + 1 < n_blocks)
        def _():
            @pl.when(flag_ref[bb + 1] == 1)
            def _():
                dma(bb + 1, jax.lax.rem(bb + 1, 2)).start()

        @pl.when(flag_ref[bb] == 1)
        def _():
            dma(bb, slot).wait()

            # Ownership from the carried (bitcast) pair ids: window row
            # j belongs to gaussian id // max_dup. Pad rows carry
            # INT32_MAX ids whose owner is out of range, so they never
            # select (which also makes clamped windows and
            # overflow-dropped pairs exact). NOTE the ids row does ride
            # the matmul below as NaN-ish bit patterns — harmless,
            # matmul rows are independent and output row _GROW_ID is
            # discarded.
            ids = win[slot][_GROW_ID : _GROW_ID + 1, :]  # (1, W) f32 bits
            owner = jax.lax.bitcast_convert_type(ids, jnp.int32) // max_dup
            g = (
                jax.lax.broadcasted_iota(jnp.int32, (g1, w_rows), 0)
                + bb * g1
            )
            sel = (owner == g).astype(jnp.float32)       # (g1, W)
            # HIGHEST: full-f32 MXU passes. sel is exactly 0/1, so each
            # output is an exact sum of <= max_dup unaltered f32
            # gradients — measured on chip, the default (bf16
            # single-pass) loses ~2^-11 relative and fails the oracle
            # gradient gates.
            out_ref[:, t * g1 : (t + 1) * g1] = jax.lax.dot_general(
                win[slot], sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(flag_ref[bb] == 0)
        def _():
            out_ref[:, t * g1 : (t + 1) * g1] = jnp.zeros(
                (_R, g1), jnp.float32
            )


@functools.lru_cache(maxsize=16)
def _make_banded_reduce(
    n_gauss: int, budget: int, g1: int, max_dup: int, t_step: int,
    interpret: bool,
):
    assert n_gauss % (g1 * t_step) == 0
    n_blocks = n_gauss // g1
    # +128: window bases are rounded DOWN to the 128 tiling, so one extra
    # tile keeps the block's runs covered.
    w_rows = g1 * max_dup + 128
    assert w_rows % 128 == 0 and budget >= w_rows
    return pl.pallas_call(
        functools.partial(
            _banded_reduce_kernel, w_rows=w_rows, g1=g1,
            max_dup=max_dup, n_blocks=n_blocks, t_step=t_step,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks // t_step,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(
                (_R, t_step * g1), lambda bk, *_: (0, bk)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _R, w_rows), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_R, n_gauss), jnp.float32),
        interpret=interpret,
    )


def banded_dup_reduce(
    grads: Array,          # (16, budget) f32 plane: row 0 = pair ids
    ids_unsorted: Array,   # (budget,) i32 ascending pair ids (+pad MAX)
    n_gauss: int,
    max_dup: int,
    g1: int = 512,
) -> Array:
    """Per-gaussian sums over contiguous <= max_dup gradient runs.

    `grads` row 0 must carry the pair ids BITCAST to f32; rows 1..9 the
    gradient channels, in ascending-pair-id order (the unsort's output).
    -> (16, n_gauss) where row 0 is meaningless (it sums ids) and rows
    1..9 are the per-gaussian gradient sums.
    """
    budget = grads.shape[1]
    # The DMA window (g1 * max_dup + 128 rows) must fit the plane and
    # stay 128-aligned; shrink g1 for tiny budgets.
    lane_q = max(1, 128 // max_dup) if 128 % max_dup == 0 else 128
    g1 = min(g1, (budget - 128) // max_dup // lane_q * lane_q)
    if g1 <= 0:
        raise ValueError(
            f"pairs budget {budget} too small for the banded reduce "
            f"(needs >= {lane_q * max_dup + 128} rows)"
        )
    t_step = 4
    quant = g1 * t_step
    n_pad = n_gauss if n_gauss % quant == 0 else (
        n_gauss + quant - n_gauss % quant
    )
    n_blocks = n_pad // g1
    w_rows = g1 * max_dup + 128

    # Window base per block: first row whose pair id belongs to gaussian
    # >= block start — a binary search with only n_blocks+1 targets (the
    # per-gaussian prefix array would need b*n-target gathers or big
    # cumsums; both measured slow). The +1 target yields each block's
    # exclusive END, from which empty blocks (no owned rows — the common
    # case on a shard-local mesh shard, whose rows cluster into
    # contiguous id bands) are flagged for the kernel to skip.
    targets = jnp.arange(n_blocks + 1, dtype=jnp.int32) * (g1 * max_dup)
    lo = jnp.zeros((n_blocks + 1,), jnp.int32)
    hi = jnp.full((n_blocks + 1,), budget, jnp.int32)
    for _ in range(max(1, int(budget).bit_length())):
        mid = (lo + hi) // 2
        v = ids_unsorted[jnp.minimum(mid, budget - 1)]
        ge = (v >= targets) | (mid >= budget)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    flags = (lo[1:] > lo[:-1]).astype(jnp.int32)
    # Bases in 128-row tiles (rounded down — the window carries +128 rows
    # of slack), clamped inside the plane; selection is by absolute id,
    # so clamped/slack rows never select.
    base_t = jnp.minimum(lo[:-1] // 128, jnp.int32((budget - w_rows) // 128))

    interpret = jax.default_backend() != "tpu"
    call = _make_banded_reduce(
        n_pad, budget, g1, max_dup, t_step, interpret
    )
    out = call(base_t, flags, grads)
    return out[:, :n_gauss]
