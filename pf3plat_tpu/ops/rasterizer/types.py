"""Shared types for the TPU Gaussian-splatting rasterizer.

The rasterizer replaces the reference's external CUDA dependency
`diff-gaussian-rasterization` (invoked via `src/model/decoder/cuda_splatting.py`)
with a TPU-native design: vectorized EWA projection, stable-sort tile binning
with static capacities, and MXU-friendly chunked alpha compositing
(transmittance as exp-of-cumsum, color accumulation as matmul).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer configuration (hashable; safe as a jit static arg).

    Numeric constants mirror the reference CUDA rasterizer's behavior so the
    two produce allclose images: 3-sigma radius, 0.3-pixel covariance
    dilation, alpha clamp 0.99, alpha cutoff 1/255, transmittance stop 1e-4,
    near-plane cull at z=0.2.
    """

    tile_size: int = 16            # pixels per tile side
    # Static cap on the tile-AABB side a gaussian may cover: 2 -> footprints
    # up to 2x2 tiles (radius <= tile_size px beyond its anchor tile) are
    # exact; larger gaussians are truncated. Pixel-aligned PF3plat gaussians
    # sit well under this; raise to 3+ for scenes with very large gaussians.
    max_tiles_per_gaussian_side: int = 2
    tile_capacity: int = 1024      # max gaussians composited per tile
    # Gaussians per compositing step (streamed: any multiple of 128; the
    # other impls take powers of two). NOTE streamed chunk=256 currently
    # hangs Mosaic lowering on v5e (unbounded pass, reproduced 2026-08;
    # see git history) — keep 128 until that is resolved upstream.
    chunk: int = 128
    # Pack (tile, depth) into ONE int32 sort key (~2x faster binning sort;
    # the default for bench, train, and tests alike). Depth is quantized to
    # (31 - ceil(log2(batch*tiles))) bits spread uniformly over the scene's
    # [min, max] depth; gaussians whose depths quantize to one level keep id
    # order (stable sort) exactly like true ties under the 2-key sort, so
    # divergence needs two same-tile gaussians within (range / 2^~21) depth
    # whose id order disagrees with depth order — measured ZERO divergence
    # on the tie-dense bench-style scene (images, grads, and loss bit-equal
    # to the exact sort). Set False for the exact 2-key lexicographic sort
    # (e.g. scenes whose far plane is orders of magnitude beyond content,
    # where uniform quantization is coarse near the camera).
    fused_sort_key: bool = True
    # Opacity-aware tight tile culling (binning.tile_alpha_cull): drop
    # candidate (gaussian, tile) pairs whose conservative max alpha over
    # the tile's pixel centers is below alpha_min. Those pairs composite
    # exact zeros (image and gradients); dropping them only reassociates
    # the transmittance product across chunk boundaries, so every binned
    # backend matches its cull-off self to ~1e-7 (f32 reassociation) —
    # except capacity-truncated tiles, where culling ADMITS more
    # contributing gaussians (strictly closer to the uncapped oracle). Cuts real-pair occupancy substantially on
    # pixel-aligned PF3plat scenes (fewer sort rows, smaller compaction
    # budgets, shorter kernel chunk walks); costs ~40 VPU ops/candidate.
    tight_cull: bool = True
    # Dense-table layout fed to the pallas compositor:
    #   "f_major"    — (rows, F, cap): features on sublanes, slots on lanes;
    #                  requires an XLA relayout of the gather output
    #                  ((rows, cap, F) -> (rows, F, cap), unaligned F=9).
    #   "slot_major" — (rows, cap, F_pad): the gather output order, zero
    #                  relayout; features sit on (128-padded) lanes inside
    #                  the kernel. Numerically identical; pick by measuring.
    table_layout: str = "f_major"
    # Compact candidate pairs before the binning sort (streamed pipeline
    # only; see compact.py): only `pairs_budget_factor * b*n*max_dup`
    # rows — rounded up to `compact_window` — ride the two big sorts
    # instead of the full static expansion. 0.0 disables compaction.
    # PF3plat scenes measure ~47% real-pair occupancy (most gaussians
    # cover 1-2 tiles of a 2x2 candidate box), so 0.55 keeps headroom
    # while halving the sorts; if a scene overflows the budget, the
    # candidate tail is dropped deterministically (gradients stay
    # correct, just truncated) — raise the factor for gaussian-dense
    # scenes or set 0.0 for the exact static expansion.
    pairs_budget_factor: float = 0.0
    # Candidate rows per compaction grid step (multiple of 128).
    compact_window: int = 4096
    # Shard-local mesh pipeline (shard_local.py): per-shard compacted
    # budget = pairs_budget_factor * shard_budget_slack * total / S. The
    # slack absorbs tile-load imbalance across shards (each shard owns a
    # contiguous band of tile rows whose pair density varies); overflow
    # truncates that shard's candidate tail deterministically, like the
    # single-chip budget.
    shard_budget_slack: float = 1.35
    # Tiles composited per streamed-kernel grid step (python-unrolled in
    # the kernel body). Pallas per-step pipeline machinery measures ~3 us
    # on v5e — a large share of a 16x16 tile's total cost — so batching
    # tiles per step amortizes it. Auto-reduced to the largest divisor of
    # the (per-shard) row count.
    tiles_per_step: int = 4
    # Depth of the streamed BACKWARD's per-chunk gradient RMW ring (the
    # ring holds 2*prefetch_depth slots so write drains trail the reads).
    # Since round 5 the FEATURE streams use one whole-window DMA per tile
    # instead of a ring (measured perf-neutral — the kernels are
    # VPU-bound, not DMA-bound — and much simpler); only the gradient
    # read-modify-write streams still ring, because their HBM windows
    # are shared with the next tile's drain.
    prefetch_depth: int = 4
    # Chunks processed per streamed-kernel LOOP iteration (python-unrolled
    # inside the while/fori body). Output is BIT-EXACT for any E: the
    # forward's early-exit granularity coarsens to E chunks, but chunks
    # past saturation/segment-end contribute exact zeros (their alpha/seg
    # masks zero every term), and the backward walks the same checkpointed
    # chunk set. v5e-measured (bench scene, wall): E=1 23.3 ms, E=2 26.2,
    # E=4 24.4 — unrolling does NOT pay, which falsifies the "per-chunk
    # loop machinery" hypothesis for the ~1 us/chunk floor (the cost moves
    # with the chunk count, i.e. it is the DMA waits / per-chunk work
    # itself, and early-exit overshoot is real work). Default stays 1;
    # the knob remains for other scene shapes. NOTE with E > 1 the up to
    # E-1 overshoot chunks still write (strictly positive) transmittance
    # checkpoints, so they count as "processed" in the backward's nproc
    # recovery (streamed.py: processed <=> max tchk > 0) — the backward
    # walks them as dead work with exactly-zero gradient contributions.
    chunks_per_iter: int = 1
    # Compaction only engages at or above this many candidate pairs:
    # small scenes (tests, thumbnails) often exceed any fractional budget
    # (dense coverage), the sorts they feed are cheap anyway, and the
    # exact expansion sidesteps truncation risk entirely.
    compact_min_pairs: int = 131072
    near_cull: float = 0.2
    dilation: float = 0.3
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4
    sigma_radius: float = 3.0

    @property
    def max_dup(self) -> int:
        return self.max_tiles_per_gaussian_side**2


class Camera(NamedTuple):
    """Per-view camera data, pixel units. All fields broadcastable leading dims."""

    w2c: Array        # (..., 4, 4) world-to-camera
    campos: Array     # (..., 3) camera origin in world space
    fx: Array         # (...,) focal length, pixels
    fy: Array
    cx: Array         # (...,) principal point, pixels
    cy: Array
    tan_fov_x: Array  # (...,) for EWA clamping
    tan_fov_y: Array


class ScreenGaussians(NamedTuple):
    """Per-gaussian screen-space quantities after projection (per camera)."""

    xy: Array        # (..., n, 2) pixel coords
    depth: Array     # (..., n) camera-space z
    conic: Array     # (..., n, 3) upper-tri inverse 2D covariance (a, b, c)
    radius: Array    # (..., n) pixel radius (0 => culled)
    color: Array     # (..., n, channels) view-dependent color
    opacity: Array   # (..., n)
    valid: Array     # (..., n) bool
