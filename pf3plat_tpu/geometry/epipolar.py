"""Epipolar ray projection + view overlap estimation (pure jnp).

Covers the roles of the reference's `src/geometry/epipolar_lines.py`
(`project_rays:157` — used by the evaluation index generator and epipolar
visualizations): projecting one camera's rays into another camera as 2D
segments, and estimating pairwise view overlap.

Design deviation (documented): instead of the reference's closed-form
segment/image-frame intersection case analysis, rays are sampled at
logarithmically spaced depths and projected — fully vectorized, branch-free,
and equivalent for overlap computation at the sampling density used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import get_world_rays, project, sample_image_grid

Array = jax.Array


def project_ray_samples(
    origins: Array,       # (..., 3) world
    directions: Array,    # (..., 3) world unit
    extrinsics: Array,    # (..., 4, 4) target c2w
    intrinsics: Array,    # (..., 3, 3) target normalized
    near: float = 1.0,
    far: float = 100.0,
    num_samples: int = 32,
) -> tuple[Array, Array]:
    """Project points along each ray into the target view.

    Returns (xy (..., s, 2), valid (..., s)): normalized target coords and
    in-image/in-front validity per depth sample.
    """
    t = jnp.geomspace(near, far, num_samples, dtype=origins.dtype)
    pts = origins[..., None, :] + directions[..., None, :] * t[:, None]
    xy, in_front = project(
        pts, extrinsics[..., None, :, :], intrinsics[..., None, :, :]
    )
    in_image = (
        (xy[..., 0] >= 0.0) & (xy[..., 0] <= 1.0)
        & (xy[..., 1] >= 0.0) & (xy[..., 1] <= 1.0)
    )
    return xy, in_front & in_image


def view_overlap(
    extrinsics_a: Array,  # (4, 4) c2w
    intrinsics_a: Array,  # (3, 3)
    extrinsics_b: Array,
    intrinsics_b: Array,
    grid: tuple[int, int] = (16, 16),
    near: float = 1.0,
    far: float = 100.0,
) -> Array:
    """Fraction of view A's rays that enter view B's frustum.

    The overlap measure behind the evaluation index generator
    (`src/evaluation/evaluation_index_generator.py:47-151`) and the
    small/medium/large buckets (`model_wrapper.py:360-369`).
    """
    xy, _ = sample_image_grid(grid)
    origins, directions = get_world_rays(
        xy.reshape(-1, 2), extrinsics_a, intrinsics_a
    )
    _, valid = project_ray_samples(
        origins, directions, extrinsics_b, intrinsics_b, near, far
    )
    return valid.any(axis=-1).mean()
