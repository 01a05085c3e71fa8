"""Pinhole projection / ray geometry (pure jnp, fully batched).

Functional parity with the reference `src/geometry/projection.py:9-247`
(homogenize, project/unproject, world rays, pixel grid, ray intersection,
fov), re-implemented with JAX broadcasting semantics and closed-form
3x3 inverses so everything stays jit/vmap-friendly on TPU.

Conventions (same as reference, `README.md:102-106` there):
  * intrinsics are *normalized*: row 0 divided by width, row 1 by height;
  * extrinsics are OpenCV-style camera-to-world (c2w) 4x4 matrices;
  * pixel coordinates are normalized to (0, 1) with half-pixel centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = jnp.finfo(jnp.float32).eps


def homogenize_points(points: Array) -> Array:
    """(..., d) xyz -> (..., d+1) xyz1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: Array) -> Array:
    """(..., d) xyz -> (..., d+1) xyz0."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: Array, transformation: Array) -> Array:
    """Apply (..., d, d) @ (..., d) with broadcasting."""
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: Array, extrinsics: Array) -> Array:
    return transform_rigid(homogeneous, extrinsics)


def se3_inverse(m: Array) -> Array:
    """Closed-form inverse of a rigid 4x4 transform (R|t).

    Cheaper and better conditioned than a general 4x4 inverse; mirrors the
    reference's `SE3_inverse` (`src/flow_util.py:321`).
    """
    r = m[..., :3, :3]
    t = m[..., :3, 3:]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.matmul(r_inv, t)
    top = jnp.concatenate([r_inv, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_world2cam(homogeneous: Array, extrinsics: Array) -> Array:
    return transform_rigid(homogeneous, se3_inverse(extrinsics))


def intrinsics_inverse(k: Array) -> Array:
    """Closed-form inverse of a pinhole intrinsics matrix.

    Assumes K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]] (skew supported).
    Avoids `jnp.linalg.inv` in the hot path.
    """
    fx = k[..., 0, 0]
    s = k[..., 0, 1]
    cx = k[..., 0, 2]
    fy = k[..., 1, 1]
    cy = k[..., 1, 2]
    one = jnp.ones_like(fx)
    zero = jnp.zeros_like(fx)
    inv_fx = one / fx
    inv_fy = one / fy
    row0 = jnp.stack([inv_fx, -s * inv_fx * inv_fy, (s * cy - cx * fy) * inv_fx * inv_fy], axis=-1)
    row1 = jnp.stack([zero, inv_fy, -cy * inv_fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_camera_space(
    points: Array,
    intrinsics: Array,
    epsilon: float = _EPS,
    infinity: float = 1e8,
) -> Array:
    """Perspective-divide then apply intrinsics. (..., 3) -> (..., 2)."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: Array,
    extrinsics: Array,
    intrinsics: Array,
    epsilon: float = _EPS,
) -> tuple[Array, Array]:
    """World points -> normalized pixel xy + in-front-of-camera mask.

    Mirrors reference `src/geometry/projection.py:59-72`.
    """
    points_h = homogenize_points(points)
    cam = transform_world2cam(points_h, extrinsics)[..., :-1]
    in_front = cam[..., -1] >= 0
    return project_camera_space(cam, intrinsics, epsilon=epsilon), in_front


def unproject(coordinates: Array, z: Array, intrinsics: Array) -> Array:
    """Normalized pixel xy + depth (z along optical axis) -> camera xyz.

    Mirrors reference `src/geometry/projection.py:74-88`.
    """
    coords_h = homogenize_points(coordinates)
    directions = jnp.einsum("...ij,...j->...i", intrinsics_inverse(intrinsics), coords_h)
    return directions * z[..., None]


def get_world_rays(
    coordinates: Array,
    extrinsics: Array,
    intrinsics: Array,
) -> tuple[Array, Array]:
    """Normalized pixel xy -> (world ray origins, unit world directions).

    Mirrors reference `src/geometry/projection.py:91-114`.
    """
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, ...], dtype=jnp.float32) -> tuple[Array, Array]:
    """Normalized (0,1) xy coordinates + integer ij indices for an image grid.

    Mirrors reference `src/geometry/projection.py:117-137`. Returns
    (coordinates (*shape, dim) xy-ordering, indices (*shape, dim) ij-ordering).
    """
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coords = [(idx.astype(dtype) + 0.5) / length for idx, length in zip(indices, shape)]
    coords = list(reversed(coords))
    coordinates = jnp.stack(jnp.meshgrid(*coords, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def intersect_rays(
    origins_x: Array,
    directions_x: Array,
    origins_y: Array,
    directions_y: Array,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> Array:
    """Least-squares intersection point of two ray bundles.

    Mirrors reference `src/geometry/projection.py:176-230`, but stays fully
    vectorized (no boolean compaction — parallel pairs are masked to `inf`
    instead, which keeps the op jittable with static shapes).
    """
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    ox = jnp.broadcast_to(origins_x, shape)
    dx = jnp.broadcast_to(directions_x, shape)
    oy = jnp.broadcast_to(origins_y, shape)
    dy = jnp.broadcast_to(directions_y, shape)

    parallel = jnp.einsum("...i,...i->...", dx, dy) > 1 - eps

    origins = jnp.stack([ox, oy], axis=0)
    directions = jnp.stack([dx, dy], axis=0)

    n = jnp.einsum("r...i,r...j->r...ij", directions, directions)
    n = n - jnp.eye(3, dtype=n.dtype)
    lhs = n.sum(axis=0)
    rhs = jnp.einsum("r...ij,r...j->r...i", n, origins).sum(axis=0)

    # Guard singular systems (parallel rays) so solve stays finite.
    lhs = jnp.where(parallel[..., None, None], jnp.eye(3, dtype=lhs.dtype), lhs)
    result = jnp.linalg.solve(lhs, rhs[..., None])[..., 0]
    return jnp.where(parallel[..., None], jnp.full_like(result, inf), result)


def get_fov(intrinsics: Array) -> Array:
    """Horizontal/vertical field of view (radians) from normalized intrinsics.

    Mirrors reference `src/geometry/projection.py:233-247`.
    """
    k_inv = intrinsics_inverse(intrinsics)

    def bearing(vector):
        v = jnp.einsum("...ij,j->...i", k_inv, jnp.asarray(vector, intrinsics.dtype))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    left = bearing([0.0, 0.5, 1.0])
    right = bearing([1.0, 0.5, 1.0])
    top = bearing([0.5, 0.0, 1.0])
    bottom = bearing([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.clip((left * right).sum(-1), -1.0, 1.0))
    fov_y = jnp.arccos(jnp.clip((top * bottom).sum(-1), -1.0, 1.0))
    return jnp.stack([fov_x, fov_y], axis=-1)
