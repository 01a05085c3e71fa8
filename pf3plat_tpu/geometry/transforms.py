"""Rotation / rigid-transform utilities (pure jnp, fully batched).

Covers the reference's scattered rotation math in one place:
  * geodesic distance          (`src/flow_util.py:20-31`)
  * 6D rotation -> matrix      (`src/model/encoder/encoder_costvolume.py:189-209`)
  * quaternion -> matrix       (`src/model/encoder/common/gaussians.py:8-30`)
  * Pluecker ray embedding      (`src/model/encoder/encoder_costvolume.py:211-224`)
  * make_Rt row-vector encode  (`src/flow_util.py:1006-1014`)
  * SO(3) SVD projection       (`src/flow_util.py:727-739`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def geodesic_distance(r1: Array, r2: Array) -> Array:
    """Per-element geodesic angle (radians) between rotation matrices.

    Unlike the reference (which returns the batch mean), returns the
    per-element angle; reduce at the call site.
    """
    m = jnp.matmul(r1, jnp.swapaxes(r2, -1, -2))
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)


def rotation_6d_to_matrix(d6: Array) -> Array:
    """Zhou et al. continuous 6D rotation parameterization -> 3x3 matrix.

    (..., 6) -> (..., 3, 3). Rows of the output are the orthonormalized
    basis (matches the reference's `r6d2mat`, stacking b1,b2,b3 as rows).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = a2 - proj * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: Array) -> Array:
    """Inverse of `rotation_6d_to_matrix`: take the first two rows."""
    return jnp.concatenate([m[..., 0, :], m[..., 1, :]], axis=-1)


def quaternion_to_matrix(q: Array, eps: float = 1e-8) -> Array:
    """Unit-norm-insensitive quaternion (wxyz) -> rotation matrix.

    Mirrors reference `src/model/encoder/common/gaussians.py:8-30`
    (normalizes internally).
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(m: Array) -> Array:
    """Rotation matrix -> quaternion (wxyz), branch-free (Shepperd / max-trace).

    Computes all four candidate solutions and selects the numerically best
    with `argmax`, so it is safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    qw2 = jnp.maximum(1 + m00 + m11 + m22, 0.0)
    qx2 = jnp.maximum(1 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1 - m00 - m11 + m22, 0.0)

    # Candidate quaternions, each scaled by 4*component.
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def make_rt(r: Array, t: Array) -> Array:
    """Encode X -> X @ R + t (row-vector convention) as a column-vector 4x4.

    Mirrors reference `make_Rt` (`src/flow_util.py:1006-1014`): the returned
    matrix M satisfies M @ [x;1] = R^T x + t.
    """
    rt = jnp.concatenate([jnp.swapaxes(r, -1, -2), t[..., None]], axis=-1)
    bottom = jnp.zeros_like(rt[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([rt, bottom], axis=-2)


def so3_project(m: Array) -> Array:
    """Project (..., 3, 3) onto SO(3) via SVD with determinant correction."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(jnp.matmul(u, vt))
    s = jnp.concatenate(
        [jnp.ones_like(det[..., None]), jnp.ones_like(det[..., None]), det[..., None]],
        axis=-1,
    )
    return jnp.matmul(u * s[..., None, :], vt)


def plucker_embedding(origins: Array, directions: Array) -> Array:
    """Pluecker ray coordinates (moment, direction) -> (..., 6).

    Mirrors reference `plucker_embedding` (`encoder_costvolume.py:211-224`):
    cross(origin, direction) concatenated with direction.
    """
    moment = jnp.cross(origins, directions)
    return jnp.concatenate([moment, directions], axis=-1)


def translation_angle(t1: Array, t2: Array, eps: float = 1e-8) -> Array:
    """Angle (radians) between translation directions; used for pose metrics
    (reference `src/model/model_wrapper.py:306-313`)."""
    n1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), eps)
    n2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), eps)
    cos = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)
    return jnp.arccos(cos)
