"""Camera trajectory generators for novel-view videos (pure jnp).

Mirrors `src/visualization/camera_trajectory/`:
  * `interpolate_extrinsics` / `interpolate_intrinsics` — slerp-style pose
    interpolation (`interpolation.py:208`, `:8`)
  * `generate_wobble` — circular image-plane wobble (`wobble.py:8-32`)
  * `generate_spin` — azimuth orbit at fixed elevation (`spin.py:9-45`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.transforms import (
    matrix_to_quaternion,
    quaternion_to_matrix,
)

Array = jax.Array


def slerp(q0: Array, q1: Array, t: Array) -> Array:
    """Spherical interpolation of wxyz quaternions; t broadcasts."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def interpolate_extrinsics(
    initial: Array, final: Array, t: Array
) -> Array:
    """(4,4) x (4,4) x (s,) -> (s, 4, 4): slerp rotation + lerp translation."""
    q0 = matrix_to_quaternion(initial[:3, :3])
    q1 = matrix_to_quaternion(final[:3, :3])
    q = slerp(q0[None], q1[None], t[:, None])
    r = quaternion_to_matrix(q)
    trans = initial[:3, 3][None] * (1 - t[:, None]) + final[:3, 3][None] * t[:, None]
    out = jnp.broadcast_to(jnp.eye(4, dtype=initial.dtype), (t.shape[0], 4, 4))
    out = out.at[:, :3, :3].set(r)
    out = out.at[:, :3, 3].set(trans)
    return out


def interpolate_intrinsics(initial: Array, final: Array, t: Array) -> Array:
    return initial[None] * (1 - t[:, None, None]) + final[None] * t[:, None, None]


def generate_wobble_transformation(
    radius: Array, t: Array, num_rotations: int = 1,
    scale_radius_with_t: bool = True,
) -> Array:
    """(...,) radius x (s,) t -> (..., s, 4, 4) image-plane wobble."""
    shape = (*radius.shape, t.shape[0])
    tf = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (*shape, 4, 4))
    r = radius[..., None]
    if scale_radius_with_t:
        r = r * t
    tf = tf.at[..., 0, 3].set(jnp.sin(2 * jnp.pi * num_rotations * t) * r)
    tf = tf.at[..., 1, 3].set(-jnp.cos(2 * jnp.pi * num_rotations * t) * r)
    return tf


def generate_wobble(extrinsics: Array, radius: Array, t: Array) -> Array:
    tf = generate_wobble_transformation(radius, t)
    return jnp.einsum("...ij,...sjk->...sik", extrinsics, tf)


def generate_spin(
    num_frames: int, elevation: float, radius: float, dtype=jnp.float32
) -> Array:
    tf_translation = jnp.eye(4, dtype=dtype)
    tf_translation = tf_translation.at[0, 0].set(-1.0).at[1, 1].set(-1.0)
    tf_translation = tf_translation.at[2, 3].set(-radius)

    phi = 2 * jnp.pi * (jnp.arange(num_frames, dtype=dtype) / num_frames)
    c, s = jnp.cos(phi), jnp.sin(phi)
    zeros = jnp.zeros_like(phi)
    ones = jnp.ones_like(phi)
    azimuth = jnp.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(num_frames, 3, 3)
    tf_azimuth = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (num_frames, 4, 4))
    tf_azimuth = tf_azimuth.at[:, :3, :3].set(azimuth)

    el = jnp.deg2rad(jnp.asarray(elevation, dtype))
    ce, se = jnp.cos(el), jnp.sin(el)
    elev = jnp.asarray(
        [[1, 0, 0], [0, ce, -se], [0, se, ce]], dtype
    )
    tf_elevation = jnp.eye(4, dtype=dtype).at[:3, :3].set(elev)

    return jnp.einsum(
        "sij,jk,kl->sil", tf_azimuth, tf_elevation, tf_translation
    )
