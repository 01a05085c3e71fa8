"""Gaussian adapter: raw per-pixel features -> valid world-space Gaussians.

Functional re-implementation of the reference `GaussianAdapter`
(`src/model/encoder/common/gaussian_adapter.py:30-120`): sigmoid-mapped
scales modulated by depth and an intrinsics-derived pixel-size multiplier,
normalized xyzw quaternions, degree-masked SH coefficients rotated into the
world frame, covariances R S S^T R^T conjugated by the (gradient-stopped)
camera rotation, and means placed along camera rays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry.projection import get_world_rays, intrinsics_inverse
from ..geometry.sh import rotate_sh
from ..geometry.transforms import quaternion_to_matrix

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GaussianAdapterCfg:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 4

    @property
    def d_sh(self) -> int:
        return (self.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        """Raw feature width: 3 scale + 4 quaternion + 3*d_sh SH."""
        return 7 + 3 * self.d_sh


def quaternion_xyzw_to_matrix(q: Array, eps: float = 1e-8) -> Array:
    """xyzw-ordered quaternion -> rotation matrix (reference convention,
    `src/model/encoder/common/gaussians.py:8-30`)."""
    wxyz = jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)
    return quaternion_to_matrix(wxyz, eps=eps)


def build_covariance(scale: Array, rotation_xyzw: Array) -> Array:
    """Sigma = R S S^T R^T from per-axis scales and an xyzw quaternion
    (reference `src/model/encoder/common/gaussians.py:34-45`)."""
    r = quaternion_xyzw_to_matrix(rotation_xyzw)
    rs = r * scale[..., None, :]  # R @ diag(s)
    return jnp.einsum("...ij,...kj->...ik", rs, rs)


def sh_mask(cfg: GaussianAdapterCfg, dtype=jnp.float32) -> Array:
    """Init-time damping of view-dependent SH bands
    (reference `gaussian_adapter.py:37-46`)."""
    mask = jnp.ones((cfg.d_sh,), dtype)
    for degree in range(1, cfg.sh_degree + 1):
        mask = mask.at[degree**2 : (degree + 1) ** 2].set(0.1 * 0.25**degree)
    return mask


def get_scale_multiplier(
    intrinsics: Array, pixel_size: Array, multiplier: float = 0.1
) -> Array:
    """World-units-per-pixel scale factor (reference `gaussian_adapter.py:102-113`)."""
    k_inv = intrinsics_inverse(intrinsics)[..., :2, :2]
    xy = multiplier * jnp.einsum("...ij,...j->...i", k_inv, pixel_size)
    return xy.sum(axis=-1)


def adapt_gaussians(
    cfg: GaussianAdapterCfg,
    extrinsics: Array,      # (..., 4, 4) c2w
    intrinsics: Array,      # (..., 3, 3) normalized
    coordinates: Array,     # (..., 2) normalized pixel xy
    depths: Array,          # (...,)
    opacities: Array,       # (...,)
    raw_gaussians: Array,   # (..., d_in)
    image_shape: tuple[int, int],
    eps: float = 1e-8,
):
    """Raw features -> (means, covariances, harmonics, opacities, scales, rotations).

    All leading dims broadcast; callers reshape to (b, g, ...) afterwards.
    """
    h, w = image_shape
    scales = raw_gaussians[..., 0:3]
    rotations = raw_gaussians[..., 3:7]
    sh = raw_gaussians[..., 7:]

    s_min, s_max = cfg.gaussian_scale_min, cfg.gaussian_scale_max
    scales = s_min + (s_max - s_min) * jax.nn.sigmoid(scales)
    pixel_size = jnp.asarray([1.0 / w, 1.0 / h], raw_gaussians.dtype)
    mult = get_scale_multiplier(intrinsics, pixel_size)
    scales = scales * depths[..., None] * mult[..., None]

    rotations = rotations / (
        jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps
    )

    sh = sh.reshape(*sh.shape[:-1], 3, cfg.d_sh)
    sh = sh * sh_mask(cfg, sh.dtype)

    covariances = build_covariance(scales, rotations)
    c2w_rot = jax.lax.stop_gradient(extrinsics[..., :3, :3])
    covariances = jnp.einsum(
        "...ij,...jk,...lk->...il", c2w_rot, covariances, c2w_rot
    )

    origins, directions = get_world_rays(coordinates, extrinsics, intrinsics)
    means = origins + directions * depths[..., None]

    harmonics = rotate_sh(sh, c2w_rot[..., None, :, :], cfg.sh_degree)
    return means, covariances, harmonics, opacities, scales, rotations
