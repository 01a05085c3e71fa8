"""EWA projection of 3D Gaussians to screen space (pure jnp, vectorized).

Replaces the `preprocessCUDA` stage of the reference's external CUDA
rasterizer (`diff-gaussian-rasterization`, see SURVEY.md §2.3): camera-space
transform, near culling, perspective projection, EWA 2D covariance with
low-pass dilation, 3-sigma radius, and SH -> RGB evaluation. Everything is a
single fused vectorized computation over (batch..., n) — no per-gaussian
loops — so XLA maps it onto the VPU/MXU directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry import sh as sh_lib
from ...geometry.projection import get_fov, se3_inverse
from .types import Camera, RasterizeConfig, ScreenGaussians

Array = jax.Array


def make_camera(
    extrinsics: Array,
    intrinsics: Array,
    image_shape: tuple[int, int],
) -> Camera:
    """Build pixel-unit camera data from c2w extrinsics + normalized intrinsics.

    Mirrors the setup in `src/model/decoder/cuda_splatting.py:84-112` (fov,
    view matrix, camera position), but keeps the principal point general
    instead of assuming a centered symmetric frustum.
    """
    h, w = image_shape
    fov = get_fov(intrinsics)
    tan_fov_x = jnp.tan(0.5 * fov[..., 0])
    tan_fov_y = jnp.tan(0.5 * fov[..., 1])
    return Camera(
        w2c=se3_inverse(extrinsics),
        campos=extrinsics[..., :3, 3],
        fx=intrinsics[..., 0, 0] * w,
        fy=intrinsics[..., 1, 1] * h,
        cx=intrinsics[..., 0, 2] * w,
        cy=intrinsics[..., 1, 2] * h,
        tan_fov_x=tan_fov_x,
        tan_fov_y=tan_fov_y,
    )


def project_gaussians(
    camera: Camera,
    means: Array,        # (..., n, 3) world
    covariances: Array,  # (..., n, 3, 3) world
    opacities: Array,    # (..., n)
    sh: Array,           # (..., n, c, d_sh)
    sh_degree: int,
    config: RasterizeConfig,
    use_sh: bool = True,
) -> ScreenGaussians:
    """Project world-space Gaussians into one camera's screen space."""
    # Camera-space means.
    t = camera.w2c[..., None, :3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", camera.w2c[..., :3, :3], means) + t
    tz = cam[..., 2]
    in_front = tz > config.near_cull
    tz_safe = jnp.where(in_front, tz, 1.0)

    # Pixel coordinates (pixel centers at i + 0.5 convention).
    fx = camera.fx[..., None]
    fy = camera.fy[..., None]
    x_pix = fx * cam[..., 0] / tz_safe + camera.cx[..., None]
    y_pix = fy * cam[..., 1] / tz_safe + camera.cy[..., None]
    xy = jnp.stack([x_pix, y_pix], axis=-1)

    # EWA: clamp view-space tangents like the reference kernel does, then
    # propagate the 3D covariance through the projection Jacobian.
    lim_x = 1.3 * camera.tan_fov_x[..., None]
    lim_y = 1.3 * camera.tan_fov_y[..., None]
    txz = jnp.clip(cam[..., 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(cam[..., 1] / tz_safe, -lim_y, lim_y)

    # cov_cam = R_w2c Σ R_w2cᵀ  (3x3), then J (2x3) on both sides.
    cov_cam = jnp.einsum(
        "...ij,...njk,...lk->...nil", camera.w2c[..., :3, :3], covariances,
        camera.w2c[..., :3, :3],
    )
    inv_z = 1.0 / tz_safe
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z
    c00, c01, c02 = cov_cam[..., 0, 0], cov_cam[..., 0, 1], cov_cam[..., 0, 2]
    c11, c12, c22 = cov_cam[..., 1, 1], cov_cam[..., 1, 2], cov_cam[..., 2, 2]
    # Σ2D = J Σcam Jᵀ, expanded (J has zeros at (0,1) and (1,0)).
    a = j00 * j00 * c00 + 2 * j00 * j02 * c02 + j02 * j02 * c22
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * j11 * c11 + 2 * j11 * j12 * c12 + j12 * j12 * c22
    a = a + config.dilation
    c = c + config.dilation

    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # 3-sigma pixel radius from the larger eigenvalue.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(config.sigma_radius * jnp.sqrt(lam1))

    valid = in_front & (det > 0) & (opacities > 0)
    radius = jnp.where(valid, radius, 0.0)

    if use_sh:
        directions = means - camera.campos[..., None, :]
        directions = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
        )
        color = sh_lib.eval_sh(sh, directions, sh_degree)
        color = jnp.maximum(color + 0.5, 0.0)  # 3DGS offset + clamp
    else:
        color = sh[..., 0]

    return ScreenGaussians(
        xy=xy,
        depth=tz,
        conic=conic,
        radius=radius,
        color=color,
        opacity=opacities,
        valid=valid,
    )
