"""Training losses (pure functions over pytrees).

Mirrors the reference `src/loss/`:
  * MSE on the middle target views            (`loss_mse.py:22-36`)
  * SSIM on the middle target views           (`loss_multissim.py:24-84`)
  * LPIPS-VGG after a warmup step             (`loss_lpips.py:27-60`)
  * pose/correspondence loss: confidence-weighted 3D point alignment +
    2D reprojection Huber on matched keypoints (`loss_pose.py:28-156`)

"Middle target views" refers to the view-splicing protocol: context views
are placed at both ends of the target stack, so indices [1:-1] are the true
novel views (`src/model/model_wrapper.py:251-256`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry.projection import intrinsics_inverse, sample_image_grid
from ..models.encoder import EncoderOutput, view_pairs
from ..ops.ssim import ssim

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LossCfg:
    mse_weight: float = 1.0
    ssim_weight: float = 0.1
    lpips_weight: float = 0.1
    lpips_apply_after_step: int = 0
    pose_weight_2d: float = 0.1
    pose_weight_3d: float = 1.0


def _middle(x: Array) -> Array:
    """Middle (novel) views [1:-1]; all views when the stack has no middle
    (v <= 2, e.g. pure 2-view training without target splicing)."""
    return x[:, 1:-1] if x.shape[1] > 2 else x


def mse_loss(pred_color: Array, target: Array) -> Array:
    """pred/target: (b, v, h, w, 3); middle views only."""
    delta = _middle(pred_color) - _middle(target)
    return jnp.mean(delta**2)


def ssim_loss(pred_color: Array, target: Array) -> Array:
    b, v, h, w, c = pred_color.shape
    p = _middle(pred_color).reshape(-1, h, w, c)
    t = _middle(target).reshape(-1, h, w, c)
    return 1.0 - ssim(p, t)


def lpips_loss(lpips_fn, pred_color: Array, target: Array,
               step: Array, apply_after_step: int) -> Array:
    b, v, h, w, c = pred_color.shape
    p = _middle(pred_color).reshape(-1, h, w, c)
    t = _middle(target).reshape(-1, h, w, c)
    val = lpips_fn(p, t).mean()
    return jnp.where(step >= apply_after_step, val, 0.0)


def project_to_other_image(
    xy: Array,         # (..., n, 2) normalized pixel coords in view i
    depth: Array,      # (..., n) depth in view i
    k_i: Array,        # (..., 3, 3) normalized intrinsics view i
    k_j: Array,
    rel: Array,        # (..., 4, 4) cam_i -> cam_j transform
    eps: float = 1e-8,
) -> Array:
    """Reproject view-i pixels into view-j normalized coords
    (reference `batch_project_to_other_img`, `src/flow_util.py:195`)."""
    ones = jnp.ones_like(xy[..., :1])
    homo = jnp.concatenate([xy, ones], axis=-1)
    pts_i = jnp.einsum("...ij,...nj->...ni", intrinsics_inverse(k_i), homo)
    pts_i = pts_i * depth[..., None]
    pts_j = (
        jnp.einsum("...ij,...nj->...ni", rel[..., :3, :3], pts_i)
        + rel[..., None, :3, 3]
    )
    proj = jnp.einsum("...ij,...nj->...ni", k_j, pts_j)
    return proj[..., :2] / jnp.maximum(proj[..., 2:], eps)


def pose_loss(
    enc: EncoderOutput,
    intrinsics: Array,  # (b, v, 3, 3) context intrinsics
    cfg: LossCfg,
) -> Array:
    """Confidence-weighted 3D + 2D correspondence residuals vs refined poses."""
    b, v = enc.depths.shape[:2]
    h, w = enc.depths.shape[2:]
    pair_i, pair_j = view_pairs(v)
    corr = enc.correspondences
    refined = enc.refined_poses  # (b, v, 4, 4) w2c in view-0 frame

    total_3d = 0.0
    total_2d = 0.0
    for p, (i, j) in enumerate(zip(pair_i, pair_j)):
        # relative transform cam_i -> cam_j from refined absolute poses
        rel = jnp.einsum(
            "bij,bjk->bik",
            refined[:, j],
            jnp.linalg.inv(refined[:, i]),
        )

        def lookup(view, kpts, arr):
            xi = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, h - 1)
            flat = arr[:, view].reshape(b, h * w, -1)
            return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

        xyz_i = lookup(i, corr.kpts0[:, p], enc.xyz)       # (b, m, 3)
        xyz_j = lookup(j, corr.kpts1[:, p], enc.xyz)
        wgt = jnp.where(corr.valid[:, p], corr.scores[:, p], 0.0)
        wgt = wgt / jnp.maximum(wgt.sum(-1, keepdims=True), 1e-8)

        # 3D: |R x_i + t - x_j|, confidence-weighted
        pred = (
            jnp.einsum("bij,bmj->bmi", rel[:, :3, :3], xyz_i)
            + rel[:, None, :3, 3]
        )
        diff3d = jnp.linalg.norm(pred - xyz_j + 1e-12, axis=-1)
        total_3d = total_3d + (wgt * diff3d).sum(-1).mean()

        # 2D: huber on reprojection error in normalized coords
        xy_i = corr.kpts0[:, p] / jnp.asarray([w, h], enc.depths.dtype)
        xy_j = corr.kpts1[:, p] / jnp.asarray([w, h], enc.depths.dtype)
        depth_i = lookup(i, corr.kpts0[:, p], enc.depths[..., None])[..., 0]
        reproj = project_to_other_image(
            xy_i, depth_i, intrinsics[:, i], intrinsics[:, j], rel
        )
        err = jnp.linalg.norm(reproj - xy_j + 1e-12, axis=-1)
        delta = 0.01
        huber = jnp.where(
            err <= delta, 0.5 * err**2, delta * (err - 0.5 * delta)
        ) / delta
        masked = jnp.where(corr.valid[:, p], huber, 0.0)
        total_2d = total_2d + masked.sum(-1).mean()

    n_pairs = len(pair_i)
    return (
        cfg.pose_weight_3d * total_3d / n_pairs
        + cfg.pose_weight_2d * total_2d / n_pairs
    )


def total_loss(
    cfg: LossCfg,
    pred_color: Array,
    target: Array,
    enc: EncoderOutput,
    context_intrinsics: Array,
    step: Array,
    lpips_fn=None,
) -> tuple[Array, dict]:
    losses = {
        "mse": cfg.mse_weight * mse_loss(pred_color, target),
        "ssim": cfg.ssim_weight * ssim_loss(pred_color, target),
        "pose": pose_loss(enc, context_intrinsics, cfg),
    }
    if lpips_fn is not None:
        losses["lpips"] = cfg.lpips_weight * lpips_loss(
            lpips_fn, pred_color, target, step, cfg.lpips_apply_after_step
        )
    total = sum(losses.values())
    return total, losses
