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
    """Weights mirror the reference config of record:
    `config/loss/pose.yaml` (2d 0.005 / 3d 0.025) and
    `config/experiment/re10k.yaml:31-34` (lpips 0.1 from step 0).

    `pose_weight_rel` supervises the same residuals under the COARSE
    pairwise poses. The reference computes this branch
    (`loss_pose.py:57-66,96-125` builds loss_rel_list / loss_rel_2d_list)
    but its return statement drops it (`loss_pose.py:127-131` sums only the
    abs lists), so the default here is 0.0 — matching the reference's
    actual training signal while keeping the branch available.
    """

    mse_weight: float = 1.0
    ssim_weight: float = 0.1
    lpips_weight: float = 0.1
    lpips_apply_after_step: int = 0
    pose_weight_2d: float = 0.005
    pose_weight_3d: float = 0.025
    pose_weight_rel: float = 0.0


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
    """Confidence-weighted 3D + 2D correspondence residuals.

    Mirrors reference `Losspose.forward` (`src/loss/loss_pose.py:28-131`):
    3D point-alignment residuals are match-score weighted (L1-normalized,
    `:83,:121`) and multiplied by the per-pair transformation confidence
    (`:124`); 2D reprojection Huber residuals are summed per pair (`:96-103`).
    Residuals are evaluated under the refined absolute poses, and — when
    `pose_weight_rel` > 0 — additionally under the coarse pairwise poses
    (the reference computes that branch at `:66,:97,:113,:122` but drops it
    in the return, `:127-131`).
    """
    b, v = enc.depths.shape[:2]
    h, w = enc.depths.shape[2:]
    pair_i, pair_j = view_pairs(v)
    corr = enc.correspondences
    refined = enc.refined_poses  # (b, v, 4, 4) w2c in view-0 frame

    total_3d = 0.0
    total_2d = 0.0
    total_rel = 0.0
    for p, (i, j) in enumerate(zip(pair_i, pair_j)):
        # relative transform cam_i -> cam_j from refined absolute poses
        rel_abs = jnp.einsum(
            "bij,bjk->bik",
            refined[:, j],
            jnp.linalg.inv(refined[:, i]),
        )
        rel_coarse = enc.pairwise_poses[:, p]
        conf_ij = enc.pair_confidences[:, p]  # (b,)

        def lookup(view, kpts, arr):
            xi = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, h - 1)
            flat = arr[:, view].reshape(b, h * w, -1)
            return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

        xyz_i = lookup(i, corr.kpts0[:, p], enc.xyz)       # (b, m, 3)
        xyz_j = lookup(j, corr.kpts1[:, p], enc.xyz)
        wgt = jnp.where(corr.valid[:, p], corr.scores[:, p], 0.0)
        wgt = wgt / jnp.maximum(wgt.sum(-1, keepdims=True), 1e-8)

        xy_i = corr.kpts0[:, p] / jnp.asarray([w, h], enc.depths.dtype)
        xy_j = corr.kpts1[:, p] / jnp.asarray([w, h], enc.depths.dtype)
        depth_i = lookup(i, corr.kpts0[:, p], enc.depths[..., None])[..., 0]

        def residuals(rel):
            # 3D: |R x_i + t - x_j|, match-score weighted
            pred = (
                jnp.einsum("bij,bmj->bmi", rel[:, :3, :3], xyz_i)
                + rel[:, None, :3, 3]
            )
            diff3d = jnp.linalg.norm(pred - xyz_j + 1e-12, axis=-1)
            loss3d = (conf_ij * (wgt * diff3d).sum(-1)).mean()

            # 2D: huber on reprojection error in normalized coords
            reproj = project_to_other_image(
                xy_i, depth_i, intrinsics[:, i], intrinsics[:, j], rel
            )
            err = jnp.linalg.norm(reproj - xy_j + 1e-12, axis=-1)
            delta = 0.01
            huber = jnp.where(
                err <= delta, 0.5 * err**2, delta * (err - 0.5 * delta)
            ) / delta
            masked = jnp.where(corr.valid[:, p], huber, 0.0)
            loss2d = masked.sum(-1).mean()
            return loss3d, loss2d

        abs3d, abs2d = residuals(rel_abs)
        total_3d = total_3d + abs3d
        total_2d = total_2d + abs2d
        if cfg.pose_weight_rel > 0.0:
            rel3d, rel2d = residuals(rel_coarse)
            total_rel = total_rel + (
                cfg.pose_weight_3d * rel3d + cfg.pose_weight_2d * rel2d
            )

    n_pairs = len(pair_i)
    total = (
        cfg.pose_weight_3d * total_3d / n_pairs
        + cfg.pose_weight_2d * total_2d / n_pairs
    )
    if cfg.pose_weight_rel > 0.0:
        total = total + cfg.pose_weight_rel * total_rel / n_pairs
    return total


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
