"""Evaluation metrics: PSNR / SSIM / LPIPS + pose errors.

Mirrors `src/evaluation/metrics.py:11-52` and the pose metrics computed in
`src/model/model_wrapper.py:306-359`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.transforms import geodesic_distance, translation_angle
from ..ops.ssim import ssim as _ssim

Array = jax.Array


def compute_psnr(ground_truth: Array, predicted: Array) -> Array:
    """Images in [0, 1], any matching shape; per-image PSNR over last 3 dims."""
    gt = jnp.clip(ground_truth, 0.0, 1.0)
    pr = jnp.clip(predicted, 0.0, 1.0)
    mse = jnp.mean((gt - pr) ** 2, axis=(-3, -2, -1))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def compute_ssim(ground_truth: Array, predicted: Array) -> Array:
    """(b, h, w, c) images -> per-image SSIM."""
    return _ssim(ground_truth, predicted, size_average=False)


def pose_errors(pred_c2w: Array, gt_c2w: Array) -> dict:
    """Rotation geodesic (deg), translation norm, translation angle (deg)
    for the first->last context pair, as in `model_wrapper.py:329-359`."""
    def rel(m):
        return jnp.einsum(
            "...ij,...jk->...ik",
            jnp.linalg.inv(m[..., -1, :, :]),
            m[..., 0, :, :],
        )

    rp = rel(pred_c2w)
    rg = rel(gt_c2w)
    rot_deg = jnp.degrees(geodesic_distance(rp[..., :3, :3], rg[..., :3, :3]))
    t_norm = jnp.linalg.norm(rp[..., :3, 3] - rg[..., :3, 3], axis=-1)
    t_angle = jnp.degrees(translation_angle(rp[..., :3, 3], rg[..., :3, 3]))
    return {"rot_deg": rot_deg, "trans_norm": t_norm, "trans_angle_deg": t_angle}


def pose_auc(errors, thresholds=(5.0, 10.0, 20.0)) -> dict:
    """Pose AUC at degree thresholds (host-side, over the whole eval set).

    The PF3plat paper's pose metric (AUC@5/10/20 of max(rotation,
    translation-angle) error) — the standard relative-pose formulation
    (exact integral of the recall curve over sorted errors). The reference
    repo computes only per-example angular errors; the AUC aggregation
    lives in its paper-side tooling, so it is reimplemented here from the
    standard definition.
    """
    import numpy as np

    errors = np.sort(np.asarray(errors, dtype=np.float64))
    n = len(errors)
    out = {}
    for t in thresholds:
        if n == 0:
            out[f"auc_{t:g}"] = 0.0
            continue
        recall = (np.arange(n) + 1) / n
        e = np.concatenate(([0.0], errors))
        r = np.concatenate(([0.0], recall))
        last = int(np.searchsorted(e, t))  # >= 1 since e[0] = 0 < t
        e_c = np.concatenate((e[:last], [t]))
        r_c = np.concatenate((r[:last], [r[last - 1]]))
        out[f"auc_{t:g}"] = float(np.trapezoid(r_c, x=e_c) / t)
    return out
