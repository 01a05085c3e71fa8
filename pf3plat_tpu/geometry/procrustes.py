"""Weighted Procrustes (Umeyama/Kabsch) + soft RANSAC alignment, pure JAX.

Replaces the reference's external native dependency
`pytorch3d.ops.corresponding_points_alignment` (`src/flow_util.py:11,888-905`)
with a closed-form batched 3x3-SVD solve, and its `align_cpa_ransac`
(`src/flow_util.py:926-1004`) with a fixed-iteration, fully-jittable batched
RANSAC (Gumbel-top-k replaces `torch.multinomial` without-replacement
sampling; no data-dependent control flow, so it vmaps/shards cleanly).

Convention (matches pytorch3d): returns (R, t) such that  Q ~= P @ R + t
(row-vector convention). Use `transforms.make_rt` to get a column-vector
4x4 transform.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RigidTransform(NamedTuple):
    r: Array  # (..., 3, 3), row-vector convention: Q = P @ R + t
    t: Array  # (..., 3)


def weighted_kabsch(p: Array, q: Array, w: Array, eps: float = 1e-12) -> RigidTransform:
    """Weighted rigid alignment: find R, t minimizing sum_i w_i |p_i R + t - q_i|^2.

    p, q: (..., n, 3); w: (..., n). Fully batched; 3x3 SVD on the MXU-friendly
    covariance. Mirrors `kabsch_algorithm` (`src/flow_util.py:888-905`) minus
    the float64 cast (fp32 + careful centering is sufficient at these scales;
    tests compare against a float64 numpy oracle).
    """
    w = jnp.maximum(w, eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    mu_p = jnp.sum(w[..., None] * p, axis=-2, keepdims=True)
    mu_q = jnp.sum(w[..., None] * q, axis=-2, keepdims=True)
    pc = p - mu_p
    qc = q - mu_q
    # Covariance of the row-vector problem: C = sum w_i pc_i^T qc_i  (3x3).
    cov = jnp.einsum("...ni,...n,...nj->...ij", pc, w, qc)
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    s = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    # R = U diag(s) V^T for the row-vector convention Q = P @ R.
    r = jnp.einsum("...ij,...j,...jk->...ik", u, s, vt)
    t = (mu_q - jnp.einsum("...ni,...ij->...nj", mu_p, r))[..., 0, :]
    return RigidTransform(r, t)


def _gumbel_topk(key: Array, log_w: Array, k: int) -> Array:
    """Sample k indices without replacement, P(i) proportional to exp(log_w)."""
    g = jax.random.gumbel(key, log_w.shape, dtype=log_w.dtype)
    _, idx = jax.lax.top_k(log_w + g, k)
    return idx


def align_ransac(
    key: Array,
    p: Array,
    q: Array,
    weights: Array,
    n_hot: int = 3,
    n_samples: int = 128,
    threshold: float = 0.01,
) -> RigidTransform:
    """Soft RANSAC rigid alignment, jit-friendly with static iteration counts.

    Mirrors `align_cpa_ransac` (`src/flow_util.py:926-1004`) single-schedule
    path: sample `n_samples` minimal `n_hot`-subsets proportional to weights,
    fit each with weighted Kabsch, score with soft inliers exp(-|residual|/th),
    take the best hypothesis's inliers to reweight a final full Kabsch fit.

    p, q: (n, 3); weights: (n,). Vmap over batch/pairs at the call site.
    """
    n = p.shape[0]
    log_w = jnp.log(jnp.maximum(weights, 1e-12))
    keys = jax.random.split(key, n_samples)
    idx = jax.vmap(lambda k: _gumbel_topk(k, log_w, n_hot))(keys)  # (S, n_hot)

    p_s = p[idx]  # (S, n_hot, 3)
    q_s = q[idx]
    w_s = weights[idx]
    fits = weighted_kabsch(p_s, q_s, w_s)  # (S, 3, 3), (S, 3)

    # Soft inlier scores of every correspondence under every hypothesis.
    pred = jnp.einsum("ni,sij->snj", p, fits.r) + fits.t[:, None, :]  # (S, n, 3)
    delta = jnp.linalg.norm(pred - q[None], axis=-1)
    inliers = jnp.exp(-delta / threshold)  # (S, n)

    best = jnp.argmax(inliers.sum(axis=-1))
    best_inliers = inliers[best]

    # Reference renormalizes inliers to unit L2 then rescales by n
    # (`src/flow_util.py:987-989`).
    best_inliers = best_inliers / jnp.maximum(
        jnp.linalg.norm(best_inliers), 1e-12
    )
    best_inliers = jnp.maximum(best_inliers, 1e-7) * n
    return weighted_kabsch(p, q, weights * best_inliers)
