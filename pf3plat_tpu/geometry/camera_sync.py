"""Multi-view camera synchronization (chaining + spectral sync), pure JAX.

Re-implements the reference's `camera_chaining` (`src/flow_util.py:341-371`)
and `camera_synchronization` (`src/flow_util.py:623-743`) with dense, static
pair indexing instead of Python dicts, so everything jits and vmaps:

  * pairwise poses arrive as `(batch, P, 4, 4)` plus static `(i_idx, j_idx)`
    integer tuples (pair p maps view i -> view j);
  * the 4N x 4N confidence-weighted block matrix is built with one scatter;
  * the 2^squares matrix power runs as a fori_loop of squarings with
    per-squaring max-normalization (global scale cancels in the final
    mass division), replacing the reference's float64 cast
    (`flow_util.py:706-707`) which TPUs don't execute natively;
  * rotation blocks are reprojected to SO(3) by SVD.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .projection import se3_inverse
from .transforms import so3_project

Array = jax.Array


def camera_chaining(rel_poses: Array) -> Array:
    """Chain sequential pairwise poses into per-view transforms.

    rel_poses: (batch, N-1, 4, 4) where entry k maps view k -> view k+1.
    Returns (batch, N, 4, 4) where entry k maps view 0 -> view k
    (entry 0 is identity). Log-depth composition via associative_scan.
    """
    b, n_minus_1 = rel_poses.shape[:2]

    def combine(a, c):
        # prefix op: later matrices left-multiply earlier ones.
        return jnp.einsum("...ij,...jk->...ik", c, a)

    chained = jax.lax.associative_scan(combine, rel_poses, axis=1)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=rel_poses.dtype), (b, 1, 4, 4))
    return jnp.concatenate([eye, chained], axis=1)


def camera_synchronization(
    rel_poses: Array,
    confidence: Array,
    pair_i: Sequence[int],
    pair_j: Sequence[int],
    num_views: int,
    squares: int = 10,
    so3_projection: bool = True,
    center_first_camera: bool = True,
    fallback: Array | None = None,
) -> Array:
    """Confidence-weighted spectral synchronization of pairwise poses.

    Args:
      rel_poses: (batch, P, 4, 4); pose p maps view pair_i[p] -> pair_j[p].
      confidence: (batch, P) non-negative pairwise confidences.
      pair_i / pair_j: static pair index tuples, i != j, each view covered.
      num_views: N.
      squares: matrix squarings (matrix power 2**squares).
      fallback: optional (batch, N, 4, 4) used where the synchronized mass
        degenerates (reference falls back to chaining, `flow_util.py:723-725`).

    Returns (batch, N, 4, 4): transform view 0 -> view k (or N//2 -> k when
    `center_first_camera=False`).
    """
    n = num_views
    b, p = confidence.shape
    dtype = rel_poses.dtype
    i_idx = jnp.asarray(pair_i)
    j_idx = jnp.asarray(pair_j)

    # --- Column-stochastic confidence matrix (flow_util.py:659-680). ---
    conf = jnp.zeros((b, n, n), dtype)
    conf = conf.at[:, i_idx, j_idx].add(confidence)
    conf = conf.at[:, j_idx, i_idx].add(confidence)
    diag = jnp.zeros((b, n), dtype)
    diag = diag.at[:, i_idx].add(confidence / 2)
    diag = diag.at[:, j_idx].add(confidence / 2)
    conf = conf + jax.vmap(jnp.diag)(diag)
    conf = conf / jnp.maximum(conf.sum(axis=1, keepdims=True), 1e-9)

    # --- Assemble the 4N x 4N block matrix L (flow_util.py:682-697). ---
    blocks = jnp.zeros((b, n, n, 4, 4), dtype)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (b, n, 4, 4))
    diag_conf = jax.vmap(jnp.diagonal, in_axes=0)(
        jnp.swapaxes(conf, 1, 2)
    )  # (b, n) diagonal of conf
    blocks = blocks.at[:, jnp.arange(n), jnp.arange(n)].set(
        diag_conf[..., None, None] * eye
    )
    blocks = blocks.at[:, i_idx, j_idx].set(
        conf[:, i_idx, j_idx][..., None, None] * se3_inverse(rel_poses)
    )
    blocks = blocks.at[:, j_idx, i_idx].set(
        conf[:, j_idx, i_idx][..., None, None] * rel_poses
    )
    l_mat = blocks.transpose(0, 1, 3, 2, 4).reshape(b, 4 * n, 4 * n)

    # --- Matrix power by repeated squaring with scale renormalization. ---
    def body(_, m):
        m = jnp.einsum("bij,bjk->bik", m, m)
        scale = jnp.max(jnp.abs(m), axis=(1, 2), keepdims=True)
        return m / jnp.maximum(scale, 1e-30)

    l_mat = jax.lax.fori_loop(0, squares, body, l_mat)

    l_blocks = l_mat.reshape(b, n, 4, n, 4)
    anchor = 0 if center_first_camera else n // 2
    col = l_blocks[:, :, :, anchor, :]  # (b, n, 4, 4)

    mass = col[:, :, 3:, 3:]
    degenerate = jnp.min(mass, axis=(1, 2, 3)) <= 1e-20  # (b,)
    col = col / jnp.maximum(mass, 1e-9)

    if so3_projection:
        r = so3_project(col[:, :, :3, :3])
        col = col.at[:, :, :3, :3].set(r)

    if fallback is not None:
        col = jnp.where(degenerate[:, None, None, None], fallback, col)
    return col
