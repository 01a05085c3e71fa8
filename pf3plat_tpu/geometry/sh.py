"""Real spherical harmonics: evaluation (degree <= 4) and rotation, pure JAX.

Replaces two native/external pieces of the reference:
  * SH -> RGB evaluation inside the CUDA rasterizer
    (`diff-gaussian-rasterization`, used at `src/model/decoder/cuda_splatting.py:117-124`);
  * e3nn `wigner_D` SH rotation (`src/misc/sh_rotation.py:10-37`).

Rotation design (TPU-first): rather than Euler-angle Wigner-D recurrences,
each degree-l rotation matrix D_l(R) is recovered exactly from the identity
  basis_l(R @ d) = D_l @ basis_l(d)
by evaluating the (2l+1) degree-l basis polynomials at a fixed set of sample
directions and solving the (precomputed-pseudoinverse) linear system. This is
exact (the basis spans itself under rotation), branch-free, batched over
arbitrary leading dims, and costs one small matmul per degree.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MAX_DEGREE = 4

# Standard real-SH normalization constants (unit-vector inputs).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, 1.0925484305920792, 0.31539156525252005,
       1.0925484305920792, 0.5462742152960396)
_C3 = (0.5900435899266435, 2.890611442640554, 0.4570457994644658,
       0.3731763325901154, 0.4570457994644658, 1.445305721320277,
       0.5900435899266435)
_C4 = (2.5033429417967046, 1.7701307697799304, 0.9461746957575601,
       0.6690465435572892, 0.10578554691520431, 0.6690465435572892,
       0.47308734787878004, 1.7701307697799304, 0.6258357354491761)


def _basis_components(x, y, z, degree: int, xp):
    """Basis polynomials in any array namespace (jnp on device, np on host)."""
    out = [xp.full_like(x, _C0)]
    if degree >= 1:
        out += [_C1 * y, _C1 * z, _C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            _C2[0] * x * y,
            _C2[1] * y * z,
            _C2[2] * (3 * zz - 1),
            _C2[3] * x * z,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * x * y * z,
            _C3[2] * y * (5 * zz - 1),
            _C3[3] * z * (5 * zz - 3),
            _C3[4] * x * (5 * zz - 1),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree >= 4:
        out += [
            _C4[0] * x * y * (xx - yy),
            _C4[1] * y * z * (3 * xx - yy),
            _C4[2] * x * y * (7 * zz - 1),
            _C4[3] * y * z * (7 * zz - 3),
            _C4[4] * (35 * zz * zz - 30 * zz + 3),
            _C4[5] * x * z * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1),
            _C4[7] * x * z * (xx - 3 * yy),
            _C4[8] * (xx * xx - 6 * xx * yy + yy * yy),
        ]
    return xp.stack(out, axis=-1)


def sh_basis(directions: Array, degree: int) -> Array:
    """Evaluate the real SH basis at unit directions.

    directions: (..., 3) unit vectors. Returns (..., (degree+1)**2) ordered
    (l, m) with m = -l..l, matching the rotation operator below.
    """
    return _basis_components(
        directions[..., 0], directions[..., 1], directions[..., 2], degree, jnp
    )


def eval_sh(sh: Array, directions: Array, degree: int) -> Array:
    """Color from SH coefficients: (..., c, n) coeffs, (..., 3) unit dirs.

    Returns (..., c). The rasterizer applies the 3DGS `+0.5` offset and
    clamp itself.
    """
    basis = sh_basis(directions, degree)
    return jnp.einsum("...cn,...n->...c", sh, basis)


@lru_cache(maxsize=8)
def _sample_dirs_and_pinv(degree: int) -> tuple[np.ndarray, tuple[np.ndarray, ...]]:
    """Fixed quasi-uniform sample directions + per-degree basis pseudoinverses.

    Host-side (numpy, float64) precomputation, cached per degree.
    """
    n = 64
    # Fibonacci sphere: well-spread deterministic unit directions.
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    dirs = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )
    basis = _basis_components(
        dirs[:, 0], dirs[:, 1], dirs[:, 2], degree, np
    ).astype(np.float64)
    pinvs = []
    for l in range(degree + 1):
        bt = basis[:, l * l : (l + 1) * (l + 1)]  # B^T, shape (n, 2l+1)
        # pinv(B^T)^T = pinv(B), shape (n, 2l+1): right-inverse of B (m x n).
        pinvs.append(np.linalg.pinv(bt).T)
    return dirs, tuple(pinvs)


def sh_rotation_matrices(rotations: Array, degree: int) -> list[Array]:
    """Per-degree real-SH rotation (Wigner-D) matrices for (..., 3, 3) rotations.

    Returns a list of (..., 2l+1, 2l+1) matrices, l = 0..degree, such that
    sh_basis(R @ d)[l-block] == D_l @ sh_basis(d)[l-block].
    """
    dirs_np, pinvs_np = _sample_dirs_and_pinv(degree)
    dirs = jnp.asarray(dirs_np, rotations.dtype)  # (n, 3)
    rotated = jnp.einsum("...ij,nj->...ni", rotations, dirs)  # (..., n, 3)
    basis_rot = sh_basis(rotated, degree)  # (..., n, (deg+1)^2)
    mats = []
    for l in range(degree + 1):
        pinv = jnp.asarray(pinvs_np[l], rotations.dtype)  # pinv(B), (n, 2l+1)
        block = basis_rot[..., l * l : (l + 1) * (l + 1)]  # B_rot^T, (..., n, 2l+1)
        # D = B_rot @ pinv(B): (..., 2l+1, 2l+1)
        mats.append(jnp.einsum("...ni,nk->...ik", block, pinv))
    return mats


def rotate_sh(sh: Array, rotations: Array, degree: int) -> Array:
    """Rotate SH coefficient vectors (..., n) by (..., 3, 3) rotations.

    Mirrors reference `rotate_sh` (`src/misc/sh_rotation.py:10-37`), but is
    exactly consistent with `sh_basis`/`eval_sh` by construction and needs no
    determinant fallback (any orthonormal input yields an exact solve).
    """
    mats = sh_rotation_matrices(rotations, degree)
    out = []
    for l in range(degree + 1):
        block = sh[..., l * l : (l + 1) * (l + 1)]
        out.append(jnp.einsum("...ij,...j->...i", mats[l], block))
    return jnp.concatenate(out, axis=-1)
