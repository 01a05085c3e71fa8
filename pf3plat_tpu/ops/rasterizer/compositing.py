"""Alpha-compositing math shared by all rasterizer implementations.

Front-to-back 3DGS compositing, reformulated without a sequential per-gaussian
loop: with s_i = log(1 - alpha_i), the transmittance before gaussian i is
T_i = T_in * exp(sum_{j<i} s_j), so one (exclusive) cumulative sum along the
depth-sorted gaussian axis yields every per-gaussian weight w_i = T_i alpha_i
at once, and the color accumulation sum_i w_i c_i becomes a matmul that XLA
places on the MXU. The reference CUDA kernel's early-exit (stop before a
gaussian would push T below 1e-4) is reproduced exactly with a validity mask
on the inclusive cumulative transmittance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import RasterizeConfig

Array = jax.Array


def gaussian_alpha(
    px: Array,       # (..., p) pixel x coords
    py: Array,       # (..., p) pixel y coords
    xy: Array,       # (..., g, 2) gaussian centers
    conic: Array,    # (..., g, 3)
    opacity: Array,  # (..., g)
    valid: Array,    # (..., g) bool
    config: RasterizeConfig,
) -> Array:
    """Per (pixel, gaussian) alpha: (..., p, g). Matches the CUDA kernel's
    power/alpha computation including the 0.99 clamp and 1/255 cutoff."""
    dx = px[..., :, None] - xy[..., None, :, 0]
    dy = py[..., :, None] - xy[..., None, :, 1]
    ca = conic[..., None, :, 0]
    cb = conic[..., None, :, 1]
    cc = conic[..., None, :, 2]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = opacity[..., None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, config.alpha_clamp)
    keep = valid[..., None, :] & (power <= 0.0) & (alpha >= config.alpha_min)
    return jnp.where(keep, alpha, 0.0)


def composite_chunk(
    alpha: Array,      # (..., p, g) depth-ordered chunk
    color: Array,      # (..., g, c)
    t_carry: Array,    # (..., p) incoming transmittance
    accum: Array,      # (..., p, c) incoming accumulated color
    config: RasterizeConfig,
) -> tuple[Array, Array]:
    """Composite one depth-ordered chunk of gaussians into all pixels."""
    s = jnp.log1p(-alpha)  # <= 0; finite because alpha <= 0.99
    incl = jnp.cumsum(s, axis=-1)
    t_after = t_carry[..., None] * jnp.exp(incl)
    # CUDA early-exit: a gaussian whose contribution would push T below the
    # threshold is skipped and compositing stops.
    alive = t_after >= config.transmittance_min
    t_before = t_carry[..., None] * jnp.exp(incl - s)
    weight = jnp.where(alive, t_before * alpha, 0.0)
    accum = accum + jnp.einsum("...pg,...gc->...pc", weight, color)
    t_carry = t_carry * jnp.exp(jnp.sum(jnp.where(alive, s, 0.0), axis=-1))
    return t_carry, accum
