"""Brute-force O(pixels x gaussians) rasterizer — correctness oracle.

Composites every gaussian into every pixel with a global depth sort (no tile
binning, no capacity limits). Memory/compute scale as pixels*gaussians, so
this is for tests and tiny scenes only; the production paths are `tiled.py`
(XLA) and the Pallas kernels. Plays the role of the reference's
`src/scripts/test_splatter.py` analytic sanity path, but as a real oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import tile_bounds
from .compositing import composite_chunk, gaussian_alpha
from .types import RasterizeConfig, ScreenGaussians

Array = jax.Array


def composite_bruteforce(
    screen: ScreenGaussians,
    image_shape: tuple[int, int],
    background: Array,  # (c,)
    config: RasterizeConfig,
) -> Array:
    """Single-camera compositing of (n,)-shaped ScreenGaussians -> (h, w, c)."""
    h, w = image_shape
    channels = screen.color.shape[-1]

    # Global front-to-back order; invalid gaussians sort to the back.
    order = jnp.argsort(jnp.where(screen.valid, screen.depth, jnp.inf))
    order = jax.lax.stop_gradient(order)
    xy = screen.xy[order]
    conic = screen.conic[order]
    color = screen.color[order]
    opacity = screen.opacity[order]
    valid = screen.valid[order] & (screen.radius[order] > 0)

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    px = (xs.reshape(-1) + 0.5).astype(screen.xy.dtype)
    py = (ys.reshape(-1) + 0.5).astype(screen.xy.dtype)

    alpha = gaussian_alpha(px, py, xy, conic, opacity, valid, config)  # (p, n)

    # Tile-granular footprint cutoff, identical to the binned paths (and to
    # the CUDA rasterizer): a gaussian touches a pixel iff the pixel's tile
    # lies inside the gaussian's clamped tile AABB.
    bounds = tile_bounds(screen, image_shape, config)
    tx0, ty0 = bounds.tx0[order], bounds.ty0[order]
    tw, th = bounds.tw[order], bounds.th[order]
    ptx = (xs.reshape(-1) // config.tile_size).astype(jnp.int32)
    pty = (ys.reshape(-1) // config.tile_size).astype(jnp.int32)
    in_tile = (
        (ptx[:, None] >= tx0[None, :])
        & (ptx[:, None] < tx0[None, :] + tw[None, :])
        & (pty[:, None] >= ty0[None, :])
        & (pty[:, None] < ty0[None, :] + th[None, :])
    )
    alpha = jnp.where(in_tile, alpha, 0.0)

    t0 = jnp.ones((h * w,), screen.xy.dtype)
    accum0 = jnp.zeros((h * w, channels), screen.xy.dtype)
    t, accum = composite_chunk(alpha, color, t0, accum0, config)
    out = accum + t[:, None] * background[None, :]
    return out.reshape(h, w, channels)
