"""SSIM (gaussian-window) in pure JAX, NHWC.

Matches the reference training loss's SSIM (`src/loss/loss_multissim.py:44-84`:
11x11 gaussian window, sigma 1.5, same-padding depthwise convs) and is reused
by the eval metric (the reference uses skimage there with the same window —
`src/evaluation/metrics.py:36-52`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_blur(x: Array, window: Array) -> Array:
    """Same-padding depthwise 2D conv, NHWC."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(
        window[:, :, None, None], (*window.shape, 1, c)
    )
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: Array,
    img2: Array,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
    size_average: bool = True,
) -> Array:
    """img1, img2: (b, h, w, c) in [0, 1]. Returns scalar (or per-image)."""
    window = jnp.asarray(_gaussian_window(window_size, sigma), img1.dtype)
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
