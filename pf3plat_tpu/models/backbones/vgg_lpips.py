"""VGG16 feature extractor + LPIPS perceptual distance (Flax, NHWC).

Replaces the reference's external `lpips` package (cuDNN convs;
`src/loss/loss_lpips.py:33`, `src/evaluation/metrics.py:22-33`): VGG16
conv stack up to conv5_3, unit-normalized activations at the five standard
taps, learned 1x1 linear calibration heads, spatial mean.

Weights come from the torch->flax converter (`weight_convert.py`); with
random weights the architecture still runs (used in tests), but metric
values are only meaningful with converted LPIPS weights.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# conv layers per VGG16 stage (channels, convs-per-stage)
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_IMAGENET_SHIFT = (-0.030, -0.088, -0.188)  # lpips normalization (on [-1,1])
_IMAGENET_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """Returns activations after the last ReLU of each of the 5 stages."""

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        taps = []
        for stage, (ch, n_convs) in enumerate(_STAGES):
            for i in range(n_convs):
                x = nn.Conv(ch, (3, 3), name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            taps.append(x)
            if stage < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """LPIPS(vgg): normalize inputs, diff unit-normalized features, 1x1 heads."""

    @nn.compact
    def __call__(self, img0: Array, img1: Array, normalize: bool = True) -> Array:
        """img0, img1: (b, h, w, 3). normalize=True expects [0,1] inputs.
        Returns (b,) distances."""
        if normalize:  # [0,1] -> [-1,1]
            img0 = 2 * img0 - 1
            img1 = 2 * img1 - 1
        shift = jnp.asarray(_IMAGENET_SHIFT, img0.dtype)
        scale = jnp.asarray(_IMAGENET_SCALE, img0.dtype)
        img0 = (img0 - shift) / scale
        img1 = (img1 - shift) / scale

        vgg = VGG16Features(name="vgg")
        f0 = vgg(img0)
        f1 = vgg(img1)

        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            diff = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}",
                kernel_init=nn.initializers.constant(0.1),
            )(diff)
            total = total + w.mean(axis=(1, 2, 3))
        return total
