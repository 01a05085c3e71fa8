"""UniDepth-V2-style metric monocular depth (Flax).

Interface-parity replacement for the reference's frozen UniDepth-V2
(`src/model/unidepth/unidepthv2/unidepthv2.py:225-319`): given RGB (+
optional known intrinsics), returns metric depth, confidence, and the
multi-layer ViT features PF3plat consumes (two taps concatenated to 2048
channels for the `dino_projector`, `encoder_costvolume.py:255`).

The DINOv2 backbone (`dinov2.py`) matches the pretrained architecture for
checkpoint conversion. The decoder here is a compact convolutional fusion
head structured after UniDepth's decoder (multi-scale feature fusion ->
log-depth + confidence; camera conditioning via a FiLM embedding of the
normalized intrinsics) rather than a layer-for-layer port of the reference's
~7.7 kLoC decoder — converting the pretrained UniDepth decoder weights is
tracked for a later round; until then this head would need training (or the
pipeline accepts any metric depth source through `FrozenInputs`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .dinov2 import DINOv2, ViTCfg

Array = jax.Array


class DepthOutput(NamedTuple):
    depth: Array       # (b, h, w) metric depth
    confidence: Array  # (b, h, w)
    features: Array    # (b, hp, wp, 2 * embed_dim) concatenated ViT taps


@dataclasses.dataclass(frozen=True)
class UniDepthCfg:
    vit: ViTCfg = ViTCfg.vit_large()
    decoder_dim: int = 256
    min_depth: float = 0.1
    max_depth: float = 200.0


class DepthDecoder(nn.Module):
    cfg: UniDepthCfg

    @nn.compact
    def __call__(self, taps: list[Array], intr_embed: Array,
                 image_shape: tuple[int, int]) -> tuple[Array, Array]:
        c = self.cfg
        h, w = image_shape
        b, hp, wp, _ = taps[0].shape

        fused = 0.0
        for t, tap in enumerate(taps):
            fused = fused + nn.Dense(c.decoder_dim, name=f"tap_{t}")(tap)
        # FiLM camera conditioning (UniDepth conditions depth on intrinsics).
        scale = nn.Dense(c.decoder_dim, name="film_scale")(intr_embed)
        shift = nn.Dense(c.decoder_dim, name="film_shift")(intr_embed)
        x = fused * (1.0 + scale[:, None, None]) + shift[:, None, None]

        for i in range(2):
            x = nn.Conv(c.decoder_dim, (3, 3), name=f"conv_{i}")(x)
            x = nn.gelu(x)
            bh, hh, ww, ch = x.shape
            x = jax.image.resize(x, (bh, hh * 2, ww * 2, ch), "bilinear")
        out = nn.Conv(2, (3, 3), name="head")(x)
        out = jax.image.resize(out, (b, h, w, 2), "bilinear")
        log_depth, conf = out[..., 0], out[..., 1]
        lo, hi = jnp.log(c.min_depth), jnp.log(c.max_depth)
        depth = jnp.exp(lo + jax.nn.sigmoid(log_depth) * (hi - lo))
        return depth, jax.nn.sigmoid(conf)


class UniDepth(nn.Module):
    cfg: UniDepthCfg = UniDepthCfg()

    @nn.compact
    def __call__(self, image: Array, intrinsics: Array) -> DepthOutput:
        """image: (b, h, w, 3) in [0, 1]; intrinsics: (b, 3, 3) normalized."""
        c = self.cfg
        b, h, w, _ = image.shape
        p = c.vit.patch_size
        # Pad to patch multiple (UniDepth resizes; padding keeps it simple
        # and static).
        hp = -(-h // p) * p
        wp = -(-w // p) * p
        mean = jnp.asarray([0.485, 0.456, 0.406], image.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], image.dtype)
        x = (image - mean) / std
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

        out_layers = (
            (c.vit.depth // 2 - 1, c.vit.depth - 1)
        )
        taps = DINOv2(c.vit, out_layers=out_layers, name="backbone")(x)

        intr_flat = intrinsics.reshape(b, 9)
        intr_embed = nn.Dense(c.decoder_dim, name="intr_embed")(intr_flat)
        depth, conf = DepthDecoder(c, name="decoder")(
            taps, intr_embed, (hp, wp)
        )
        features = jnp.concatenate(taps, axis=-1)
        return DepthOutput(
            depth=depth[:, :h, :w],
            confidence=conf[:, :h, :w],
            features=features,
        )
