"""DINOv2 ViT (Flax), the frozen backbone inside UniDepth-V2.

Mirrors the reference's vendored DINOv2
(`src/model/unidepth/backbones/dinov2.py`, `backbones/metadinov2/`): patch-14
embedding, cls token, bicubically interpolated position embeddings
(`dinov2.py:273-274`), pre-norm transformer blocks with LayerScale, and
multi-layer feature taps. Parameter layout is designed for 1:1 torch
checkpoint conversion (see `weight_convert.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTCfg:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    # UniDepth's DINOv2 uses init_values=1.0 (`dinov2.py:411` in the
    # vendored `_make_dinov2_model`); converted checkpoints overwrite this.
    layerscale_init: float = 1.0
    pos_embed_size: int = 37  # 518/14 grid side of the pretrained embedding
    # apply the final LayerNorm to every tapped layer (vendored
    # `dinov2.py:327-328` with use_norm=True, UniDepth's configuration)
    use_norm: bool = True

    @staticmethod
    def vit_large() -> "ViTCfg":
        return ViTCfg()

    @staticmethod
    def tiny_test() -> "ViTCfg":
        return ViTCfg(patch_size=14, embed_dim=64, depth=4, num_heads=4,
                      pos_embed_size=8)


class Block(nn.Module):
    cfg: ViTCfg

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.cfg
        d = c.embed_dim
        ls = nn.initializers.constant(c.layerscale_init)

        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="attn_qkv")(y)
        b, n, _ = y.shape
        qkv = qkv.reshape(b, n, 3, c.num_heads, d // c.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # (b, h, n, hd) layout: dispatches to the Pallas flash kernel at
        # production token counts (UniDepth's shape constraint puts 256^2
        # inputs at 2400+ patches — materialized (b,16,n,n) logits were
        # ~5.5 GB of HBM traffic per block, the forward step's largest
        # single cost), einsum below the flash threshold (CPU tests, tiny
        # configs). Replaces the reference's xformers memory_efficient
        # path (`backbones/metadinov2/attention.py:20`).
        from ..layers import scaled_dot_attention

        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out = scaled_dot_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = nn.Dense(d, name="attn_proj")(out)
        gamma1 = self.param("ls1_gamma", ls, (d,))
        x = x + gamma1 * out

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(d * c.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default (erf)
        y = nn.Dense(d, name="mlp_fc2")(y)
        gamma2 = self.param("ls2_gamma", ls, (d,))
        return x + gamma2 * y


class DINOv2(nn.Module):
    """Returns, for each layer index in `out_layers`, the patch tokens as a
    (b, hp, wp, dim) map and the cls token as (b, 1, dim).

    When `cfg.use_norm` the final LayerNorm is applied to every tapped
    layer's full token sequence before splitting (vendored
    `dinov2.py:327-331` with use_norm=True — UniDepth's configuration,
    where cls taps too are taken post-norm)."""

    cfg: ViTCfg
    out_layers: Sequence[int] = (11, 23)

    @nn.compact
    def __call__(self, image: Array) -> tuple[list[Array], list[Array]]:
        """image: (b, h, w, 3), h/w divisible by patch_size."""
        c = self.cfg
        b, h, w, _ = image.shape
        p = c.patch_size
        hp, wp = h // p, w // p

        x = nn.Conv(
            c.embed_dim, (p, p), strides=(p, p), name="patch_embed"
        )(image)
        x = x.reshape(b, hp * wp, c.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, c.pos_embed_size * c.pos_embed_size + 1, c.embed_dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (hp, wp) != (c.pos_embed_size, c.pos_embed_size):
            # Bicubic grid interpolation, torch-parity (vendored
            # `dinov2.py:262-296` with interpolate_offset=0 => size=(hp, wp),
            # align_corners=False, antialias=False). `interp_matrix`
            # reproduces torch's kernel exactly; jax.image.resize does not.
            from .unidepth_layers import interp_matrix

            grid = patch_pos.reshape(
                1, c.pos_embed_size, c.pos_embed_size, c.embed_dim
            )
            ah = jnp.asarray(interp_matrix(c.pos_embed_size, hp, "bicubic"))
            aw = jnp.asarray(interp_matrix(c.pos_embed_size, wp, "bicubic"))
            grid = jnp.einsum("Hh,bhwc->bHwc", ah, grid)
            grid = jnp.einsum("Ww,bhwc->bhWc", aw, grid)
            patch_pos = grid.reshape(1, hp * wp, c.embed_dim)
        x = x + patch_pos
        cls_tok = jnp.broadcast_to(cls + cls_pos, (b, 1, c.embed_dim))
        x = jnp.concatenate([cls_tok, x], axis=1)

        norm = nn.LayerNorm(name="norm") if c.use_norm else (lambda y: y)
        patch_taps: list[Array] = []
        cls_taps: list[Array] = []
        for i in range(c.depth):
            x = Block(c, name=f"block_{i}")(x)
            if i in self.out_layers:
                out = norm(x)
                cls_taps.append(out[:, :1])
                patch_taps.append(
                    out[:, 1:].reshape(b, hp, wp, c.embed_dim)
                )
        return patch_taps, cls_taps
