"""LDM-style 2D U-Net with cross-view self-attention (Flax, NHWC).

Re-implements the reference's `UNetModel`
(`src/model/encoder/costvolume/ldm_unet/unet.py:607-1243`) in the
configuration PF3plat uses: ResBlocks (GroupNorm + SiLU, postnorm variant),
optional attention at configured downsample rates with the view axis folded
into the token axis (`unet.py:546-565` — each spatial token attends across
all views), conv down/upsampling, skip concatenation. No timestep embedding
(the reference's is commented out).

This module trains from scratch (not a converted checkpoint), so the
implementation is TPU-idiomatic NHWC rather than a layer-for-layer port.

Mixed precision: `dtype` sets the conv/attention COMPUTE dtype (params stay
f32). bfloat16 convs run single-pass on the MXU (~2x); GroupNorm statistics
are always computed in f32 (flax upcasts internally), the attention softmax
is taken in f32, and the module's output is cast back to the input dtype, so
the numerics-sensitive reductions keep full precision.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ResBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = None  # conv compute dtype (None -> input dtype)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        groups = min(self.groups, c_in, self.out_channels)
        h = nn.GroupNorm(num_groups=groups)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=groups)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class CrossViewAttention(nn.Module):
    """Self-attention over (v * h * w) tokens — the view axis is folded into
    the sequence so every pixel attends across views (`unet.py:546-565`)."""

    num_head_channels: int = 32
    num_views: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        vb, h, w, c = x.shape
        v = self.num_views
        b = vb // v
        heads = max(1, c // self.num_head_channels)
        head = c // heads

        y = nn.GroupNorm(num_groups=min(32, c))(x)
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype)(y)
        # (v b, h, w, 3c) -> (b, v*h*w, 3c); reference layout is (v b).
        qkv = qkv.reshape(v, b, h * w, 3 * c).transpose(1, 0, 2, 3)
        qkv = qkv.reshape(b, v * h * w, 3, heads, head)
        q, k, v_ = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = head**-0.5
        from .layers import mxu_einsum

        sim = mxu_einsum("bihd,bjhd->bhij", q * scale, k)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        out = mxu_einsum("bhij,bjhd->bihd", attn.astype(v_.dtype), v_)
        out = out.reshape(b, v, h * w, c).transpose(1, 0, 2, 3).reshape(vb, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros)(out)
        return x + out


class UNetModel(nn.Module):
    model_channels: int
    out_channels: int
    num_res_blocks: int = 1
    attention_resolutions: Sequence[int] = ()
    channel_mult: Sequence[int] = (1, 1, 1)
    num_head_channels: int = 32
    num_views: int = 2
    # conv/attention compute dtype. None -> flax default promotion (the
    # compute dtype is the promotion of input and param dtypes — f32 for
    # f32 inputs/params, not f32 by fiat).
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (v*b, h, w, c_in) -> (v*b, h, w, out_channels)."""
        in_dtype = x.dtype
        ch = self.model_channels
        h = nn.Conv(ch, (3, 3), dtype=self.dtype)(x)
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * self.model_channels, dtype=self.dtype)(h)
                if ds in self.attention_resolutions:
                    h = CrossViewAttention(
                        self.num_head_channels, self.num_views,
                        dtype=self.dtype,
                    )(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            dtype=self.dtype)(h)
                skips.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], dtype=self.dtype)(h)
        if ds in self.attention_resolutions:
            h = CrossViewAttention(self.num_head_channels, self.num_views,
                                   dtype=self.dtype)(h)
        h = ResBlock(h.shape[-1], dtype=self.dtype)(h)

        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(mult * self.model_channels, dtype=self.dtype)(h)
                if ds in self.attention_resolutions:
                    h = CrossViewAttention(
                        self.num_head_channels, self.num_views,
                        dtype=self.dtype,
                    )(h)
                if level and i == self.num_res_blocks:
                    hh, ww = h.shape[1], h.shape[2]
                    h = jax.image.resize(
                        h, (h.shape[0], hh * 2, ww * 2, h.shape[3]), "nearest"
                    )
                    h = nn.Conv(h.shape[-1], (3, 3), dtype=self.dtype)(h)
                    ds //= 2

        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]))(h)
        h = nn.silu(h)
        out = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros)(h)
        # The output re-enters f32 pipeline stages (softmax PDFs, heads):
        # hand back the caller's dtype regardless of the compute dtype.
        return out.astype(in_dtype)
