"""Multi-view swin-style windowed self-attention transformer (Flax, NHWC).

Re-implements the reference `MultiViewFeatureTransformer`
(`src/model/encoder/multiview_transformer.py:513-609`) as used by PF3plat:
self-attention only (`no_cross_attn=True`, `encoder_costvolume.py:73`),
single head, window (swin) attention with `attn_splits` splits per side and
half-window shift on odd layers, followed by a [x, message]-gated FFN.

TPU notes: windows become batch dims via reshape/transpose (free layout
ops), attention runs on (windows, tokens, tokens) blocks that XLA maps to
the MXU, and the shifted-window mask is precomputed on host as a constant.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import mxu_einsum

Array = jax.Array


def split_windows(x: Array, splits: int) -> Array:
    """(b, h, w, c) -> (b*splits*splits, h/s, w/s, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, splits, h // splits, splits, w // splits, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * splits * splits, h // splits, w // splits, c)


def merge_windows(x: Array, splits: int) -> Array:
    """Inverse of `split_windows`."""
    bs, hw, ww, c = x.shape
    b = bs // (splits * splits)
    x = x.reshape(b, splits, splits, hw, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, splits * hw, splits * ww, c)


def shifted_window_attn_mask(
    h: int, w: int, splits: int
) -> np.ndarray:
    """Additive (-100/0) attention mask for shifted windows
    (`multiview_transformer.py:69-95`), computed on host."""
    win_h, win_w = h // splits, w // splits
    shift_h, shift_w = win_h // 2, win_w // 2
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(splits, win_h, splits, win_w).transpose(0, 2, 1, 3)
    img = img.reshape(splits * splits, win_h * win_w)
    mask = img[:, None, :] - img[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_attention(
    q: Array, k: Array, v: Array, splits: int, with_shift: bool
) -> Array:
    """Single-head windowed attention over NHWC maps -> NHWC."""
    b, h, w, c = q.shape
    if splits <= 1:
        qf = q.reshape(b, h * w, c)
        kf = k.reshape(b, h * w, c)
        vf = v.reshape(b, h * w, c)
        scores = mxu_einsum("bic,bjc->bij", qf, kf) / c**0.5
        out = mxu_einsum("bij,bjc->bic", jax.nn.softmax(scores, -1), vf)
        return out.reshape(b, h, w, c)

    shift_h, shift_w = (h // splits) // 2, (w // splits) // 2
    if with_shift:
        roll = lambda t: jnp.roll(t, (-shift_h, -shift_w), axis=(1, 2))
        q, k, v = roll(q), roll(k), roll(v)

    qs = split_windows(q, splits)
    ks = split_windows(k, splits)
    vs = split_windows(v, splits)
    bw, hw, ww, _ = qs.shape
    n = hw * ww
    qf = qs.reshape(bw, n, c)
    kf = ks.reshape(bw, n, c)
    vf = vs.reshape(bw, n, c)
    scores = mxu_einsum("bic,bjc->bij", qf, kf) / c**0.5
    if with_shift:
        mask = jnp.asarray(shifted_window_attn_mask(h, w, splits))
        mask = jnp.tile(mask, (b, 1, 1))
        scores = scores + mask
    out = mxu_einsum("bij,bjc->bic", jax.nn.softmax(scores, -1), vf)
    out = merge_windows(out.reshape(bw, hw, ww, c), splits)
    if with_shift:
        out = jnp.roll(out, (shift_h, shift_w), axis=(1, 2))
    return out


class SwinSelfLayer(nn.Module):
    """Self-attention + gated FFN layer (`multiview_transformer.py:310-419`)."""

    d_model: int
    ffn_expansion: int = 2
    with_shift: bool = False

    @nn.compact
    def __call__(self, x: Array, splits: int) -> Array:
        d = self.d_model
        q = nn.Dense(d, use_bias=False)(x)
        k = nn.Dense(d, use_bias=False)(x)
        v = nn.Dense(d, use_bias=False)(x)
        message = window_attention(q, k, v, splits, self.with_shift)
        message = nn.LayerNorm()(nn.Dense(d, use_bias=False)(message))
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * d * self.ffn_expansion, use_bias=False)(y)
        y = nn.gelu(y)
        y = nn.LayerNorm()(nn.Dense(d, use_bias=False)(y))
        return x + y


class MultiViewFeatureTransformer(nn.Module):
    """Per-view windowed self-attention stack; views share weights via the
    folded (v b) batch, as in the reference (self-attn-only configuration)."""

    num_layers: int = 1
    d_model: int = 256
    ffn_expansion: int = 2

    @nn.compact
    def __call__(self, features: Array, splits: int) -> Array:
        """features: (vb, h, w, c) NHWC -> same shape."""
        x = features
        for i in range(self.num_layers):
            x = SwinSelfLayer(
                self.d_model, self.ffn_expansion, with_shift=(i % 2 == 1)
            )(x, splits)
        return x
