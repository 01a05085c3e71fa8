"""Shared transformer building blocks (Flax), used across the encoder.

Re-implements the reference's block zoo in idiomatic Flax/NHWC:
  * `SelfBlock` / `CrossBlock` / `LearnableFourierPositionalEncoding` —
    LightGlue-style blocks (`src/model/LightGlue/lightglue/lightglue.py:51-224`)
    reused by the pose/scale-shift heads (`encoder_costvolume.py:85-121`);
  * `LoFTREncoderLayer` linear (ELU-kernel) attention aggregator
    (`src/model/encoder/aggregation.py:17-170`);
  * `Mlp` (timm-style, `src/model/unidepth/layers/`);
  * sine positional embedding (`src/flow_util.py:81-…`, `PositionEmbeddingSine`)
    and 2D sincos embedding (`src/flow_util.py:227-311`).

Attention uses plain jnp einsum + softmax — on TPU, XLA fuses this well at
the sequence lengths involved (<= ~4k tokens); the reference itself disables
flash attention (`README.md:82`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def rotate_half(x: Array) -> Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def apply_rotary_emb(freqs: Array, t: Array) -> Array:
    """freqs: (2, ..., dim) stacked (cos, sin); t: (..., dim)."""
    return t * freqs[0] + rotate_half(t) * freqs[1]


class LearnableFourierPositionalEncoding(nn.Module):
    """Rotary-style learnable Fourier features (lightglue.py:61-75)."""

    dim: int
    f_dim: Optional[int] = None
    gamma: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f_dim = self.f_dim or self.dim
        projected = nn.Dense(
            f_dim // 2,
            use_bias=False,
            kernel_init=nn.initializers.normal(self.gamma**-2),
        )(x)
        cosines, sines = jnp.cos(projected), jnp.sin(projected)
        emb = jnp.stack([cosines, sines], axis=0)[..., None, :, :]
        return jnp.repeat(emb, 2, axis=-1)


def mxu_einsum(spec: str, a: Array, b: Array) -> Array:
    """bf16-multiply / fp32-accumulate einsum — the TPU-native matmul mode
    (MXU native input precision is bf16; accumulation stays fp32)."""
    return jnp.einsum(
        spec, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


_FLASH_MIN_TOKENS = 2048
_FLASH_BLOCK = 512


def _flash_attention(q: Array, k: Array, v: Array) -> Array:
    """Pallas TPU flash attention; arbitrary n/m (segment-id padding) and
    arbitrary head dim (zero-padded to a lane-friendly multiple — zeros in
    q/k contribute nothing to the logits, padded v channels are sliced off).

    q: (b, h, n, d); k/v: (b, h, m, d).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    m = k.shape[-2]
    scale = d**-0.5  # true head dim, not the padded one
    # The in-tree kernel accepts head dims <= 128 at 64-granularity but
    # requires 128-multiples beyond that.
    d_target = -(-d // 64) * 64 if d <= 128 else -(-d // 128) * 128
    d_pad = d_target - d

    def prep(x, target_n):
        pad_n = target_n - x.shape[-2]
        return jnp.pad(
            x.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_n), (0, d_pad))
        )

    bq = min(_FLASH_BLOCK, -(-n // 128) * 128)
    bk = min(_FLASH_BLOCK, -(-m // 128) * 128)
    n_pad = -(-n // bq) * bq
    m_pad = -(-m // bk) * bk
    qb, kb, vb = prep(q, n_pad), prep(k, m_pad), prep(v, m_pad)
    q_ids = jnp.broadcast_to(
        (jnp.arange(n_pad) >= n).astype(jnp.int32)[None], (b, n_pad)
    )
    kv_ids = jnp.broadcast_to(
        # kv pad -> segment 2: never matches a real (0) or padded-q (1) row
        2 * (jnp.arange(m_pad) >= m).astype(jnp.int32)[None], (b, m_pad)
    )
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
    )
    out = flash_attention(
        qb, kb, vb, segment_ids=SegmentIds(q_ids, kv_ids), causal=False,
        sm_scale=scale, block_sizes=bs,
    )
    return out[:, :, :n, :d].astype(q.dtype)


def scaled_dot_attention(q: Array, k: Array, v: Array, mask=None) -> Array:
    """(..., heads, n, d) attention; bf16 MXU inputs, fp32 accumulation.

    Large unmasked attention dispatches to the Pallas TPU flash kernel
    (never materializes the n*m logits — the pose stacks' score tensors
    are the encoder's dominant HBM traffic, ~0.5 GB/layer at 4k tokens);
    everything else uses the einsum path, which XLA fuses well at small n.
    """
    import os

    n, m = q.shape[-2], k.shape[-2]
    if (
        os.environ.get("PF3PLAT_FLASH_ATTENTION", "1") != "0"
        and mask is None
        and min(n, m) >= _FLASH_MIN_TOKENS
        and q.ndim == 4
        and jax.default_backend() == "tpu"
    ):
        # Default-on after the hardware A/B at the pose-stack shape
        # (b=2, h=4, n=4097, d=32): flash 5.77 ms vs einsum 12.13 ms
        # fwd+bwd, loss rel diff 6.7e-6 (tools/flash_check.py). Set
        # PF3PLAT_FLASH_ATTENTION=0 to force the einsum path.
        return _flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    sim = mxu_einsum("...id,...jd->...ij", q * scale, k)
    if mask is not None:
        sim = jnp.where(mask, sim, -1e30)
    attn = jax.nn.softmax(sim, axis=-1)
    return mxu_einsum("...ij,...jd->...id", attn, v)


class SelfBlock(nn.Module):
    """LightGlue self-attention block (lightglue.py:135-170): qkv with
    optional rotary encoding, then gated FFN on [x, message]."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, encoding: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        d = self.embed_dim
        h = self.num_heads
        head = d // h
        qkv = nn.Dense(3 * d)(x)  # (b, n, 3d)
        qkv = qkv.reshape(*x.shape[:-1], h, head, 3)
        qkv = jnp.moveaxis(qkv, -3, -4)  # (b, h, n, head, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        if encoding is not None:
            q = apply_rotary_emb(encoding, q)
            k = apply_rotary_emb(encoding, k)
        context = scaled_dot_attention(q, k, v, mask)
        context = jnp.moveaxis(context, -3, -2).reshape(*x.shape[:-1], d)
        message = nn.Dense(d)(context)
        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * d)(y)
        y = nn.LayerNorm()(y)
        y = nn.gelu(y)
        return x + nn.Dense(d)(y)


class CrossBlock(nn.Module):
    """LightGlue bidirectional cross-attention block (lightglue.py:173-224).

    Shares the qk projection between both sides (sim matrix reused both
    directions); the ffn is shared too.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x0: Array, x1: Array,
                 mask: Optional[Array] = None) -> tuple[Array, Array]:
        d = self.embed_dim
        h = self.num_heads
        head = d // h
        to_qk = nn.Dense(d, name="to_qk")
        to_v = nn.Dense(d, name="to_v")
        to_out = nn.Dense(d, name="to_out")

        def split(t):
            return jnp.moveaxis(t.reshape(*t.shape[:-1], h, head), -3, -2)

        qk0, qk1 = split(to_qk(x0)), split(to_qk(x1))
        v0, v1 = split(to_v(x0)), split(to_v(x1))
        scale = head**-0.5
        sim = mxu_einsum(
            "...id,...jd->...ij", qk0 * scale**0.5, qk1 * scale**0.5
        )
        if mask is not None:
            sim = jnp.where(mask, sim, -1e30)
        attn01 = jax.nn.softmax(sim, axis=-1)
        attn10 = jax.nn.softmax(jnp.swapaxes(sim, -1, -2), axis=-1)
        m0 = mxu_einsum("...ij,...jd->...id", attn01, v1)
        m1 = mxu_einsum("...ij,...jd->...id", attn10, v0)

        def merge(t):
            return jnp.moveaxis(t, -3, -2).reshape(*t.shape[:-3], t.shape[-2], d)

        m0, m1 = to_out(merge(m0)), to_out(merge(m1))

        ffn = nn.Sequential([nn.Dense(2 * d), nn.LayerNorm(), nn.gelu, nn.Dense(d)])
        x0 = x0 + ffn(jnp.concatenate([x0, m0], axis=-1))
        x1 = x1 + ffn(jnp.concatenate([x1, m1], axis=-1))
        return x0, x1


class Mlp(nn.Module):
    """timm-style MLP (used for pose embed/branch; unidepth/layers).

    `zero_init` zero-initializes the output layer so residual heads
    (scale/shift, pose delta) start at identity — an intentional
    improvement over the reference's default init, which lets randomly
    initialized residuals corrupt the geometric pipeline early in training.
    """

    hidden_features: int
    out_features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_features)(x)
        x = nn.gelu(x)
        kinit = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        return nn.Dense(self.out_features, kernel_init=kinit)(x)


def elu_feature_map(x: Array) -> Array:
    return nn.elu(x) + 1.0


class LoFTREncoderLayer(nn.Module):
    """LoFTR linear-attention layer (`aggregation.py:85-137`)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x: Array, source: Array) -> Array:
        d = self.d_model
        h = self.nhead
        head = d // h
        n = x.shape[-2]
        q = nn.Dense(head * h, use_bias=False)(x).reshape(*x.shape[:-1], h, head)
        k = nn.Dense(head * h, use_bias=False)(source).reshape(
            *source.shape[:-1], h, head
        )
        v = nn.Dense(head * h, use_bias=False)(source).reshape(
            *source.shape[:-1], h, head
        )
        # Linear attention: O(n d^2) via the ELU kernel trick
        # (`aggregation.py:17-51`).
        q = elu_feature_map(q)
        k = elu_feature_map(k)
        v_len = v.shape[-3]
        kv = jnp.einsum("...shd,...shv->...hdv", k, v / v_len, precision="highest")
        z = 1.0 / (
            jnp.einsum("...lhd,...hd->...lh", q, k.sum(axis=-3), precision="highest")
            + 1e-6
        )
        message = jnp.einsum("...lhd,...hdv,...lh->...lhv", q, kv, z) * v_len
        message = message.reshape(*x.shape[:-1], d)
        message = nn.LayerNorm()(nn.Dense(d, use_bias=False)(message))

        y = jnp.concatenate([x, message], axis=-1)
        y = nn.Dense(2 * d, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(d, use_bias=False)(y)
        y = nn.LayerNorm()(y)
        return x + y


class LocalFeatureTransformer(nn.Module):
    """3x LoFTR self-attention layers over per-view tokens
    (`aggregation.py:139-170`)."""

    d_model: int = 256
    nhead: int = 4
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.num_layers):
            x = LoFTREncoderLayer(self.d_model, self.nhead)(x, x)
        return x


def position_embedding_sine(h: int, w: int, num_pos_feats: int,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> Array:
    """(h, w, 2*num_pos_feats) sine embedding (`flow_util.py:81-146`),
    normalized to 2*pi."""
    import numpy as np

    y = (np.arange(h, dtype=np.float64) + 1.0) / h * 2 * np.pi
    x = (np.arange(w, dtype=np.float64) + 1.0) / w * 2 * np.pi
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[None, :, None] / dim_t
    pos_y = y[:, None, None] / dim_t
    pos_x = np.stack(
        [np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(1, w, -1)
    pos_y = np.stack(
        [np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, 1, -1)
    pos = np.concatenate(
        [np.broadcast_to(pos_y, (h, w, num_pos_feats)),
         np.broadcast_to(pos_x, (h, w, num_pos_feats))], axis=-1
    )
    return jnp.asarray(pos, dtype)


def get_2d_sincos_pos_embed(embed_dim: int, grid_h: int, grid_w: int,
                            dtype=jnp.float32) -> Array:
    """(grid_h*grid_w, embed_dim) 2D sincos embedding (`flow_util.py:227-311`)."""
    import numpy as np

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw = np.arange(grid_w, dtype=np.float64)
    gh = np.arange(grid_h, dtype=np.float64)
    grid = np.meshgrid(gw, gh)  # w goes first (reference convention)
    emb_w = emb_1d(embed_dim // 2, grid[0])
    emb_h = emb_1d(embed_dim // 2, grid[1])
    return jnp.asarray(np.concatenate([emb_w, emb_h], axis=1), dtype)
