"""LightGlue feature matcher (Flax, static shapes, masked).

Re-implements the reference's frozen LightGlue
(`src/model/LightGlue/lightglue/lightglue.py:315-657`) as used by PF3plat:
9 self+cross transformer layers with rotary keypoint encoding, dual-softmax
+ matchability assignment, mutual-NN filtering. Early exit / point pruning
are omitted entirely — the reference disables them
(`encoder_costvolume.py:79`: depth_confidence=-1, width_confidence=-1) and
data-dependent pruning is hostile to static-shape compilation anyway.

Variable keypoint counts become fixed-K inputs with validity masks
propagated through attention and the assignment (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import CrossBlock, LearnableFourierPositionalEncoding, SelfBlock
from .superpoint import Keypoints

Array = jax.Array


class MatchResult(NamedTuple):
    m0: Array        # (b, k) index into kpts1 matched to each kpt0, -1 invalid
    scores0: Array   # (b, k) match confidence for each kpt0
    valid: Array     # (b, k) bool: mutual match above threshold


def normalize_keypoints(xy: Array, h: int, w: int) -> Array:
    """Center + scale to ~(-1, 1) (`lightglue.py:25-37`)."""
    size = jnp.asarray([w, h], xy.dtype)
    shift = size / 2
    scale = size.max() / 2
    return (xy - shift) / scale


def sigmoid_log_double_softmax(sim: Array, z0: Array, z1: Array,
                               mask0: Array, mask1: Array) -> Array:
    """Log assignment matrix (`lightglue.py:258-271`), with invalid slots
    masked out of both softmaxes."""
    neg = -1e30
    pair_mask = mask0[..., :, None] & mask1[..., None, :]
    sim = jnp.where(pair_mask, sim, neg)
    certainties = jax.nn.log_sigmoid(z0[..., :, 0:1]) + jax.nn.log_sigmoid(
        z1[..., None, :, 0]
    )
    scores0 = jax.nn.log_softmax(sim, axis=-1)
    scores1 = jax.nn.log_softmax(sim, axis=-2)
    return scores0 + scores1 + certainties


class LightGlue(nn.Module):
    descriptor_dim: int = 256
    n_layers: int = 9
    num_heads: int = 4
    filter_threshold: float = 0.1

    @nn.compact
    def __call__(
        self, kpts0: Keypoints, kpts1: Keypoints, image_shape: tuple[int, int]
    ) -> MatchResult:
        d = self.descriptor_dim
        h, w = image_shape
        # Shared input projection (reference `input_proj`, lightglue.py:377).
        in_proj = nn.Dense(d, name="input_proj")
        desc0 = in_proj(kpts0.descriptors)
        desc1 = in_proj(kpts1.descriptors)

        posenc = LearnableFourierPositionalEncoding(
            dim=d // self.num_heads, name="posenc"
        )
        enc0 = posenc(normalize_keypoints(kpts0.xy, h, w))
        enc1 = posenc(normalize_keypoints(kpts1.xy, h, w))

        m0 = kpts0.valid
        m1 = kpts1.valid
        attn_mask0 = m0[:, None, :, None] & m0[:, None, None, :]
        attn_mask1 = m1[:, None, :, None] & m1[:, None, None, :]
        cross_mask = m0[:, None, :, None] & m1[:, None, None, :]

        for i in range(self.n_layers):
            # Self blocks share weights between the two images (reference
            # applies the same `self_attn` module to both).
            self_block = SelfBlock(d, self.num_heads, name=f"self_{i}")
            desc0 = self_block(desc0, enc0, attn_mask0)
            desc1 = self_block(desc1, enc1, attn_mask1)
            desc0, desc1 = CrossBlock(d, self.num_heads, name=f"cross_{i}")(
                desc0, desc1, cross_mask
            )

        final_proj = nn.Dense(d, name="final_proj")
        mdesc0 = final_proj(desc0) / d**0.25
        mdesc1 = final_proj(desc1) / d**0.25
        sim = jnp.einsum("bmd,bnd->bmn", mdesc0, mdesc1, precision="highest")
        matchability = nn.Dense(1, name="matchability")
        z0 = matchability(desc0)
        z1 = matchability(desc1)
        scores = sigmoid_log_double_softmax(sim, z0, z1, m0, m1)

        # Mutual-NN filter (`lightglue.py:296-312`), mask-friendly.
        max0_idx = jnp.argmax(scores, axis=-1)                  # (b, k0)
        max1_idx = jnp.argmax(scores, axis=-2)                  # (b, k1)
        k0_range = jnp.arange(scores.shape[-2])
        mutual0 = k0_range[None] == jnp.take_along_axis(
            max1_idx, max0_idx, axis=1
        )
        max0_val = jnp.max(scores, axis=-1)
        mscores0 = jnp.where(mutual0, jnp.exp(max0_val), 0.0)
        valid = mutual0 & (mscores0 > self.filter_threshold) & m0
        matched1_valid = jnp.take_along_axis(m1, max0_idx, axis=1)
        valid = valid & matched1_valid
        return MatchResult(
            m0=jnp.where(valid, max0_idx, -1),
            scores0=mscores0,
            valid=valid,
        )
