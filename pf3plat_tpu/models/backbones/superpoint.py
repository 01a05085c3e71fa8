"""SuperPoint keypoint detector + descriptor (Flax, NHWC, static shapes).

Re-implements the reference's frozen SuperPoint
(`src/model/LightGlue/lightglue/superpoint.py:56-227`) with the dynamic
per-image keypoint lists replaced by fixed-K top-K selection with validity
masks — the TPU-native answer to data-dependent shapes (SURVEY.md §7.4.3).
Layer names match the torch checkpoint (conv1a..convDb) so the weight
converter is a pure name/axis mapping.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Keypoints(NamedTuple):
    xy: Array           # (b, k, 2) pixel coords (x, y)
    scores: Array       # (b, k)
    descriptors: Array  # (b, k, 256)
    valid: Array        # (b, k) bool


def simple_nms(scores: Array, radius: int, iterations: int = 2) -> Array:
    """Fast NMS via max pooling (`superpoint.py:12-31`). scores: (b, h, w)."""
    size = radius * 2 + 1

    def max_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, size, size), (1, 1, 1), "SAME"
        )

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(iterations):
        supp_mask = max_pool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def _bilinear_descriptor_sample(desc: Array, xy: Array, s: int = 8) -> Array:
    """Sample (b, hc, wc, c) descriptor map at keypoint pixel coords
    (`superpoint.py:34-54` semantics: align_corners=True grid in the
    s-downsampled map)."""
    b, hc, wc, c = desc.shape
    # Map full-res pixel coords to descriptor-map coords (align_corners).
    gx = (xy[..., 0] - s / 2 + 0.5) / s
    gy = (xy[..., 1] - s / 2 + 0.5) / s
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def tap(yy, xx):
        xi = jnp.clip(xx, 0, wc - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, hc - 1).astype(jnp.int32)
        flat = desc.reshape(b, hc * wc, c)
        return jnp.take_along_axis(flat, (yi * wc + xi)[..., None], axis=1)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    out = top * (1 - fy)[..., None] + bot * fy[..., None]
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


class SuperPoint(nn.Module):
    max_num_keypoints: int = 1024
    nms_radius: int = 4
    detection_threshold: float = 0.0005
    remove_borders: int = 4
    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, image: Array) -> Keypoints:
        """image: (b, h, w, 3) RGB in [0, 1] -> fixed-K masked keypoints."""
        b, h, w, _ = image.shape
        # ITU-R 601 grayscale (kornia's rgb_to_grayscale).
        gray = (
            0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]
        )[..., None]

        def conv(x, ch, name, k=3):
            return nn.Conv(ch, (k, k), name=name)(x)

        x = nn.relu(conv(gray, 64, "conv1a"))
        x = nn.relu(conv(x, 64, "conv1b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 64, "conv2a"))
        x = nn.relu(conv(x, 64, "conv2b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 128, "conv3a"))
        x = nn.relu(conv(x, 128, "conv3b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, 128, "conv4a"))
        x = nn.relu(conv(x, 128, "conv4b"))

        cpa = nn.relu(conv(x, 256, "convPa"))
        logits = conv(cpa, 65, "convPb", k=1)  # (b, h/8, w/8, 65)
        scores = jax.nn.softmax(logits, axis=-1)[..., :-1]
        hc, wc = scores.shape[1:3]
        scores = scores.reshape(b, hc, wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
        scores = simple_nms(scores, self.nms_radius)

        pad = self.remove_borders
        if pad:
            mask = jnp.zeros((hc * 8, wc * 8), bool)
            mask = mask.at[pad:-pad, pad:-pad].set(True)
            scores = jnp.where(mask[None], scores, -1.0)

        # Fixed-K top-K selection (replaces data-dependent thresholds).
        flat = scores.reshape(b, -1)
        top_scores, top_idx = jax.lax.top_k(flat, self.max_num_keypoints)
        ys = (top_idx // (wc * 8)).astype(jnp.float32)
        xs = (top_idx % (wc * 8)).astype(jnp.float32)
        xy = jnp.stack([xs, ys], axis=-1)
        valid = top_scores > self.detection_threshold

        cda = nn.relu(conv(x, 256, "convDa"))
        desc = conv(cda, self.descriptor_dim, "convDb", k=1)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        descriptors = _bilinear_descriptor_sample(desc, xy)

        return Keypoints(
            xy=xy,
            scores=jnp.where(valid, top_scores, 0.0),
            descriptors=jnp.where(valid[..., None], descriptors, 0.0),
            valid=valid,
        )
