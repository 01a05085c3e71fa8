"""Matching front-end: images -> fixed-size Correspondences for the encoder.

Replaces the reference's per-pair Python loop over `match_pair`
(`encoder_costvolume.py:334-368`, `LightGlue/lightglue/utils.py:150`) with a
batched jittable pipeline: SuperPoint once per view, LightGlue per view
pair, then top-M compaction of mutual matches into the masked fixed-size
`Correspondences` layout the encoder consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoder import Correspondences, view_pairs
from .lightglue import LightGlue, MatchResult
from .superpoint import Keypoints, SuperPoint

Array = jax.Array


def match_context_views(
    superpoint: SuperPoint,
    sp_params,
    lightglue: LightGlue,
    lg_params,
    images: Array,          # (b, v, h, w, 3)
    max_matches: int = 512,
) -> Correspondences:
    b, v, h, w, _ = images.shape
    pair_i, pair_j = view_pairs(v)

    kp: Keypoints = superpoint.apply(
        sp_params, images.reshape(b * v, h, w, 3)
    )
    kp = jax.tree_util.tree_map(
        lambda x: x.reshape(b, v, *x.shape[1:]), kp
    )

    k0_list, k1_list, s_list, v_list = [], [], [], []
    for i, j in zip(pair_i, pair_j):
        kp_i = jax.tree_util.tree_map(lambda x: x[:, i], kp)
        kp_j = jax.tree_util.tree_map(lambda x: x[:, j], kp)
        res: MatchResult = lightglue.apply(lg_params, kp_i, kp_j, (h, w))

        # Compact mutual matches to the top max_matches by score.
        score = jnp.where(res.valid, res.scores0, -1.0)
        top_s, top_idx = jax.lax.top_k(score, max_matches)   # (b, m)
        sel_valid = top_s > 0
        xy0 = jnp.take_along_axis(kp_i.xy, top_idx[..., None], axis=1)
        m0_sel = jnp.take_along_axis(
            jnp.maximum(res.m0, 0), top_idx, axis=1
        )
        xy1 = jnp.take_along_axis(kp_j.xy, m0_sel[..., None], axis=1)
        k0_list.append(xy0)
        k1_list.append(xy1)
        s_list.append(jnp.where(sel_valid, top_s, 0.0))
        v_list.append(sel_valid)

    return Correspondences(
        kpts0=jnp.stack(k0_list, axis=1),
        kpts1=jnp.stack(k1_list, axis=1),
        scores=jnp.stack(s_list, axis=1),
        valid=jnp.stack(v_list, axis=1),
    )
