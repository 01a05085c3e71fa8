"""Pose-free encoder: the full PF3plat pipeline as one Flax module.

Re-implements the reference `EncoderCostVolume`
(`src/model/encoder/encoder_costvolume.py:59-598`) TPU-first:

  inputs:  context images/intrinsics/near/far, frozen mono-depth outputs
           (depth, disparity, backbone features), and fixed-size masked
           cross-view correspondences (from the matcher stage);
  stages:  feature aggregation (LoFTR linear attention + swin windows) ->
           per-view scale/shift depth refinement -> batched Procrustes
           RANSAC coarse poses (replacing the per-pair CPU cv2.solvePnPRansac
           loop at `encoder_costvolume.py:323-381` with a fully-jittable
           3D-3D soft RANSAC) -> spectral camera synchronization ->
           transformer pose refinement -> plane-sweep cost-volume Gaussian
           prediction -> Gaussian adapter.
  outputs: Gaussians + (pairwise, synced, refined) poses + refined depths +
           correspondences, mirroring the reference return tuple.

Known deviation (documented): the reference's monocular one-hot cue
compares *metric depth* against an inverse-depth linspace
(`encoder_costvolume.py:292-298`), which degenerates to a constant one-hot;
here the refined depth is converted to disparity first (the evident intent).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import camera_sync, procrustes
from ..geometry.projection import (
    get_world_rays,
    sample_image_grid,
    se3_inverse,
    unproject,
)
from ..geometry.transforms import (
    make_rt,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
)
from .costvolume import DepthPredictorCfg, DepthPredictorMultiView
from .gaussian_adapter import GaussianAdapterCfg, adapt_gaussians
from .layers import (
    LearnableFourierPositionalEncoding,
    LocalFeatureTransformer,
    Mlp,
    SelfBlock,
    CrossBlock,
    get_2d_sincos_pos_embed,
    position_embedding_sine,
)
from .multiview_transformer import MultiViewFeatureTransformer
from .types import Gaussians

Array = jax.Array


class FrozenInputs(NamedTuple):
    """Outputs of the frozen perception stage (UniDepth-V2 path)."""

    depth: Array       # (b, v, h, w) metric monocular depth
    features: Array    # (b, v, hd, wd, cd) multi-layer backbone features


class Correspondences(NamedTuple):
    """Fixed-size masked cross-view matches from the matcher stage.

    Pair p relates view pair_i[p] -> pair_j[p]; kpts are full-res pixel
    coordinates (x, y).
    """

    kpts0: Array   # (b, n_pairs, m, 2)
    kpts1: Array   # (b, n_pairs, m, 2)
    scores: Array  # (b, n_pairs, m)
    valid: Array   # (b, n_pairs, m) bool


@dataclasses.dataclass(frozen=True)
class EncoderCfg:
    d_feature: int = 256
    d_backbone: int = 2048      # frozen feature width fed to the projector
    num_depth_candidates: int = 128
    num_surfaces: int = 1
    gaussians_per_pixel: int = 1
    downscale_factor: int = 4
    multiview_trans_attn_split: int = 4
    n_attn_layers: int = 6
    d_pose: int = 128
    pose_heads: int = 4
    confidence_min: float = 0.5
    ransac_samples: int = 128
    ransac_threshold: float = 0.02  # relative to median correspondence depth
    opacity_initial: float = 0.0
    opacity_final: float = 0.0
    opacity_warm_up: int = 1
    # Rematerialize the heavy trainable stages on the backward pass
    # (jax.checkpoint via nn.remat): trades ~recompute FLOPs for
    # activation memory. Without it the b=2 256^2 train step exceeds
    # v5e's 16G HBM (b=3 needs ~24G; the A6000 reference trains b=3 on
    # 48G). Mirrors the reference's gradient checkpointing in the U-Net
    # attention (`ldm_unet/util.py:102-148`).
    remat: bool = True
    # With remat on: "selective" (default, v5e-measured 1343.5 vs
    # 1423.5 ms/step at the reference b=3 protocol AND still fits
    # 15.75G HBM) checkpoints the pose stacks but inside the depth
    # predictor only the two U-Nets, keeping the ~13 MB correlation
    # volume as a saved residual so the backward does NOT recompute the
    # gather-bound plane-sweep scan. "coarse" (round-4 policy)
    # checkpoints the whole depth predictor too.
    remat_mode: str = "selective"
    # Compute dtype of the two cost-volume/depth U-Nets ("float32" or
    # "bfloat16"). Params and every numerics-sensitive reduction (GroupNorm
    # statistics, attention softmax, depth PDFs) stay f32; bfloat16 runs
    # the convs single-pass on the MXU. Trains-from-scratch modules only —
    # the frozen perception stages are untouched.
    unet_dtype: str = "float32"
    # Plane-sweep correlation compute dtype + scan chunk; see
    # costvolume.DepthPredictorCfg (gather-bound stage — bfloat16 halves
    # the warp's gathered bytes; positions/output stay f32).
    costvolume_dtype: str = "float32"
    costvolume_scan_chunk: int = 16
    gaussian_adapter: GaussianAdapterCfg = GaussianAdapterCfg()
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)


def view_pairs(v: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """All ordered pairs (i, j), i < j — reference `encoder_costvolume.py:323`."""
    pi, pj = [], []
    for i in range(v):
        for j in range(i + 1, v):
            pi.append(i)
            pj.append(j)
    return tuple(pi), tuple(pj)


def map_pdf_to_opacity(pdf: Array, step: Array, cfg: EncoderCfg) -> Array:
    """Reference `map_pdf_to_opacity` (`encoder_costvolume.py:174-187`)."""
    frac = jnp.minimum(step / cfg.opacity_warm_up, 1.0)
    x = cfg.opacity_initial + frac * (cfg.opacity_final - cfg.opacity_initial)
    exponent = 2.0**x
    return 0.5 * (1.0 - (1.0 - pdf) ** exponent + pdf ** (1.0 / exponent))


class EncoderOutput(NamedTuple):
    gaussians: Gaussians
    pairwise_poses: Array       # (b, n_pairs, 4, 4) coarse i->j
    sync_poses: Array           # (b, v, 4, 4) view0->viewk (w2c in view0 frame)
    refined_poses: Array        # (b, v, 4, 4) refined, same convention
    depths: Array               # (b, v, h, w) refined metric depth
    xyz: Array                  # (b, v, h, w, 3) camera-space points
    correspondences: Correspondences
    # Per-pair match confidence (mean match score, non-adjacent pairs
    # penalized) — the reference's `conf_transformation` returned as corr[2]
    # (`encoder_costvolume.py:370-374,577`) and consumed by the pose loss's
    # 3D branch (`loss_pose.py:124`).
    pair_confidences: Array     # (b, n_pairs)


class PoseFreeEncoder(nn.Module):
    cfg: EncoderCfg

    @nn.compact
    def __call__(
        self,
        images: Array,        # (b, v, h, w, 3) in [0, 1]
        intrinsics: Array,    # (b, v, 3, 3) normalized
        near: Array,          # (b, v)
        far: Array,           # (b, v)
        frozen: FrozenInputs,
        corr: Correspondences,
        global_step: Array,
        rng: Array,
    ) -> EncoderOutput:
        cfg = self.cfg
        b, v, h, w, _ = images.shape
        hd, wd = frozen.features.shape[2:4]
        h4, w4 = h // cfg.downscale_factor, w // cfg.downscale_factor
        d = cfg.d_feature
        pair_i, pair_j = view_pairs(v)
        n_pairs = len(pair_i)

        depth = jnp.clip(frozen.depth, near[..., None, None], far[..., None, None])

        # ---- cross-view feature extraction (reference :255-263) ----
        feat = nn.Dense(d, name="dino_projector")(frozen.features)  # (b,v,hd,wd,d)
        tokens = feat.reshape(b * v, hd * wd, d)
        tokens = LocalFeatureTransformer(d_model=d, nhead=4, name="dino_aggregator")(
            tokens
        )
        pre_cross = tokens.reshape(b, v, hd * wd, d)

        maps = tokens.reshape(b * v, hd, wd, d)
        splits = cfg.multiview_trans_attn_split
        if hd % splits or wd % splits:
            # Swin windows need divisible grids; fall back to full attention
            # (the reference asserts divisibility instead,
            # `multiview_transformer.py:12`).
            splits = 1
        if splits > 1:
            pos = position_embedding_sine(hd // splits, wd // splits, d // 2)
            pos = jnp.tile(pos, (splits, splits, 1))
        else:
            pos = position_embedding_sine(hd, wd, d // 2)
        maps = maps + pos[None]
        remat_unets = False
        if cfg.remat:
            SelfBlockM = nn.remat(SelfBlock)
            CrossBlockM = nn.remat(CrossBlock)
            MVTransformer = nn.remat(
                MultiViewFeatureTransformer, static_argnums=(2,)
            )
            if cfg.remat_mode == "selective":
                DepthPredictor = DepthPredictorMultiView
                remat_unets = True
            else:
                DepthPredictor = nn.remat(DepthPredictorMultiView)
        else:
            SelfBlockM, CrossBlockM = SelfBlock, CrossBlock
            MVTransformer = MultiViewFeatureTransformer
            DepthPredictor = DepthPredictorMultiView
        maps = MVTransformer(
            num_layers=1, d_model=d, name="cross_view_aggregator"
        )(maps, splits)
        per_view_depth_features = jax.image.resize(
            maps, (b * v, h4, w4, d), "bilinear"
        ).reshape(b, v, h4, w4, d)

        # ---- scale/shift depth refinement (reference :274-287) ----
        ss = nn.Dense(cfg.d_pose, name="in_features")(pre_cross)  # (b,v,L,128)
        ss = ss.reshape(b * v, hd * wd, cfg.d_pose)
        for i in range(cfg.n_attn_layers):
            ss = SelfBlockM(
                cfg.d_pose, cfg.pose_heads, name=f"depth_self_attn_{i}"
            )(ss)
        ss = Mlp(cfg.d_pose * 2, 2, zero_init=True, name="scale_shift_predictor")(ss)
        ss = ss.reshape(b * v, hd, wd, 2)
        ss = jax.image.resize(ss, (b * v, h, w, 2), "bilinear")
        shift = jnp.clip(ss[..., 1], -5.0, 5.0).reshape(b, v, h, w)
        depth = jnp.clip(
            depth + shift, near[..., None, None], far[..., None, None]
        )  # refined metric depth (b, v, h, w)

        # ---- monocular one-hot cue (reference :292-298, fixed semantics) ----
        dc = cfg.num_depth_candidates
        disp4 = jax.image.resize(
            (1.0 / depth).reshape(b * v, h, w, 1), (b * v, h4, w4, 1), "bilinear"
        )
        inv_near = (1.0 / near).reshape(b * v)[:, None, None, None]
        inv_far = (1.0 / far).reshape(b * v)[:, None, None, None]
        hyp = inv_far + jnp.linspace(0.0, 1.0, dc, dtype=depth.dtype) * (
            inv_near - inv_far
        )  # (vb?, 1, 1, dc) -- built in (b v) order then folded below
        idx = jnp.argmin(jnp.abs(disp4 - hyp), axis=-1)
        mono_cue_bv = jax.nn.one_hot(idx, dc, dtype=depth.dtype)  # (b*v,h4,w4,dc)
        mono_cue_bv = jax.lax.stop_gradient(mono_cue_bv)

        # ---- unproject refined depth to camera-space points (ref :304-307) ----
        xy_grid, _ = sample_image_grid((h, w), depth.dtype)  # (h, w, 2)
        xyz = unproject(
            xy_grid[None, None],
            depth,
            intrinsics[:, :, None, None],
        )  # (b, v, h, w, 3) camera coords

        # ---- coarse pairwise poses: batched Procrustes RANSAC (ref :323-381) --
        def lookup_xyz(view_idx, kpts):
            # kpts: (b, m, 2) pixel coords -> camera-space xyz at those pixels.
            xi = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, h - 1)
            flat = xyz[:, view_idx].reshape(b, h * w, 3)
            return jnp.take_along_axis(
                flat, (yi * w + xi)[..., None], axis=1
            )  # (b, m, 3)

        rel_list = []
        conf_list = []
        rngs = jax.random.split(rng, n_pairs)
        for p, (i, j) in enumerate(zip(pair_i, pair_j)):
            x_i = lookup_xyz(i, corr.kpts0[:, p])
            x_j = lookup_xyz(j, corr.kpts1[:, p])
            weights = jnp.where(corr.valid[:, p], jnp.maximum(corr.scores[:, p], 1e-4), 1e-6)
            keys = jax.random.split(rngs[p], b)
            # Scene-scale-adaptive inlier threshold: keypoints are quantized
            # to integer pixels, so the 3D lookup error grows with depth.
            thr = cfg.ransac_threshold * jnp.maximum(
                jnp.median(x_j[..., 2], axis=-1), 1e-3
            )  # (b,)
            fit = jax.vmap(
                lambda k, a, c, s, t: procrustes.align_ransac(
                    k, a, c, s,
                    n_samples=cfg.ransac_samples,
                    threshold=t,
                )
            )(keys, jax.lax.stop_gradient(x_i), jax.lax.stop_gradient(x_j), weights,
              jax.lax.stop_gradient(thr))
            rel = make_rt(fit.r, fit.t)  # (b, 4, 4) maps cam-i -> cam-j
            # Degenerate-pair fallback: with too few valid matches the fit is
            # meaningless; use identity like the reference's PnP try/except
            # (`encoder_costvolume.py:349-363`).
            enough = (corr.valid[:, p].sum(-1) >= 8)[:, None, None]
            rel = jnp.where(enough, rel, jnp.eye(4, dtype=rel.dtype))
            rel_list.append(rel)
            msum = corr.valid[:, p].sum(-1)
            conf = jnp.where(
                msum > 0,
                (corr.scores[:, p] * corr.valid[:, p]).sum(-1)
                / jnp.maximum(msum, 1),
                0.0,
            )
            if abs(i - j) > 1:
                conf = jnp.maximum(conf - cfg.confidence_min, 0.0) / (
                    1.0 - cfg.confidence_min
                )
            conf_list.append(conf)
        rel_poses = jnp.stack(rel_list, axis=1)   # (b, n_pairs, 4, 4)
        confs = jnp.stack(conf_list, axis=1)      # (b, n_pairs)

        if v == 2:
            sync_abspose = camera_sync.camera_chaining(rel_poses)
        else:
            pairs = list(zip(pair_i, pair_j))
            seq = [pairs.index((k, k + 1)) for k in range(v - 1)]
            chain = camera_sync.camera_chaining(rel_poses[:, jnp.asarray(seq)])
            sync_abspose = camera_sync.camera_synchronization(
                rel_poses, confs, pair_i, pair_j, v, fallback=chain
            )
        sync_abspose = jax.lax.stop_gradient(sync_abspose)  # (b, v, 4, 4) w2c

        # ---- pose refinement transformer (reference :387-473) ----
        dp = cfg.d_pose
        xy4, _ = sample_image_grid((h4, w4), depth.dtype)
        xy4 = xy4.reshape(h4 * w4, 2)
        posenc = LearnableFourierPositionalEncoding(
            dim=dp // cfg.pose_heads, name="posenc"
        )
        # cls token position = zeros, prepended to match the token order.
        enc_pts = jnp.concatenate([jnp.zeros((1, 2), xy4.dtype), xy4], axis=0)
        encoding0 = posenc(enc_pts[None])  # (2, 1, 1, L+1, head_dim)

        c2w_sync = se3_inverse(sync_abspose)
        origins, directions = get_world_rays(
            xy4[None, None], c2w_sync[:, :, None], intrinsics[:, :, None]
        )  # (b, v, L, 3)
        # reference concatenates (directions, cross) — match that order
        # (NOT the normalized-moment plucker_embedding form):
        plucker = jnp.concatenate(
            [directions, jnp.cross(origins, directions)], axis=-1
        )  # (b, v, L, 6)
        feat4 = jax.image.resize(
            feat.reshape(b * v, hd, wd, d), (b * v, h4, w4, d), "bilinear"
        ).reshape(b, v, h4 * w4, d)
        desc0 = jnp.concatenate([feat4, plucker], axis=-1)
        desc0 = desc0.reshape(b * v, h4, w4, d + 6)
        desc0 = nn.Conv(dp, (3, 3), name="conv_proj")(desc0)
        desc0 = desc0.reshape(b * v, h4 * w4, dp)
        cls = self.param("pose_cls_token", nn.initializers.zeros, (1, 1, dp))
        desc0 = jnp.concatenate(
            [jnp.broadcast_to(cls, (b * v, 1, dp)), desc0], axis=1
        )
        for i in range(cfg.n_attn_layers):
            desc0 = SelfBlockM(dp, cfg.pose_heads, name=f"pose_transformers_{i}")(
                desc0, encoding0
            )
        desc0 = desc0[:, 1:].reshape(b, v, h4 * w4, dp)

        pos2d = get_2d_sincos_pos_embed(dp, h4, w4, depth.dtype)
        rgb_feat = desc0 + pos2d[None, None]
        pose_token = self.param(
            "pose_token", nn.initializers.normal(1e-6), (1, 1, 1, dp)
        )
        rgb_feat = jnp.concatenate(
            [jnp.broadcast_to(pose_token, (b, v, 1, dp)), rgb_feat], axis=-2
        )
        n_tok = rgb_feat.shape[-2]
        for i in range(cfg.n_attn_layers):
            rf = rgb_feat.reshape(b * v, n_tok, dp)
            rf = SelfBlockM(dp, cfg.pose_heads, name=f"pose_self_attn_{i}")(rf)
            rgb_feat = rf.reshape(b, v, n_tok, dp)
            if v > 1:
                others = rgb_feat[:, 1:]  # (b, v-1, n, dp)
                cross_ctx = jnp.stack(
                    [
                        jnp.concatenate(
                            [rgb_feat[:, k + 1 :], rgb_feat[:, :k]], axis=1
                        ).reshape(b, -1, dp)
                        for k in range(1, v)
                    ],
                    axis=1,
                )  # (b, v-1, (v-1)*n, dp)
                o = others.reshape(b * (v - 1), n_tok, dp)
                c = cross_ctx.reshape(b * (v - 1), (v - 1) * n_tok, dp)
                o, _ = CrossBlockM(dp, cfg.pose_heads, name=f"pose_cross_attn_{i}")(o, c)
                rgb_feat = jnp.concatenate(
                    [rgb_feat[:, :1], o.reshape(b, v - 1, n_tok, dp)], axis=1
                )
        rgb_feat = rgb_feat[:, :, 0]  # (b, v, dp)

        raw_rot = matrix_to_rotation_6d(sync_abspose[:, :, :3, :3])
        raw_trans = sync_abspose[:, :, :3, 3]
        pred_pose_enc = jnp.concatenate([raw_rot, raw_trans], axis=-1)  # (b,v,9)
        rgb_feat = rgb_feat + Mlp(64, dp, name="embed_pose")(pred_pose_enc)
        trunk = rgb_feat
        for i in range(cfg.n_attn_layers):
            trunk = SelfBlockM(dp, cfg.pose_heads, name=f"pose_trunk_{i}")(trunk)
        delta = Mlp(dp * 2, dp + 9 + 2, zero_init=True, name="pose_branch")(trunk)
        delta_pose = delta[..., :9]
        gamma = self.param("pose_gamma", nn.initializers.ones, ())
        pred_pose = pred_pose_enc[:, 1:] + delta_pose[:, 1:] * gamma
        pred_concat = jnp.concatenate([pred_pose_enc[:, :1], pred_pose], axis=1)
        rot = rotation_6d_to_matrix(pred_concat[..., :6])
        trans = pred_concat[..., 6:9]
        refined = jnp.zeros((b, v, 4, 4), depth.dtype)
        refined = refined.at[:, :, :3, :3].set(rot)
        refined = refined.at[:, :, :3, 3].set(trans)
        refined = refined.at[:, :, 3, 3].set(1.0)  # (b, v, 4, 4) w2c

        # ---- gaussian prediction on first & last context view (ref :481-499) --
        sel = (0, v - 1)
        sel_idx = jnp.asarray(sel)
        vs = len(sel)
        adapter = cfg.gaussian_adapter
        raw_ch = cfg.num_surfaces * (adapter.d_in + 2)
        predictor = DepthPredictor(
            DepthPredictorCfg(
                feature_channels=d,
                upscale_factor=cfg.downscale_factor,
                num_depth_candidates=dc,
                costvolume_unet_feat_dim=cfg.costvolume_unet_feat_dim,
                costvolume_unet_channel_mult=tuple(cfg.costvolume_unet_channel_mult),
                costvolume_unet_attn_res=tuple(cfg.costvolume_unet_attn_res),
                gaussian_raw_channels=raw_ch,
                gaussians_per_pixel=cfg.gaussians_per_pixel,
                num_views=vs,
                depth_unet_feat_dim=cfg.depth_unet_feat_dim,
                depth_unet_attn_res=tuple(cfg.depth_unet_attn_res),
                depth_unet_channel_mult=tuple(cfg.depth_unet_channel_mult),
                unet_dtype=cfg.unet_dtype,
                costvolume_dtype=cfg.costvolume_dtype,
                costvolume_scan_chunk=cfg.costvolume_scan_chunk,
                remat_unets=remat_unets,
            ),
            name="depth_predictor",
        )
        images_sel = images[:, sel_idx]
        to_vb = lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
            vs * b, *x.shape[2:]
        )
        disparity_sel = (1.0 / depth)[:, sel_idx][..., None]
        mono_sel = (
            mono_cue_bv.reshape(b, v, h4, w4, dc)[:, sel_idx]
        )
        densities, raw_gaussians = predictor(
            per_view_depth_features[:, sel_idx],
            intrinsics[:, sel_idx],
            refined[:, sel_idx],
            near[:, sel_idx],
            far[:, sel_idx],
            to_vb(images_sel),
            to_vb(disparity_sel),
            to_vb(mono_sel),
        )

        # offsets + adapter (reference :505-540)
        raw_gaussians = raw_gaussians.reshape(
            b, vs, h * w, cfg.num_surfaces, adapter.d_in + 2
        )
        offset_xy = jax.nn.sigmoid(raw_gaussians[..., :2])
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], depth.dtype)
        xy_ray = xy_grid.reshape(h * w, 2)[None, None, :, None, :] + (
            offset_xy - 0.5
        ) * pixel_size

        c2w_refined = se3_inverse(refined)
        depths_sel = depth[:, sel_idx].reshape(b, vs, h * w)
        opacities = map_pdf_to_opacity(
            densities[..., 0], global_step, cfg
        ) / cfg.gaussians_per_pixel  # (b, vs, hw)

        means, covs, harmonics, opac, _, _ = adapt_gaussians(
            adapter,
            c2w_refined[:, sel_idx][:, :, None],
            intrinsics[:, sel_idx][:, :, None],
            xy_ray[..., 0, :],
            depths_sel,
            opacities,
            raw_gaussians[..., 0, 2:],
            (h, w),
        )

        gaussians = Gaussians(
            means=means.reshape(b, vs * h * w, 3),
            covariances=covs.reshape(b, vs * h * w, 3, 3),
            harmonics=harmonics.reshape(b, vs * h * w, 3, adapter.d_sh),
            opacities=opac.reshape(b, vs * h * w),
        )

        return EncoderOutput(
            gaussians=gaussians,
            pairwise_poses=rel_poses,
            sync_poses=sync_abspose,
            refined_poses=refined,
            depths=depth,
            xyz=xyz,
            correspondences=corr,
            pair_confidences=confs,
        )
