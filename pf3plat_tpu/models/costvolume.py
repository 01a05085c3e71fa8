"""Cost-volume depth predictor (Flax, NHWC).

Re-implements the reference `DepthPredictorMultiView`
(`src/model/encoder/costvolume/depth_predictor_multiview.py:148-417`):
plane-sweep warping of cross-view features over D inverse-depth candidates,
correlation cost volume, U-Net refinement with cross-view attention,
mono-guided attention fusing the monocular one-hot depth cue with the
multi-view cost, softmax depth PDF, full-res refinement U-Net, and the
Gaussian-parameter / opacity heads.

Like the reference, everything runs in the folded (v b) layout. The
grid-sample warp becomes a vectorized 4-tap bilinear gather.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.projection import se3_inverse
from .unet import UNetModel

Array = jax.Array


def bilinear_sample(img: Array, x: Array, y: Array) -> Array:
    """Sample NHWC image at fractional pixel coords (align_corners=True grid,
    zero padding). img: (b, h, w, c); x, y: (b, n) -> (b, n, c)."""
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yy, xx):
        inb = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b * h * w, c)
        off = (jnp.arange(b, dtype=jnp.int32) * h * w)[:, None]
        vals = flat[(yi * w + xi + off).reshape(-1)].reshape(*xx.shape, c)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def warp_with_pose_depth_candidates(
    feature: Array,      # (b, h, w, c) source view features
    intrinsics: Array,   # (b, 3, 3) PIXEL-unit intrinsics
    pose: Array,         # (b, 4, 4) relative pose (target->source)
    depth: Array,        # (b, d) candidate depths (shared per pixel)
    clamp_min_depth: float = 1e-3,
) -> Array:
    """Plane-sweep warp (`depth_predictor_multiview.py:28-88`).

    Returns (b, d, h, w, c): source features sampled at the reprojection of
    each target pixel under each depth candidate.
    """
    b, h, w, c = feature.shape
    d = depth.shape[1]

    xs = jnp.arange(w, dtype=feature.dtype)
    ys = jnp.arange(h, dtype=feature.dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)

    k_inv = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("bij,nj->bni", k_inv, grid)  # (b, hw, 3)
    rot = jnp.einsum("bij,bnj->bni", pose[:, :3, :3], rays)  # (b, hw, 3)
    pts = (
        rot[:, None, :, :] * depth[:, :, None, None]
        + pose[:, None, None, :3, 3]
    )  # (b, d, hw, 3)
    proj = jnp.einsum("bij,bdnj->bdni", intrinsics, pts)
    z = jnp.maximum(proj[..., 2], clamp_min_depth)
    px = proj[..., 0] / z
    py = proj[..., 1] / z
    px = jax.lax.stop_gradient(px).reshape(b, d * h * w)
    py = jax.lax.stop_gradient(py).reshape(b, d * h * w)
    sampled = bilinear_sample(feature, px, py)
    return sampled.reshape(b, d, h, w, c)


@dataclasses.dataclass(frozen=True)
class DepthPredictorCfg:
    feature_channels: int = 256
    upscale_factor: int = 4
    num_depth_candidates: int = 128
    costvolume_unet_feat_dim: int = 128
    costvolume_unet_channel_mult: Sequence[int] = (1, 1, 1)
    costvolume_unet_attn_res: Sequence[int] = (4,)
    gaussian_raw_channels: int = 84
    gaussians_per_pixel: int = 1
    num_views: int = 2
    depth_unet_feat_dim: int = 32
    depth_unet_attn_res: Sequence[int] = (16,)
    depth_unet_channel_mult: Sequence[int] = (1, 1, 1, 1, 1)
    # U-Net conv/attention compute dtype ("float32"/"bfloat16"); see
    # unet.UNetModel — params and norm/softmax reductions stay f32.
    unet_dtype: str = "float32"
    # Plane-sweep correlation compute dtype ("float32"/"bfloat16"). The
    # candidate scan is GATHER-bound (4-tap bilinear warp = ~12M 1KB row
    # gathers per b=3 step, the train step's largest single cost);
    # bfloat16 halves the gathered bytes and runs the correlation dot
    # single-pass on the MXU. The correlation output (and everything
    # downstream) stays f32. Cost-volume correlations feed a softmax'd
    # depth PDF — bf16 feature precision (2^-8 rel) is ample there, but
    # the knob defaults to f32 so parity runs are exact.
    costvolume_dtype: str = "float32"
    # Depth candidates per scan chunk (must divide num_depth_candidates;
    # otherwise the unchunked path runs). Bigger chunks amortize scan
    # overhead against larger transient warped buffers.
    costvolume_scan_chunk: int = 16
    # Rematerialize the two U-Nets individually (the SELECTIVE remat
    # mode: encoder.remat="selective" wraps them here instead of
    # checkpointing this whole predictor — the correlation volume is
    # only ~13 MB of residuals, so recomputing the gather-bound
    # plane-sweep in the backward is pure waste; the U-Net activations
    # are what actually need dropping).
    remat_unets: bool = False


class DepthPredictorMultiView(nn.Module):
    """(v b) layout throughout, like the reference."""

    cfg: DepthPredictorCfg

    @nn.compact
    def __call__(
        self,
        features: Array,       # (b, v, h4, w4, c) quarter-res features
        intrinsics: Array,     # (b, v, 3, 3) normalized
        extrinsics: Array,     # (b, v, 4, 4) w2c (reference passes inverse)
        near: Array,           # (b, v)
        far: Array,            # (b, v)
        images: Array,         # (v b, h, w, 3) full-res context images
        disparity: Array,      # (v b, h, w, 1) monocular disparity
        monocular_cue: Array,  # (v b, h4*4?, ...) one-hot mono cue (v b, H/4... )
    ) -> tuple[Array, Array]:
        cfg = self.cfg
        b, v, h4, w4, c = features.shape
        d = cfg.num_depth_candidates
        h, w = images.shape[1], images.shape[2]

        # ---- plane-sweep correlation volume (reference :294-343) ----
        feat_vb = features.transpose(1, 0, 2, 3, 4).reshape(v * b, h4, w4, c)
        intr_pix = intrinsics.at[..., 0, :].mul(w4).at[..., 1, :].mul(h4)
        intr_vb = intr_pix.transpose(1, 0, 2, 3).reshape(v * b, 3, 3)
        intr_vb = jax.lax.stop_gradient(intr_vb)

        inv_near = 1.0 / near
        inv_far = 1.0 / far
        lin = jnp.linspace(0.0, 1.0, d, dtype=features.dtype)
        disp_candi = (
            inv_far.transpose(1, 0).reshape(v * b, 1)
            + lin[None, :] * (inv_near - inv_far).transpose(1, 0).reshape(v * b, 1)
        )  # (vb, d)
        depth_candi = 1.0 / disp_candi

        cv_dtype = jnp.dtype(cfg.costvolume_dtype)
        feat_vb_cv = feat_vb.astype(cv_dtype)
        corr_sum = jnp.zeros((v * b, d, h4, w4), features.dtype)
        for shift in range(1, v):
            order = [(i + shift) % v for i in range(v)]
            feat_other = (
                features[:, order].transpose(1, 0, 2, 3, 4).reshape(v * b, h4, w4, c)
            ).astype(cv_dtype)
            # relative pose: other_view_w2c @ cur_view_c2w, built from w2c in.
            w2c = extrinsics
            c2w = se3_inverse(w2c)
            rel = jnp.einsum(
                "bvij,bvjk->bvik", w2c[:, order], c2w
            )  # (b, v, 4, 4) maps cur cam -> other cam
            rel_vb = rel.transpose(1, 0, 2, 3).reshape(v * b, 4, 4)
            # Scan over candidate chunks: the full warped volume
            # ((vb, d, h4, w4, c) — 3G per instance at the reference
            # scale, the train step's largest buffers) never
            # materializes; only the (vb, d, h4, w4) correlation leaves
            # the scan, and the backward rematerializes per chunk.
            def corr_of(depth_chunk):
                warped = warp_with_pose_depth_candidates(
                    feat_other, intr_vb, rel_vb, depth_chunk
                )  # (vb, dc, h4, w4, c) in cv_dtype
                return (
                    (feat_vb_cv[:, None] * warped).sum(-1) / (c**0.5)
                ).astype(features.dtype)

            dc = cfg.costvolume_scan_chunk
            if d % dc == 0 and d > dc:
                chunks = depth_candi.reshape(v * b, d // dc, dc)
                chunks = chunks.transpose(1, 0, 2)  # (n_chunks, vb, dc)

                # checkpoint: without it the scan SAVES every chunk's
                # warped features as backward residuals — re-assembling
                # the very volume the scan exists to avoid.
                def corr_chunk(_, depth_chunk):
                    return None, jax.checkpoint(corr_of)(depth_chunk)

                _, parts = jax.lax.scan(corr_chunk, None, chunks)
                corr = parts.transpose(1, 0, 2, 3, 4).reshape(
                    v * b, d, h4, w4
                )
            else:
                corr = corr_of(depth_candi)
            corr_sum = corr_sum + corr
        raw_correlation_in = corr_sum / (v - 1)
        raw_correlation_in = jnp.concatenate(
            [raw_correlation_in.transpose(0, 2, 3, 1), feat_vb], axis=-1
        )  # (vb, h4, w4, d + c)

        # ---- cost-volume U-Net refinement (reference :347-352) ----
        x = nn.Conv(cfg.costvolume_unet_feat_dim, (3, 3))(raw_correlation_in)
        x = nn.GroupNorm(num_groups=8)(x)
        x = nn.gelu(x)
        unet_dtype = jnp.dtype(cfg.unet_dtype)
        UNet = nn.remat(UNetModel) if cfg.remat_unets else UNetModel
        x = UNet(
            model_channels=cfg.costvolume_unet_feat_dim,
            out_channels=cfg.costvolume_unet_feat_dim,
            attention_resolutions=tuple(cfg.costvolume_unet_attn_res),
            channel_mult=tuple(cfg.costvolume_unet_channel_mult),
            num_views=cfg.num_views,
            dtype=unet_dtype,
        )(x)
        raw_correlation = nn.Conv(d, (3, 3))(x)
        raw_correlation = raw_correlation + nn.Conv(d, (1, 1))(raw_correlation_in)

        # ---- mono-guided attention (reference :355-376) ----
        mono = monocular_cue
        for stride in (2, 2):
            mono = nn.Conv(d, (3, 3), strides=(stride, stride))(mono)
            mono = nn.gelu(mono)
        multi = raw_correlation
        for _ in range(2):
            multi = nn.Conv(d, (3, 3))(multi)
            multi = nn.gelu(multi)
        # downsample multi to mono's resolution via strided slice-free pooling
        hd, wd = mono.shape[1], mono.shape[2]
        multi_ds = jax.image.resize(
            multi, (multi.shape[0], hd, wd, d), "bilinear"
        )
        q = nn.Conv(d, (1, 1))(mono).reshape(v * b, hd * wd, d)
        k = nn.Conv(d, (1, 1))(mono).reshape(v * b, hd * wd, d)
        val = nn.Conv(d, (1, 1))(multi_ds).reshape(v * b, hd * wd, d)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k, precision="highest"), axis=-1
        )
        fused = jnp.einsum("bnm,bmc->bnc", attn, val).reshape(v * b, hd, wd, d)
        fused = jax.image.resize(fused, (v * b, h4, w4, d), "nearest")
        multi_residual = nn.gelu(nn.Conv(d, (1, 1))(raw_correlation))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        fused_cost_volume = multi_residual + gamma * fused

        # ---- softmax depth PDF (reference :379-384) ----
        pdf_in = nn.Conv(2 * d, (3, 3))(fused_cost_volume)
        pdf_in = nn.gelu(pdf_in)
        pdf = jax.nn.softmax(nn.Conv(d, (3, 3))(pdf_in), axis=-1)
        pdf_max = pdf.max(axis=-1, keepdims=True)  # (vb, h4, w4, 1)
        pdf_max = jax.image.resize(pdf_max, (v * b, h, w, 1), "nearest")

        # ---- full-res refinement U-Net (reference :386-399) ----
        up = nn.Conv(cfg.feature_channels, (3, 3))(feat_vb)
        up = jax.image.resize(
            up, (v * b, h, w, cfg.feature_channels), "bilinear"
        )
        proj_feat_fullres = nn.gelu(up)
        proj_feature = nn.Conv(cfg.depth_unet_feat_dim, (3, 3))(proj_feat_fullres)
        refine_in = jnp.concatenate(
            [images, proj_feature, disparity, pdf_max], axis=-1
        )
        r = nn.Conv(cfg.depth_unet_feat_dim, (3, 3))(refine_in)
        r = nn.GroupNorm(num_groups=4)(r)
        r = nn.gelu(r)
        refine_out = UNet(
            model_channels=cfg.depth_unet_feat_dim,
            out_channels=cfg.depth_unet_feat_dim,
            attention_resolutions=tuple(cfg.depth_unet_attn_res),
            channel_mult=tuple(cfg.depth_unet_channel_mult),
            num_views=cfg.num_views,
            dtype=unet_dtype,
        )(r)

        # ---- gaussian + opacity heads (reference :401-415) ----
        g_in = jnp.concatenate([refine_out, images, proj_feat_fullres], axis=-1)
        g = nn.Conv(cfg.gaussian_raw_channels * 2, (3, 3))(g_in)
        g = nn.gelu(g)
        raw_gaussians = nn.Conv(cfg.gaussian_raw_channels, (3, 3))(g)
        raw_gaussians = (
            raw_gaussians.reshape(v, b, h * w, cfg.gaussian_raw_channels)
            .transpose(1, 0, 2, 3)
        )  # (b, v, hw, c)

        d_in = jnp.concatenate([refine_out, disparity, proj_feat_fullres], axis=-1)
        dd = nn.Conv(cfg.depth_unet_feat_dim * 2, (3, 3))(d_in)
        dd = nn.gelu(dd)
        delta_disps_density = nn.Conv(cfg.gaussians_per_pixel * 2, (3, 3))(dd)
        raw_densities = delta_disps_density[..., cfg.gaussians_per_pixel :]
        densities = (
            jax.nn.sigmoid(raw_densities)
            .reshape(v, b, h * w, cfg.gaussians_per_pixel)
            .transpose(1, 0, 2, 3)
        )  # (b, v, hw, gpp)
        return densities, raw_gaussians
