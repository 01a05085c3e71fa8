"""PF3plat model assembly: frozen perception + matcher + encoder + decoder.

The top-level model object tying the pipeline together, mirroring the
reference's `ModelWrapper`-owned encoder/decoder pair
(`src/model/model_wrapper.py:85-137`): UniDepth (frozen) supplies metric
depth + backbone features, SuperPoint+LightGlue (frozen) supply fixed-size
masked correspondences, the trainable `PoseFreeEncoder` predicts poses +
Gaussians, and the splatting decoder renders.

Parameters are split into `frozen` (not trained; converted checkpoints) and
`trainable` (the encoder), matching the reference's requires_grad split
(`model_wrapper.py:131-136`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.rasterizer import RasterizeConfig
from .backbones.lightglue import LightGlue
from .backbones.matching import match_context_views
from .backbones.superpoint import SuperPoint
from .backbones.unidepth import UniDepth, UniDepthCfg
from .backbones.vgg_lpips import LPIPS
from .decoder import DecoderCfg, decode
from .encoder import (
    Correspondences,
    EncoderCfg,
    EncoderOutput,
    FrozenInputs,
    PoseFreeEncoder,
)
from .types import DecoderOutput

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PF3platCfg:
    encoder: EncoderCfg = EncoderCfg()
    decoder: DecoderCfg = DecoderCfg()
    unidepth: UniDepthCfg = UniDepthCfg()
    max_keypoints: int = 1024
    max_matches: int = 512
    lightglue_layers: int = 9
    # Matmul precision for the FROZEN perception stage (UniDepth ViT-L,
    # SuperPoint, LightGlue): "bfloat16" = one MXU pass per matmul (the
    # TPU-native inference mode; the 24 ViT-L blocks dominate the forward
    # step otherwise), "highest" = full f32. Parity tests exercise the
    # backbones directly at full precision; this scope only affects the
    # production perceive() path. Documented deviation in PARITY.md.
    frozen_matmul_precision: str = "bfloat16"


class PF3platParams(NamedTuple):
    trainable: Any   # encoder params
    frozen: Any      # {"unidepth", "superpoint", "lightglue"}


class PF3plat:
    """Functional model bundle (modules are stateless; params are explicit)."""

    def __init__(self, cfg: PF3platCfg):
        self.cfg = cfg
        self.encoder = PoseFreeEncoder(cfg.encoder)
        self.unidepth = UniDepth(cfg.unidepth)
        self.superpoint = SuperPoint(max_num_keypoints=cfg.max_keypoints)
        self.lightglue = LightGlue(n_layers=cfg.lightglue_layers)
        # LPIPS VGG is frozen like the reference's buffer-converted loss
        # network (`src/loss/loss_lpips.py:33-34`, `nn_module_tools.py:4-16`).
        self.lpips = LPIPS()

    def init(self, rng: Array, images: Array, intrinsics: Array,
             near: Array, far: Array) -> PF3platParams:
        """Initialize all parameter trees from an example batch."""
        b, v, h, w, _ = images.shape
        r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 6)
        flat_img = images.reshape(b * v, h, w, 3)
        flat_intr = intrinsics.reshape(b * v, 3, 3)
        ud_params = self.unidepth.init(r1, flat_img, flat_intr)
        sp_params = self.superpoint.init(r2, flat_img)
        kp = self.superpoint.apply(sp_params, flat_img[:1])
        lg_params = self.lightglue.init(r3, kp, kp, (h, w))

        frozen = {
            "unidepth": ud_params,
            "superpoint": sp_params,
            "lightglue": lg_params,
            "lpips": self.lpips.init(r6, flat_img[:1], flat_img[:1]),
        }
        frozen_out, corr = self.perceive(frozen, images, intrinsics)
        enc_params = self.encoder.init(
            r4, images, intrinsics, near, far, frozen_out, corr,
            jnp.asarray(0), r5,
        )
        return PF3platParams(trainable=enc_params, frozen=frozen)

    def perceive(
        self, frozen_params, images: Array, intrinsics: Array
    ) -> tuple[FrozenInputs, Correspondences]:
        """Frozen stage: monocular depth + features + correspondences.

        Runs under `cfg.frozen_matmul_precision` (default one-pass-bf16
        MXU matmuls with f32 accumulation — the frozen ViT-L blocks were
        the forward step's single largest cost at full f32 precision)."""
        b, v, h, w, _ = images.shape
        with jax.default_matmul_precision(self.cfg.frozen_matmul_precision):
            out = self.unidepth.apply(
                frozen_params["unidepth"],
                images.reshape(b * v, h, w, 3),
                intrinsics.reshape(b * v, 3, 3),
            )
            depth = jax.lax.stop_gradient(out.depth).reshape(b, v, h, w)
            feats = jax.lax.stop_gradient(out.features)
            feats = feats.reshape(b, v, *feats.shape[1:])
            corr = match_context_views(
                self.superpoint, frozen_params["superpoint"],
                self.lightglue, frozen_params["lightglue"],
                images, max_matches=self.cfg.max_matches,
            )
        corr = jax.tree_util.tree_map(jax.lax.stop_gradient, corr)
        return FrozenInputs(depth=depth, features=feats), corr

    def lpips_apply(self, frozen_params, img0: Array, img1: Array) -> Array:
        """Frozen LPIPS distance (b, h, w, 3) x2 -> (b,); gradient flows to
        the images, not the VGG weights (reference `loss_lpips.py:44-60`).
        Rematerialized: the VGG feature pyramid is recomputed on the
        backward pass instead of held across the whole step."""
        fn = jax.checkpoint(
            lambda p, a, b_: self.lpips.apply(p, a, b_)
        )
        return fn(
            jax.lax.stop_gradient(frozen_params["lpips"]), img0, img1
        )

    def forward(
        self,
        params: PF3platParams,
        images: Array,       # (b, v, h, w, 3) context stack
        intrinsics: Array,   # (b, v, 3, 3)
        near: Array,
        far: Array,
        global_step: Array,
        rng: Array,
        render_views: bool = True,
        depth_mode=None,
        mesh=None,
    ) -> tuple[EncoderOutput, Optional[DecoderOutput]]:
        """`depth_mode`: optional depth rendering mode ("depth", "disparity",
        "relative_disparity", "log") — splats camera-space Z alongside color,
        like the reference's test/val depth renders
        (`src/model/model_wrapper.py:269-278`)."""
        h, w = images.shape[2:4]
        frozen_out, corr = self.perceive(params.frozen, images, intrinsics)
        enc = self.encoder.apply(
            params.trainable, images, intrinsics, near, far,
            frozen_out, corr, global_step, rng,
        )
        out = None
        if render_views:
            c2w = jnp.linalg.inv(enc.refined_poses)
            out = decode(
                self.cfg.decoder, enc.gaussians, c2w, intrinsics, near, far,
                (h, w), depth_mode=depth_mode, mesh=mesh,
            )
        return enc, out
