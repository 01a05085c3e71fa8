"""Training state + pjit-sharded train step.

Replaces the reference's PyTorch-Lightning `ModelWrapper`
(`src/model/model_wrapper.py:85-805`) with a pure functional design:

  * `TrainState` pytree (params, opt state, step);
  * optimizer: Adam + OneCycle cosine (pct_start 0.01; reference
    `model_wrapper.py:780-805`, lr/config `config/main.yaml:37-41,66`),
    global-norm clip 0.5, and `optax.apply_if_finite` replacing the
    reference's manual NaN-gradient scan-and-skip
    (`model_wrapper.py:210-241`);
  * `make_train_step` builds a jitted (state, batch, rng) -> (state,
    metrics) step; under a `Mesh` the batch axis is sharded over `data`
    and XLA inserts the gradient psum over ICI (replacing Lightning DDP,
    `src/main.py:104-118`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.decoder import DecoderCfg, decode
from ..models.encoder import EncoderCfg, PoseFreeEncoder
from ..models.types import Gaussians
from .losses import LossCfg, total_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OptimizerCfg:
    lr: float = 2e-4
    max_steps: int = 300_001
    cosine_lr: bool = True
    warm_up_steps: int = 2000
    grad_clip: float = 0.5


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def make_optimizer(cfg: OptimizerCfg) -> optax.GradientTransformation:
    if cfg.cosine_lr:
        total = cfg.max_steps + 10
        # Guard: pct_start * total must cover >= 1 step, or the schedule's
        # interval math divides by zero and every update becomes NaN.
        pct_start = max(0.01, 1.5 / total)
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=total,
            peak_value=cfg.lr,
            pct_start=pct_start,
        )
    else:
        schedule = optax.linear_schedule(
            init_value=cfg.lr / cfg.warm_up_steps,
            end_value=cfg.lr,
            transition_steps=cfg.warm_up_steps,
        )
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(schedule),
    )
    # NaN/Inf-robustness: skip non-finite updates (reference scans gradients
    # and skips the step, model_wrapper.py:222-241).
    return optax.apply_if_finite(opt, max_consecutive_errors=100)


def init_train_state(params, opt: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    encoder: PoseFreeEncoder,
    decoder_cfg: DecoderCfg,
    loss_cfg: LossCfg,
    opt: optax.GradientTransformation,
    image_shape: tuple[int, int],
    lpips_apply=None,
):
    """Build the jittable train step.

    Training protocol (reference `dataset_re10k.py:155-157` union trick +
    `model_wrapper.py:139-157`): the context stack IS the target stack —
    gaussians are predicted from the first & last views only, every view is
    re-rendered at its *predicted* pose, and photometric losses count only
    the middle views [1:-1]. The batch dict contains:
      context: image (b,v,h,w,3), intrinsics, near, far
      target:  image (b,v,h,w,3) ground-truth images for the same stack
      frozen:  FrozenInputs for the context views
      corr:    Correspondences for the context views
    """

    def loss_fn(params, batch, rng):
        ctx = batch["context"]
        enc = encoder.apply(
            params["encoder"],
            ctx["image"],
            ctx["intrinsics"],
            ctx["near"],
            ctx["far"],
            batch["frozen"],
            batch["corr"],
            batch["step"],
            rng,
        )
        tgt = batch["target"]
        c2w = jnp.linalg.inv(enc.refined_poses)  # (b, v, 4, 4) predicted c2w
        out = decode(
            decoder_cfg,
            enc.gaussians,
            c2w,
            ctx["intrinsics"],
            ctx["near"],
            ctx["far"],
            image_shape,
        )
        loss, parts = total_loss(
            loss_cfg,
            out.color,
            tgt["image"],
            enc,
            ctx["intrinsics"],
            batch["step"],
            lpips_fn=lpips_apply,
        )
        aux = dict(parts)
        aux["psnr"] = -10.0 * jnp.log10(
            jnp.maximum(jnp.mean((out.color - tgt["image"]) ** 2), 1e-12)
        )
        return loss, aux

    def train_step(state: TrainState, batch, rng):
        batch = dict(batch, step=state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return train_step


def make_model_train_step(
    model,  # PF3plat
    loss_cfg: LossCfg,
    opt: optax.GradientTransformation,
    image_shape: tuple[int, int],
    lpips_apply=None,
    mesh=None,
):
    """Full-pipeline train step: frozen perception runs inside the jitted
    graph (stop-gradient'd), so one `train_step(state, batch, rng)` covers
    images -> depth/matches -> encoder -> render -> losses -> update.

    `state.params` holds only the trainable encoder params; the frozen
    params travel in the batch dict (replicated, never updated).
    """

    def loss_fn(params, batch, rng):
        from ..models.pf3plat import PF3platParams

        ctx = batch["context"]
        enc, out = model.forward(
            PF3platParams(params, batch["frozen_params"]),
            ctx["image"], ctx["intrinsics"], ctx["near"], ctx["far"],
            batch["step"], rng, mesh=mesh,
        )
        # LPIPS trains from step `lpips_apply_after_step` with the frozen
        # VGG carried in the batch's frozen params (reference
        # `loss_lpips.py:27-60`, weight 0.1 from step 0 per
        # `config/experiment/re10k.yaml:31-34`).
        lpips_fn = lpips_apply
        if (
            lpips_fn is None
            and loss_cfg.lpips_weight > 0.0
            and "lpips" in batch["frozen_params"]
        ):
            lpips_fn = lambda a, b: model.lpips_apply(
                batch["frozen_params"], a, b
            )
        loss, parts = total_loss(
            loss_cfg, out.color, batch["target"]["image"], enc,
            ctx["intrinsics"], batch["step"], lpips_fn=lpips_fn,
        )
        aux = dict(parts)
        aux["psnr"] = -10.0 * jnp.log10(
            jnp.maximum(
                jnp.mean((out.color - batch["target"]["image"]) ** 2), 1e-12
            )
        )
        return loss, aux

    def train_step(state: TrainState, batch, rng):
        batch = dict(batch, step=state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), aux

    return train_step
