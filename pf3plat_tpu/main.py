"""CLI entry point: `python -m pf3plat_tpu.main [config.yaml] key=value ...`.

Plays the role of the reference's `src/main.py:37-155` (Hydra entry, Trainer
setup, fit/test): loads the typed config, builds the model + data pipeline,
and runs the training loop (SPMD over the device mesh, orbax checkpoints,
periodic logging) or the evaluation harness.

Modes:
  mode=train   train on chunk datasets under dataset.roots
  mode=test    run the evaluation protocol over the test split
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def build_model(cfg):
    from .models.backbones.unidepth import UniDepthCfg
    from .models.pf3plat import PF3plat, PF3platCfg

    unidepth = (
        UniDepthCfg.tiny_test() if cfg.model.tiny_backbones else UniDepthCfg()
    )
    return PF3plat(
        PF3platCfg(
            encoder=cfg.encoder,
            decoder=cfg.decoder,
            unidepth=unidepth,
            max_keypoints=cfg.model.max_keypoints,
            max_matches=cfg.model.max_matches,
            lightglue_layers=cfg.model.lightglue_layers,
            frozen_matmul_precision=cfg.model.frozen_matmul_precision,
        )
    )


def batch_iterator(cfg, stage, host_id, num_hosts, get_step):
    """Yield fixed-shape batches, grouping examples by view count.

    JPEG decode runs on a background thread pool (`data/prefetch.py`) —
    the reference's multi-worker DataLoader equivalent
    (`src/dataset/data_module.py:90-110`).
    """
    from .data.dataset import ChunkDataset, batch_examples
    from .data.prefetch import ExamplePipeline
    from .data.view_samplers import (
        AllViewSampler,
        BoundedViewSampler,
        EvaluationViewSampler,
    )

    if stage == "test" and cfg.test.sampler == "all":
        # Trajectory-video evaluation: every (subsampled) frame is context
        # and target (reference `view_sampler_all.py`).
        sampler = AllViewSampler(max_views=cfg.test.all_sampler_max_views)
    elif cfg.evaluation_index is not None and stage == "test":
        sampler = EvaluationViewSampler(cfg.evaluation_index)
    else:
        sampler = BoundedViewSampler(cfg.view_sampler, stage=stage)
    ds = ChunkDataset(
        cfg.dataset, sampler, stage=stage, host_id=host_id,
        num_hosts=num_hosts, seed=cfg.data_loader.seed,
    )
    pipeline = ExamplePipeline(
        ds, get_step,
        num_workers=cfg.data_loader.num_workers,
        prefetch=cfg.data_loader.prefetch,
    )
    target_bs = cfg.data_loader.batch_size if stage == "train" else 1
    pending: dict[int, list] = {}
    try:
        while True:
            produced = False
            for ex in pipeline:
                produced = True
                v = ex["context"]["image"].shape[0]
                pending.setdefault(v, []).append(ex)
                if len(pending[v]) == target_bs:
                    yield batch_examples(pending.pop(v))
            if stage != "train" or not produced:
                return
    finally:
        pipeline.close()


def run_train(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from .parallel import MeshCfg, make_mesh, replicate, shard_batch
    from .training.checkpoints import CheckpointManager
    from .training.train import (
        TrainState,
        init_train_state,
        make_model_train_step,
        make_optimizer,
    )

    model = build_model(cfg)
    tile = max(1, cfg.train.tile_axis)
    n_data = max(
        1, min(len(jax.devices()) // tile, cfg.data_loader.batch_size)
    )
    mesh = make_mesh(
        MeshCfg(data_axis=n_data, tile_axis=tile),
        devices=jax.devices()[: n_data * tile],
    )
    host_id, num_hosts = jax.process_index(), jax.process_count()
    print(f"mesh: data={n_data} tile={tile} hosts={num_hosts}", flush=True)

    step_holder = {"step": 0}
    batches = batch_iterator(
        cfg, "train", host_id, num_hosts, lambda: step_holder["step"]
    )
    first = next(batches)
    images = jnp.asarray(first["context"]["image"])
    intr = jnp.asarray(first["context"]["intrinsics"])
    near = jnp.asarray(first["context"]["near"])
    far = jnp.asarray(first["context"]["far"])

    rng = jax.random.PRNGKey(cfg.seed)
    print("initializing model...", flush=True)
    params = jax.jit(model.init)(rng, images, intr, near, far)
    print("model initialized", flush=True)
    if cfg.weights is not None:
        from .training.pretrained import load_pretrained_frozen

        params = params._replace(
            frozen=load_pretrained_frozen(cfg.weights, params.frozen)
        )

    opt = make_optimizer(cfg.optimizer)
    state = init_train_state(params.trainable, opt)
    ckpt = CheckpointManager(cfg.checkpointing)
    # restore_latest may warm-start from checkpointing.load, which also
    # carries that run's frozen/ dir — so resolve state BEFORE deciding
    # whether frozen weights exist.
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    had_frozen = ckpt.has_frozen()
    ckpt.save_frozen(params.frozen)
    if had_frozen:
        # Resume must reuse the run's frozen perception weights (converted
        # or first-init), not a fresh re-init — otherwise a resumed run
        # silently trains against different frozen features.
        params = params._replace(frozen=ckpt.restore_frozen(params.frozen))

    step_fn = jax.jit(
        make_model_train_step(
            model, cfg.loss, opt,
            tuple(cfg.dataset.image_shape),
            mesh=mesh if n_data * tile > 1 else None,
        ),
        donate_argnums=(0,),
    )

    state = replicate(mesh, state)
    frozen = replicate(mesh, params.frozen)

    def to_batch(raw):
        b = {
            "context": {
                k: jnp.asarray(v)
                for k, v in raw["context"].items()
                if k != "index"
            },
            "target": {"image": jnp.asarray(raw["target"]["image"])},
        }
        return shard_batch(mesh, b)

    def next_batch():
        nonlocal batches
        try:
            return to_batch(next(batches))
        except StopIteration:
            batches = batch_iterator(
                cfg, "train", host_id, num_hosts, lambda: step_holder["step"]
            )
            return to_batch(next(batches))

    # Jitted validation paths (eager execution over a relay backend would
    # cost one round-trip per primitive).
    from .models.decoder import decode as _decode

    val_forward = jax.jit(
        lambda p, im, k, nr, fr, s, r: model.forward(p, im, k, nr, fr, s, r)
    )
    val_decode = jax.jit(
        lambda g, traj, k, nr, fr: _decode(
            model.cfg.decoder, g, traj, k, nr, fr,
            tuple(cfg.dataset.image_shape),
        )
    )

    # Scalar stream (the reference's wandb.log equivalent): one JSONL row
    # per log step under the run directory.
    from .utils.logging import LocalLogger

    log_dir = cfg.output_dir or Path(cfg.test.output_path).parent / "logs"
    logger = LocalLogger(log_dir)

    # Host loop with dispatch/compute overlap: the step counter lives on the
    # host (no per-step device sync), and batch N+1 is decoded while step N
    # runs on device; device_get happens only on checkpoint steps (the
    # reference gets the same overlap from multi-worker DataLoaders,
    # `src/dataset/data_module.py:90-110`).
    t0 = time.time()
    batch = to_batch(first)
    step = int(state.step)
    if cfg.train.sanity_validation and step == 0:
        # Reference `num_sanity_val_steps` — fail fast on broken
        # visualization/render paths before hours of training.
        run_validation(
            cfg, model, state.params, params.frozen,
            batch, jax.random.fold_in(rng, 2**30), step,
            forward_fn=val_forward, decode_fn=val_decode,
        )
    while step < cfg.max_steps:
        sub = jax.random.fold_in(rng, step)
        batch_full = dict(batch, frozen_params=frozen)
        state, aux = step_fn(state, batch_full, sub)
        step += 1
        step_holder["step"] = step
        if step < cfg.max_steps:
            batch = next_batch()  # overlaps with the device step
        if step % cfg.train.print_log_every_n_steps == 0:
            a = jax.device_get(aux)  # one transfer (also the loop sync)
            dt = time.time() - t0
            t0 = time.time()
            parts = " ".join(
                f"{k}={float(v):.5f}"
                for k, v in sorted(a.items())
                if k not in ("loss", "psnr", "mse") and np.ndim(v) == 0
            )
            print(
                f"step {step}: loss={float(a['loss']):.5f} "
                f"psnr={float(a['psnr']):.2f} "
                f"mse={float(a['mse']):.5f} {parts} {dt:.2f}s",
                flush=True,
            )
            logger.log_scalars(
                step,
                {k: v for k, v in a.items() if np.ndim(v) == 0}
                | {"seconds": dt},
            )
        if step % cfg.train.val_check_interval == 0:
            # state.params stays on device — val_forward is jitted and a
            # host round-trip of the full trainable tree per validation
            # would stall the loop.
            run_validation(
                cfg, model, state.params, params.frozen,
                batch, jax.random.fold_in(rng, 2**30 + step), step,
                forward_fn=val_forward, decode_fn=val_decode,
            )
        final = step >= cfg.max_steps
        if step % cfg.checkpointing.every_n_steps == 0 or final:
            # orbax's interval policy silently skips off-interval steps, so
            # the final step must be forced or short runs end checkpoint-less.
            ckpt.maybe_save(jax.device_get(state), force=final)
    logger.close()
    ckpt.wait()


def run_validation(
    cfg, model, trainable, frozen, batch, rng, step,
    forward_fn, decode_fn,
) -> None:
    """Periodic holdout visualization — the reference's rank-0
    `validation_step` (`src/model/model_wrapper.py:416-596`): render the
    current batch's first example, save GT/pred comparison + depth panels
    and a wobble trajectory video under the run directory.
    """
    import jax.numpy as jnp
    import numpy as np

    from .models.pf3plat import PF3platParams
    from .visualization.encoder_vis import encoder_internals_panels
    from .visualization.layout import save_video
    from .visualization.trajectories import generate_wobble
    from .visualization.validation import comparison_panel

    out_dir = Path(cfg.test.output_path).parent / "validation" / f"step_{step:07}"
    try:
        ctx = batch["context"]
        take1 = lambda x: jnp.asarray(np.asarray(x)[:1])
        images = take1(ctx["image"])
        intr = take1(ctx["intrinsics"])
        near = take1(ctx["near"])
        far = take1(ctx["far"])
        p = PF3platParams(trainable=trainable, frozen=frozen)
        enc, out = forward_fn(
            p, images, intr, near, far, jnp.asarray(step), rng
        )
        comparison_panel(
            np.asarray(images[0]),
            np.asarray(batch["target"]["image"][:1][0]),
            np.asarray(out.color[0]),
            depth=np.asarray(enc.depths[0]),
            path=out_dir / "comparison.png",
        )
        encoder_internals_panels(np.asarray(images[0]), enc, out_dir)
        c2w = jnp.linalg.inv(enc.refined_poses)[0]
        t = jnp.linspace(0.0, 1.0, 24)
        delta = 0.25 * jnp.linalg.norm(c2w[-1, :3, 3] - c2w[0, :3, 3]) + 1e-3
        traj = generate_wobble(c2w[0], delta, t)[None]
        f = traj.shape[1]
        vid = decode_fn(
            enc.gaussians, traj,
            jnp.broadcast_to(intr[:, :1], (1, f, 3, 3)),
            jnp.broadcast_to(near[:, :1], (1, f)),
            jnp.broadcast_to(far[:, :1], (1, f)),
        )
        save_video(
            [np.asarray(fr) for fr in vid.color[0]], out_dir / "wobble.mp4"
        )
        print(f"validation artifacts -> {out_dir}", flush=True)
    except Exception as e:  # validation must never kill training
        print(f"validation at step {step} failed: {e}", flush=True)


def run_test(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from .evaluation.evaluator import EvalCfg, Evaluator
    from .models.pf3plat import PF3platParams
    from .training.checkpoints import CheckpointManager
    from .training.train import init_train_state, make_optimizer

    model = build_model(cfg)
    batches = batch_iterator(cfg, "test", 0, 1, lambda: 0)
    first = next(batches)
    images = jnp.asarray(first["context"]["image"])
    intr = jnp.asarray(first["context"]["intrinsics"])
    near = jnp.asarray(first["context"]["near"])
    far = jnp.asarray(first["context"]["far"])
    rng = jax.random.PRNGKey(cfg.seed)
    params = jax.jit(model.init)(rng, images, intr, near, far)
    if cfg.weights is not None:
        from .training.pretrained import load_pretrained_frozen

        params = PF3platParams(
            params.trainable,
            load_pretrained_frozen(cfg.weights, params.frozen),
        )

    ckpt = CheckpointManager(cfg.checkpointing)
    state = ckpt.restore_latest(
        init_train_state(params.trainable, make_optimizer(cfg.optimizer))
    )
    if state is not None:
        params = PF3platParams(state.params, ckpt.restore_frozen(params.frozen))
        print(f"loaded checkpoint at step {int(state.step)}")

    lpips_apply = None
    if "lpips" in params.frozen:
        lpips_params = params.frozen
        lpips_apply = jax.jit(
            lambda a, b: model.lpips_apply(lpips_params, a, b)
        )

    evaluator = Evaluator(
        EvalCfg(
            output_path=cfg.test.output_path,
            eval_time_skip_steps=cfg.test.eval_time_skip_steps,
            save_image=cfg.test.save_image,
            compute_scores=cfg.test.compute_scores,
            save_video=cfg.test.save_video,
            video_frames=cfg.test.video_frames,
            depth_mode=cfg.test.depth_mode,
        ),
        model, params, lpips_apply=lpips_apply,
    )
    import itertools

    idx = 0
    # Stream examples — materializing the whole split up front would hold
    # the full test set (tens of GB on real RE10K) in host memory.
    for raw in itertools.chain([first], batches):
        rng, sub = jax.random.split(rng)
        rec = evaluator.run_example(raw, sub, idx)
        print(f"[{idx}] {rec}", flush=True)
        idx += 1
    print(json.dumps(evaluator.finalize(), indent=2))


def main(argv=None) -> None:
    from .utils.config import load_config

    argv = list(sys.argv[1:] if argv is None else argv)
    yaml_path = None
    if argv and argv[0].endswith((".yaml", ".yml")):
        yaml_path = Path(argv.pop(0))
    cfg = load_config(yaml_path, argv)

    if cfg.mode == "train":
        run_train(cfg)
    elif cfg.mode == "test":
        run_test(cfg)
    else:
        raise ValueError(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    main()
