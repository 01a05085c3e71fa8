"""Full-model train-step latency on the real chip (BASELINE config 2).

Times one jitted train step (frozen perception -> encoder -> render ->
losses -> Adam update) of the full-scale re10k model on a synthetic batch,
mirroring the reference's latency accounting
(`src/misc/benchmarker.py:15-28`, `model_wrapper.py:262-278` — reference
trains batch 3 at 256x256 on an A6000, `README.md:82`).

Usage: python tools/bench_train.py [batch] [side] [iters] [--trace] [--fwd]
                                   [key=value ...]
Prints one JSON line {step_ms, ...}; --trace additionally dumps the per-op
device-time breakdown (top fusions) so encoder stage costs are attributed.
--fwd times the forward (encoder+decoder) only, the reference's
benchmark.json quantity. Bare key=value args become config overrides
(e.g. encoder.unet_dtype=bfloat16, encoder.remat=false).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    argv = sys.argv[1:]
    cli_overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    args = [a for a in argv if not a.startswith("--") and "=" not in a]
    flags = {a for a in argv if a.startswith("--")}
    b = int(args[0]) if len(args) > 0 else 3
    side = int(args[1]) if len(args) > 1 else 256
    iters = int(args[2]) if len(args) > 2 else 10
    v = 2

    from pf3plat_tpu.main import build_model
    from pf3plat_tpu.models.pf3plat import PF3platParams
    from pf3plat_tpu.training.train import (
        init_train_state, make_model_train_step, make_optimizer,
    )
    from pf3plat_tpu.utils.config import load_config

    overrides = [f"dataset.image_shape=[{side},{side}]"]
    if "--tiny" in flags:  # CPU smoke test of the harness itself
        overrides += [
            "model.tiny_backbones=true", "model.max_keypoints=64",
            "model.max_matches=32", "model.lightglue_layers=2",
            "encoder.d_feature=32", "encoder.d_backbone=128",
            "encoder.num_depth_candidates=16",
            "encoder.multiview_trans_attn_split=2",
            "encoder.n_attn_layers=2", "encoder.d_pose=32",
            "encoder.ransac_samples=32",
            "encoder.gaussian_adapter.sh_degree=1",
            "encoder.costvolume_unet_feat_dim=16",
            "encoder.costvolume_unet_channel_mult=[1,1]",
            "encoder.costvolume_unet_attn_res=[2]",
            "encoder.depth_unet_feat_dim=8",
            "encoder.depth_unet_attn_res=[4]",
            "encoder.depth_unet_channel_mult=[1,1,1]",
            "decoder.raster.tile_capacity=256",
        ]
    overrides += cli_overrides
    cfg = load_config(
        Path(__file__).resolve().parent.parent / "configs" / "re10k.yaml",
        overrides,
    )
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, v, side, side, 3)), jnp.float32)
    intr = jnp.asarray(np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)),
        jnp.float32)
    near = jnp.ones((b, v))
    far = jnp.full((b, v), 100.0)
    # Union trick: context == target stack, so targets match rendered views.
    targets = jnp.asarray(
        rng.uniform(0, 1, (b, v, side, side, 3)), jnp.float32
    )

    key = jax.random.PRNGKey(0)
    print("init...", file=sys.stderr, flush=True)
    t0 = time.time()
    params = jax.jit(model.init)(key, images, intr, near, far)
    np.asarray(jax.tree_util.tree_leaves(params.trainable)[0]).ravel()[:1]
    print(f"init done in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    if "--fwd" in flags:
        def fwd(tp, frozen):
            enc, out = model.forward(
                PF3platParams(tp, frozen), images, intr, near, far,
                jnp.asarray(0), jax.random.PRNGKey(1),
            )
            return out.color

        step_args = (params.trainable, params.frozen)
        step = jax.jit(fwd)
        sync = lambda o: np.asarray(o).ravel()[:1]
        mode = "forward"
    else:
        opt = make_optimizer(cfg.optimizer)
        state = init_train_state(params.trainable, opt)
        # target views mirror the re10k protocol (1 target view per sample)
        batch = {
            "context": {"image": images, "intrinsics": intr,
                        "near": near, "far": far},
            "target": {"image": targets},
            "frozen_params": params.frozen,
        }
        train_step = make_model_train_step(
            model, cfg.loss, opt, (side, side)
        )
        jstep = jax.jit(train_step)

        def step(st, _):
            st, aux = jstep(st, batch, jax.random.PRNGKey(2))
            return st

        state0 = state
        step_args = (state0, None)
        sync = lambda st: np.asarray(
            jax.tree_util.tree_leaves(st.params)[0]).ravel()[:1]
        mode = "train"

    print("compile...", file=sys.stderr, flush=True)
    t0 = time.time()
    out = step(*step_args)
    sync(out)
    compile_s = time.time() - t0
    print(f"compile+first step {compile_s:.1f}s", file=sys.stderr, flush=True)

    def measure(n):
        o = step(*step_args)
        sync(o)
        t0 = time.time()
        cur = step_args
        for _ in range(n):
            o = step(*cur)
            if mode == "train":
                cur = (o, None)
        sync(o)
        return (time.time() - t0) / n

    windows = [measure(iters) for _ in range(2)]
    dt = float(np.mean(windows))

    rec = {
        "metric": f"{mode}_step_{side}x{side}_b{b}",
        "step_ms": round(dt * 1e3, 2),
        "windows_ms": [round(x * 1e3, 2) for x in windows],
        "iters": iters,
        "compile_s": round(compile_s, 1),
    }
    if cli_overrides:
        rec["overrides"] = cli_overrides
    print(json.dumps(rec), flush=True)

    if "--trace" in flags:
        from pf3plat_tpu.utils import profiling

        trace_dir = Path("/tmp/pf3plat_train_trace")
        with profiling.trace(trace_dir):
            o = step(*step_args)
            cur = (o, None) if mode == "train" else step_args
            for _ in range(max(2, iters // 2) - 1):
                o = step(*cur)
                if mode == "train":
                    cur = (o, None)
            sync(o)
        rows = profiling.device_op_breakdown(trace_dir)
        print(profiling.format_breakdown(rows, top=60), flush=True)


if __name__ == "__main__":
    main()
