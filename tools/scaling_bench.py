"""Measure rasterizer rays/s scaling across mesh layouts.

BASELINE config 5 asks for >=80% linear rays/s scaling; this harness runs
the bench scene through `render(impl="pallas", mesh=...)` for each mesh
layout that fits the available devices and reports rays/s + efficiency
vs the single-device run.

On real multi-chip hardware this is the scaling measurement of record;
on the 8-virtual-device CPU backend it validates the harness itself
(absolute numbers are meaningless there — interpret-mode kernels).

Usage: python tools/scaling_bench.py [image_side] [iters] [impl] [out.json]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def make_scene(h, w, cams):
    rng = np.random.default_rng(0)
    n = 2 * h * w
    xs = rng.uniform(-2, 2, (cams, n))
    ys = rng.uniform(-2, 2, (cams, n))
    z = 4.0 + 0.3 * np.sin(3 * xs) * np.cos(2 * ys)
    means = np.stack([xs, ys, z], axis=-1)
    cov = np.zeros((cams, n, 3, 3))
    for i in range(3):
        cov[..., i, i] = rng.uniform(0.004, 0.012, (cams, n)) ** 2
    sh = (rng.standard_normal((cams, n, 3, 25)) * 0.2).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, (cams, n))
    to = lambda a: jnp.asarray(a, jnp.float32)
    return dict(
        extrinsics=to(np.broadcast_to(np.eye(4), (cams, 4, 4))),
        intrinsics=to(np.broadcast_to(
            np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]),
            (cams, 3, 3))),
        near=jnp.ones((cams,)), far=jnp.full((cams,), 100.0),
        background=jnp.zeros((cams, 3)),
        means=to(means), covariances=to(cov), sh=to(sh), opacities=to(opac),
    )


def measure(scene, h, w, mesh, iters, impl):
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig, render

    # Production compaction on (compact_min_pairs=0 so small harness
    # scenes engage it too): multi-shard meshes then take the
    # SHARD-LOCAL pipeline (ops/rasterizer/shard_local.py) — per-shard
    # compaction, sort, composite, unsort, banded reduce — which is the
    # scaling design of record.
    cfg = RasterizeConfig(pairs_budget_factor=0.48, compact_min_pairs=0)
    target = jnp.zeros((scene["means"].shape[0], h, w, 3))

    def loss(means):
        img = render(
            scene["extrinsics"], scene["intrinsics"], scene["near"],
            scene["far"], (h, w), scene["background"], means,
            scene["covariances"], scene["sh"], scene["opacities"],
            impl=impl, config=cfg, mesh=mesh,
        )
        return jnp.mean((img - target) ** 2)

    step = jax.jit(jax.grad(loss))
    g = step(scene["means"])
    np.asarray(g).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        g = step(scene["means"])
    np.asarray(g).ravel()[:1]
    dt = (time.time() - t0) / iters
    return scene["means"].shape[0] * h * w / dt / 1e6


def main() -> None:
    from pf3plat_tpu.parallel import MeshCfg, make_mesh

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    impl = sys.argv[3] if len(sys.argv) > 3 else "streamed"
    out_path = Path(sys.argv[4]) if len(sys.argv) > 4 else None
    h = w = side
    n_dev = len(jax.devices())
    cams = 2
    scene = make_scene(h, w, cams)

    layouts = [None]
    k = 2
    while k <= n_dev:
        layouts.append(k)
        k *= 2

    results = []
    base = None
    for tile in layouts:
        mesh = None
        if tile is not None:
            mesh = make_mesh(
                MeshCfg(data_axis=1, tile_axis=tile),
                devices=jax.devices()[:tile],
            )
        mrays = measure(scene, h, w, mesh, iters, impl)
        n = 1 if tile is None else tile
        if base is None:
            base = mrays
        eff = mrays / (base * n)
        results.append({
            "devices": n, "mrays_per_s": round(mrays, 3),
            "scaling_efficiency": round(eff, 4),
        })
        print(json.dumps(results[-1]), flush=True)

    # Fixed-work-per-device (weak scaling): the image WIDTH scales with
    # the device count, so every shard owns the same number of tile rows
    # as the 1-device base run — isolates the replicated stages and the
    # psum from the shrinking-shard effects of the strong-scaling sweep.
    weak = []
    base_w = None
    for tile in layouts:
        n = 1 if tile is None else tile
        mesh = None
        if tile is not None:
            mesh = make_mesh(
                MeshCfg(data_axis=1, tile_axis=tile),
                devices=jax.devices()[:tile],
            )
        scene_k = make_scene(h, w * n, cams)
        mrays = measure(scene_k, h, w * n, mesh, iters, impl)
        if base_w is None:
            base_w = mrays
        weak.append({
            "devices": n, "mrays_per_s": round(mrays, 3),
            # time_1 / time_k at k x the work == mrays_k / (k * mrays_1)
            "weak_efficiency": round(mrays / (base_w * n), 4),
        })
        print(json.dumps(weak[-1]), flush=True)

    # Amdahl projection from the v5e single-chip device trace (round-5
    # numbers, tools/profile_trace.py on the 256^2 bench scene at the
    # production config; see ROADMAP.md). Under the shard-local pipeline
    # only the candidate-plane build + compaction scan (+ projection/SH
    # glue) replicate; the sorts, compositing kernels, unsort, and
    # banded reduce all run on ~1/S-sized shard arrays.
    v5e_ms = {
        "shardable": {
            "bwd_rmw_kernel": 3.81, "fwd_kernel": 2.78,
            "banded_reduce": 2.30, "fwd_sort": 2.15, "bwd_unsort": 1.95,
        },
        "replicated": {
            "compact_kernel": 0.85, "candidate_build_glue": 0.5,
            "projection_sh": 0.53,
        },
        "other_glue_approx": 1.6,
    }
    sh = sum(v5e_ms["shardable"].values())
    rep_ms = sum(v5e_ms["replicated"].values())
    glue = v5e_ms["other_glue_approx"]
    total = sh + rep_ms + glue
    amdahl = {
        "v5e_single_chip_ms": v5e_ms,
        "shardable_fraction": round((sh + glue * 0.5) / total, 3),
        "projected_efficiency": {
            str(s): round(
                total / (s * ((sh + glue * 0.5) / s + rep_ms + glue * 0.5)),
                3,
            )
            for s in (2, 4, 8)
        },
        "note": ("projection assumes half the unattributed glue shards; "
                 "psum cost excluded (~10 MB/step over ICI)"),
    }

    if out_path is not None:
        out_path.write_text(json.dumps({
            "impl": impl, "side": side, "iters": iters,
            "backend": jax.default_backend(),
            "note": ("harness validation on virtual CPU devices; absolute "
                     "numbers and efficiencies are not hardware-meaningful"
                     " — in particular the virtual devices OVERSUBSCRIBE "
                     f"the host's {os.cpu_count()} physical cores, so "
                     ">=4-device efficiencies are bounded by core "
                     "contention, not the algorithm; the 2-device point "
                     "and the amdahl_model are the decision-grade signals"
                     ) if jax.default_backend() == "cpu" else
                    "hardware scaling measurement",
            "pipeline": "shard_local",
            "results": results,
            "weak_scaling": weak,
            "amdahl_model": amdahl,
        }, indent=2))


if __name__ == "__main__":
    main()
