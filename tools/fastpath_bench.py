"""Measure one rasterizer impl's fwd+bwd throughput on the bench scene.

Usage: python tools/fastpath_bench.py <impl> [iters]
  impl in {pallas, streamed, tiled}

Prints one JSON line per run:
  {"impl", "ms_per_frame", "mrays_per_s", "probe_ms": [...]}

Same scene, shapes, and timing protocol as bench.py (pipelined iterations +
forced host sync — block_until_ready does not synchronize on the axon
tunnel). Run each impl in its own process: a Mosaic fault in one impl must
not take down the others' measurements.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench_scene(side: int):
    """The bench.py scene verbatim: surface + far background layers."""
    rng = np.random.default_rng(0)
    b, v, h, w = 1, 2, side, side
    n = 2 * h * w
    xs = rng.uniform(-2, 2, (b, n))
    ys = rng.uniform(-2, 2, (b, n))
    surf_z = 4.0 + 0.3 * np.sin(3 * xs) * np.cos(2 * ys)
    far_z = rng.uniform(8.0, 12.0, (b, n))
    is_far = rng.random((b, n)) < 0.3
    means = np.stack([xs, ys, np.where(is_far, far_z, surf_z)], axis=-1)
    scales = rng.uniform(0.004, 0.012, (b, n, 3))
    cov = np.zeros((b, n, 3, 3))
    for i in range(3):
        cov[..., i, i] = scales[..., i] ** 2
    sh = (rng.standard_normal((b, n, 3, 25)) * 0.2).astype(np.float32)
    opac = np.where(is_far, rng.uniform(0.2, 0.6, (b, n)),
                    rng.uniform(0.7, 0.99, (b, n)))
    to = lambda a: jnp.asarray(a, jnp.float32)
    from pf3plat_tpu.models.types import Gaussians

    gauss = Gaussians(to(means), to(cov), to(sh), to(opac))
    extr = to(np.broadcast_to(np.eye(4), (b, v, 4, 4)))
    intr = to(np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)))
    near = jnp.ones((b, v))
    far = jnp.full((b, v), 100.0)
    target = to(rng.uniform(0, 1, (b, v, h, w, 3)))
    return gauss, extr, intr, near, far, target, (b, v, h, w)


def main() -> None:
    impl = sys.argv[1] if len(sys.argv) > 1 else "streamed"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    side = int(os.environ.get("PF3PLAT_BENCH_SIDE", "256"))
    tile_size = int(os.environ.get("PF3PLAT_BENCH_TILE_SIZE", "16"))

    from pf3plat_tpu.models.decoder import DecoderCfg, decode
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig

    gauss, extr, intr, near, far, target, (b, v, h, w) = bench_scene(side)

    base_cap = 1024 if side >= 256 else 256
    cap = base_cap * (tile_size * tile_size) // 256
    chunk = int(os.environ.get("PF3PLAT_BENCH_CHUNK", "128"))
    budget_factor = float(os.environ.get("PF3PLAT_BUDGET_FACTOR", "0"))
    compact_window = int(os.environ.get("PF3PLAT_COMPACT_WINDOW", "4096"))
    # Default matches RasterizeConfig (E=1, the measured-fastest config);
    # pass 2/4 explicitly only when probing the unroll knob.
    chunks_per_iter = int(os.environ.get("PF3PLAT_CHUNKS_PER_ITER", "1"))
    cfg = DecoderCfg(
        impl=impl,
        raster=RasterizeConfig(
            tile_size=tile_size,
            tile_capacity=cap,
            chunk=chunk,
            pairs_budget_factor=budget_factor,
            compact_window=compact_window,
            chunks_per_iter=chunks_per_iter,
        ),
    )

    def loss_fn(g):
        out = decode(cfg, g, extr, intr, near, far, (h, w))
        return jnp.mean((out.color - target) ** 2)

    step = jax.jit(jax.grad(loss_fn))

    def measure(n_it):
        g = step(gauss)
        np.asarray(g.means).ravel()[:1]
        t0 = time.time()
        for _ in range(n_it):
            g = step(gauss)
        np.asarray(g.means).ravel()[:1]
        return (time.time() - t0) / n_it

    probe = [measure(8) for _ in range(2)]
    dt = measure(iters)
    rays = b * v * h * w
    rec = {
        "impl": impl,
        "chunks_per_iter": chunks_per_iter,
        "chunk": chunk,
        "budget_factor": budget_factor,
        "compact_window": compact_window,
        "tile_size": tile_size,
        "side": side,
        "ms_per_frame": round(dt * 1e3, 3),
        "mrays_per_s": round(rays / dt / 1e6, 3),
        "probe_ms": [round(p * 1e3, 3) for p in probe],
        "iters": iters,
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
