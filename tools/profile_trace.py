"""Trace the bench-scene rasterizer step with jax.profiler and print the
per-op device-time breakdown + the analytic HBM roofline.

Usage (on the TPU chip):  python tools/profile_trace.py [fwd|fwdbwd] [iters] [impl]
Trace lands under /tmp/pf3plat_trace; the table prints the top fusions so
stage costs (sort / gather / pallas / scatter) are attributed exactly
instead of by ablation.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    impl = sys.argv[3] if len(sys.argv) > 3 else "pallas"

    from pf3plat_tpu.models.decoder import DecoderCfg, decode
    from pf3plat_tpu.models.types import Gaussians
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig
    from pf3plat_tpu.utils import profiling

    rng = np.random.default_rng(0)
    b, v, h, w = 1, 2, 256, 256
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
    gauss = Gaussians(to(means), to(cov), to(sh), to(opac))
    extr = to(np.broadcast_to(np.eye(4), (b, v, 4, 4)))
    intr = to(np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)))
    near = jnp.ones((b, v))
    far = jnp.full((b, v), 100.0)
    target = to(rng.uniform(0, 1, (b, v, h, w, 3)))

    import os

    cfg = DecoderCfg(
        impl=impl,
        raster=RasterizeConfig(
            chunk=int(os.environ.get("PF3PLAT_BENCH_CHUNK", "128")),
            pairs_budget_factor=float(
                os.environ.get("PF3PLAT_BUDGET_FACTOR", "0")
            ),
            compact_window=int(
                os.environ.get("PF3PLAT_COMPACT_WINDOW", "4096")
            ),
        ),
    )

    def loss_fn(g):
        out = decode(cfg, g, extr, intr, near, far, (h, w))
        return jnp.mean((out.color - target) ** 2)

    if mode == "fwd":
        step = jax.jit(loss_fn)
    else:
        step = jax.jit(jax.grad(loss_fn))

    out = step(gauss)  # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    trace_dir = Path("/tmp/pf3plat_trace")
    with profiling.trace(trace_dir):
        for _ in range(iters):
            out = step(gauss)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    rows = profiling.device_op_breakdown(trace_dir)
    print(profiling.format_breakdown(rows, top=60))
    total_us = sum(r["total_us"] for r in rows)
    print(f"\ndevice total: {total_us / iters / 1e3:.3f} ms/iter over {iters} iters")

    model = profiling.raster_traffic_model(cfg.raster, (h, w), b * v, n)
    print("\nHBM traffic model (fwd+bwd):")
    for k, val in model.as_dict().items():
        print(f"  {k}: {val:,.1f}" if isinstance(val, float) else f"  {k}: {val:,}")


if __name__ == "__main__":
    main()
