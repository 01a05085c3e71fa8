"""Driver benchmark: rasterizer fwd+bwd throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...stats}.

Measures the BASELINE.json north-star metric — Mrays/s/chip forward+backward
at 256x256, 2 views, one gaussian per pixel of 2 context views (131k
gaussians) — through the public decoder path. The production default
backend ("streamed", `ops/rasterizer/streamed.py`) is benched first; set
PF3PLAT_BENCH_IMPL to force another (pallas/tiled), or
PF3PLAT_BENCH_PROBE_ALL=1 to probe streamed+pallas and keep the winner
(each extra variant costs a multi-minute compile on the relay backend).

Statistics: the headline value is the MEDIAN of five independent
30-iteration timing windows (the axon relay adds +-2-3 ms of wall-clock
noise per window; the median is robust where a mean is not), with all
windows and their std reported. If the result regresses >5% against the
last committed BENCH_r*.json, a "regression_vs" note is included.

The reference repo publishes no numbers (BASELINE.md); `vs_baseline`
normalizes against an estimated 20 Mrays/s for the reference CUDA
rasterizer fwd+bwd on its A6000 training hardware at this scene size
(~6 ms/frame-pair), so >1.0 means faster than the estimated reference.

NOTE: on the axon tunnel, block_until_ready does not synchronize; timing
uses deep pipelining with a final forced host sync.
"""

import glob
import json
import os
import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_MRAYS = 20.0


def last_committed_bench():
    """(round, mrays) of the newest BENCH_r*.json next to this script."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            rec = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        val = rec.get("value")
        if val is None:
            continue
        r = int(m.group(1))
        if best is None or r > best[0]:
            best = (r, float(val))
    return best


def main() -> None:
    from pf3plat_tpu.models.decoder import DecoderCfg, decode
    from pf3plat_tpu.models.types import Gaussians
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig

    rng = np.random.default_rng(0)
    # PF3PLAT_BENCH_SIDE shrinks the scene for CPU smoke tests of this
    # script; the driver's metric of record is the default 256.
    side = int(os.environ.get("PF3PLAT_BENCH_SIDE", "256"))
    b, v, h, w = 1, 2, side, side
    n = 2 * h * w  # one gaussian per pixel of 2 context views

    # Surface-aligned scene (PF3plat's actual workload): pixel-aligned
    # gaussians on a bumpy opaque surface plus a far background layer —
    # exercises realistic per-tile occupancy and early termination, unlike
    # uniform volumetric fog.
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
    intr = to(
        np.broadcast_to(
            np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
        )
    )
    near = jnp.ones((b, v))
    far = jnp.full((b, v), 100.0)
    target = to(rng.uniform(0, 1, (b, v, h, w, 3)))

    def make_cfg(impl, tile_size=16):
        # Capacity scales with tile area so every variant keeps the same
        # per-pixel truncation behavior (same workload, same output).
        if tile_size < 16 or tile_size % 16:
            raise ValueError(
                f"tile_size must be a multiple of 16 >= 16, got {tile_size}"
            )
        base_cap = 1024 if side >= 256 else 256
        cap = base_cap * (tile_size * tile_size) // 256
        # Pair compaction (production default): with the round-5 tight
        # cull this scene measures 36.1% real-pair occupancy, so 0.48
        # keeps ~33% headroom (matches models/decoder.PRODUCTION_CONFIG).
        # Applies to the streamed impl only; others ignore the fields.
        budget = float(os.environ.get("PF3PLAT_BUDGET_FACTOR", "0.48"))
        return DecoderCfg(
            impl=impl,
            raster=RasterizeConfig(
                tile_size=tile_size,
                tile_capacity=cap,
                chunk=128,
                pairs_budget_factor=budget,
            ),
        )

    # Optional: exercise the tile-sharded render (PF3PLAT_BENCH_TILE_AXIS=k
    # shards the compositing rows over a k-device mesh; needs k chips).
    mesh = None
    tile_axis = int(os.environ.get("PF3PLAT_BENCH_TILE_AXIS", "1"))
    if tile_axis > 1:
        from pf3plat_tpu.parallel import MeshCfg, make_mesh

        mesh = make_mesh(
            MeshCfg(data_axis=1, tile_axis=tile_axis),
            devices=jax.devices()[:tile_axis],
        )

    def make_step(impl, tile_size):
        cfg = make_cfg(impl, tile_size)

        def loss_fn(g):
            out = decode(cfg, g, extr, intr, near, far, (h, w), mesh=mesh)
            return jnp.mean((out.color - target) ** 2)

        return jax.jit(jax.grad(loss_fn))

    def measure(step, iters):
        g = step(gauss)
        np.asarray(g.means).ravel()[:1]  # compile + sync
        t0 = time.time()
        for _ in range(iters):
            g = step(gauss)
        np.asarray(g.means).ravel()[:1]  # forced sync (block_until_ready lies)
        return (time.time() - t0) / iters

    def make_scan_run(impl, tile_size, k):
        """fwd+bwd iterated k times INSIDE one jitted lax.scan — the
        steady-state device throughput, free of the per-call host/relay
        dispatch (~2-3 ms/call on the axon tunnel). This is the rate the
        rasterizer delivers embedded in a jitted train step, where its
        cost is device time, not dispatch. The carry perturbs the input
        by grad*1e-30 so XLA cannot hoist the loop-invariant body."""
        cfg = make_cfg(impl, tile_size)

        def loss_fn(g):
            out = decode(cfg, g, extr, intr, near, far, (h, w), mesh=mesh)
            return jnp.mean((out.color - target) ** 2)

        grad1 = jax.grad(loss_fn)

        def body(c, _):
            g2 = Gaussians(
                gauss.means + c * 1e-30, gauss.covariances,
                gauss.harmonics, gauss.opacities,
            )
            gr = grad1(g2)
            return c + gr.means[0, 0, 0], None

        def run(c0):
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c

        return jax.jit(run)

    def measure_scan(run, k):
        c = run(jnp.float32(0))
        np.asarray(c).ravel()[:1]
        t0 = time.time()
        c = run(jnp.float32(0))
        np.asarray(c).ravel()[:1]
        return (time.time() - t0) / k

    forced = os.environ.get("PF3PLAT_BENCH_IMPL")
    ts = int(os.environ.get("PF3PLAT_BENCH_TILE_SIZE", "16"))
    if forced:
        variants = [forced]
    elif os.environ.get("PF3PLAT_BENCH_PROBE_ALL"):
        variants = ["streamed", "pallas"]
    else:
        variants = ["streamed"]

    probe: dict = {}
    steps: dict = {}
    errors: dict = {}
    for impl in variants:
        try:
            steps[impl] = make_step(impl, ts)
            probe[impl] = measure(steps[impl], 8)
        except Exception as e:  # variant failed to compile/run — skip
            errors[impl] = f"{type(e).__name__}: {e}"
            print(f"# variant {impl} failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
    if not probe and "streamed" in errors and forced is None:
        # Hard fallback: the dense-table path is the battle-tested alternate.
        try:
            steps["pallas"] = make_step("pallas", ts)
            probe["pallas"] = measure(steps["pallas"], 8)
        except Exception as e:
            errors["pallas"] = f"{type(e).__name__}: {e}"
    if not probe:
        raise RuntimeError(f"every bench variant failed: {errors}")
    for impl, t in sorted(probe.items(), key=lambda kv: kv[1]):
        print(f"# probe {impl}/ts{ts}: {t * 1e3:.2f} ms",
              file=sys.stderr, flush=True)
    best = min(probe, key=probe.get)

    # Five independent timing windows -> median per-step time (robust
    # to relay wall-clock noise), std reported for honesty.
    n_iters = 30
    windows = [measure(steps[best], n_iters) for _ in range(5)]
    dt_wall = float(np.median(windows))
    dt_std = float(np.std(windows))

    # Headline: steady-state device throughput via an in-program scan
    # (two windows, median) — the quantity a jitted train step sees.
    # The per-call wall protocol (rounds 1-4) is reported alongside.
    scan_run = make_scan_run(best, ts, n_iters)
    scan_windows = [measure_scan(scan_run, n_iters) for _ in range(2)]
    dt = float(np.median(scan_windows))

    rays = b * v * h * w
    mrays = rays / dt / 1e6
    wall_mrays = rays / dt_wall / 1e6

    # HBM roofline context: analytic fwd+bwd traffic of this scene
    # through the streamed pipeline vs v5e's ~800 GB/s. The frame is
    # op-bound (sort network + VPU transcendentals), not bandwidth
    # bound — see ROADMAP.md "Speed of light" for the op-bound floor.
    from pf3plat_tpu.utils.profiling import raster_traffic_model

    traffic = raster_traffic_model(
        make_cfg(best, ts).raster, (h, w), b * v, n
    )
    roofline_ms = traffic.roofline_ms()

    rec = {
        "metric": f"rasterizer_fwd_bwd_{side}x{side}_2view",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4) if side == 256 else None,
        "variant": f"{best}/ts{ts}",
        "protocol": "scan-pipelined device throughput (in-train-step "
                    "rate); wall_mrays = per-call incl. relay dispatch "
                    "(rounds 1-4 protocol)",
        "scan_windows_ms": [round(x * 1e3, 3) for x in scan_windows],
        "wall_mrays": round(wall_mrays, 3),
        "std_mrays": round(rays / 1e6 * dt_std / (dt_wall * dt_wall), 3),
        "n_iters": n_iters,
        "windows_ms": [round(x * 1e3, 3) for x in windows],
        "hbm_roofline_ms": round(roofline_ms, 3),
        "pct_of_hbm_roofline": round(100 * roofline_ms / (dt * 1e3), 1),
    }
    prev = last_committed_bench()
    if prev is not None and side == 256 and mrays < 0.95 * prev[1]:
        rec["regression_vs"] = {"round": prev[0], "value": prev[1]}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
