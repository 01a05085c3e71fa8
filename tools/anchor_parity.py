"""Quick anchored-vs-bruteforce parity harness (CPU interpret or TPU)."""

import os
import sys

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pf3plat_tpu.ops.rasterizer.api import render
from pf3plat_tpu.ops.rasterizer.types import RasterizeConfig


def main():
    rng = np.random.default_rng(0)
    b, n, h, w = 2, 600, 48, 64
    means = rng.normal(size=(b, n, 3)) * np.array([1.2, 0.9, 0.5]) + np.array(
        [0, 0, 4.0]
    )
    cov = np.zeros((b, n, 3, 3))
    sc = rng.uniform(0.01, 0.1, (b, n, 3))
    for i in range(3):
        cov[..., i, i] = sc[..., i] ** 2
    sh = rng.normal(size=(b, n, 3, 1)) * 0.3
    op = rng.uniform(0.2, 0.95, (b, n))
    extr = np.broadcast_to(np.eye(4), (b, 4, 4)).copy()
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, 3, 3)
    )
    near = np.ones(b)
    far = np.full(b, 100.0)
    bgc = np.zeros((b, 3))
    to = lambda a: jnp.asarray(a, jnp.float32)
    cfg = RasterizeConfig(
        tile_size=16, tile_capacity=512, anchor_capacity=256, chunk=128
    )

    args = (to(extr), to(intr), to(near), to(far), (h, w), to(bgc),
            to(means), to(cov), to(sh), to(op))
    ref = render(*args, impl="bruteforce", config=cfg)
    anc = render(*args, impl="anchored", config=cfg)
    diff = np.abs(np.asarray(ref) - np.asarray(anc))
    print("fwd max diff:", diff.max(), "mean:", diff.mean())

    rng2 = np.random.default_rng(1).normal(size=(b, h, w, 3))

    def loss(impl):
        def f(m, c, o, s):
            img = render(
                to(extr), to(intr), to(near), to(far), (h, w), to(bgc),
                m, c, s, o, impl=impl, config=cfg,
            )
            return jnp.sum(img * jnp.asarray(rng2, jnp.float32))

        return f

    g_ref = jax.grad(loss("bruteforce"), argnums=(0, 1, 2, 3))(
        to(means), to(cov), to(op), to(sh)
    )
    g_anc = jax.grad(loss("anchored"), argnums=(0, 1, 2, 3))(
        to(means), to(cov), to(op), to(sh)
    )
    for name, a, bb in zip(("means", "cov", "op", "sh"), g_ref, g_anc):
        d = np.abs(np.asarray(a) - np.asarray(bb))
        rel = d.max() / (np.abs(np.asarray(a)).max() + 1e-8)
        print(f"grad {name}: max abs diff {d.max():.3e} rel {rel:.3e}")


if __name__ == "__main__":
    main()
