"""Flash-attention parity + perf vs the einsum path, at the pose-stack
shapes (b*h=8, n=4097, d_head=32 — the encoder's dominant traffic).

Run on the real chip:  python tools/flash_check.py [n] [iters]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4097
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pf3plat_tpu.models import layers

    b, h, d = 2, 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    def loss_flash(q, k, v):
        os.environ["PF3PLAT_FLASH_ATTENTION"] = "1"
        return jnp.sum(layers.scaled_dot_attention(q, k, v) ** 2)

    def loss_einsum(q, k, v):
        os.environ["PF3PLAT_FLASH_ATTENTION"] = "0"
        return jnp.sum(layers.scaled_dot_attention(q, k, v) ** 2)

    def bench(fn, tag):
        step = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2)))
        out = step(q, k, v)
        np.asarray(out[0]).ravel()[:1]
        t0 = time.time()
        for _ in range(iters):
            out = step(q, k, v)
        np.asarray(out[0]).ravel()[:1]
        dt = (time.time() - t0) / iters
        print(f"{tag:8s}: {dt * 1e3:8.3f} ms fwd+bwd  (n={n})", flush=True)
        return out

    le = bench(loss_einsum, "einsum")
    lf = bench(loss_flash, "flash")
    print("loss rel diff:",
          abs(float(le[0]) - float(lf[0])) / abs(float(le[0])))
    for i in range(3):
        a, bb = np.asarray(le[1][i]), np.asarray(lf[1][i])
        denom = np.abs(a).max() + 1e-9
        print(f"grad[{i}] max rel-to-max diff: {np.abs(a - bb).max() / denom:.3e}")


if __name__ == "__main__":
    main()
