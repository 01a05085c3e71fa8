"""Relay-safe micro-benchmarks: chain REPS applications of each op inside
one jit so the ~30 ms axon dispatch round-trip amortizes away (the original
microbench.py dispatched one op per iteration and measured pure RTT).

Decides the round-2 rasterizer redesign questions:
  * lax.sort cost vs number of carried payload operands (can features ride
    the binning sort so all downstream access is contiguous?)
  * row-gather / scatter-add cost at the exact pipeline shapes
    (524288 rows x 9 f32) and at bf16/narrow variants.
"""

import time
import sys

import numpy as np

import jax
import jax.numpy as jnp

REPS = 10


def timeit(make_fn, *args, iters=5):
    fn = jax.jit(make_fn)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters / REPS


def main():
    rng = np.random.default_rng(0)
    P = 524288            # binning pairs (bench scene)
    N = 262144            # gaussians (b*v*n)
    R = 524288            # table rows (b*v*tiles*cap)

    keys = jnp.asarray(rng.integers(0, 2**31 - 1, P, dtype=np.int32))
    ids = jnp.arange(P, dtype=jnp.int32)

    def sort_payload(n_payload):
        pay = [
            jnp.asarray(rng.standard_normal(P), jnp.float32)
            for _ in range(n_payload)
        ]

        def fn(k, v, *pays):
            for i in range(REPS):
                ops = jax.lax.sort((k, v) + tuple(pays), num_keys=1)
                k = ops[0] ^ (i + 1)  # force dependency, reshuffle
                v = ops[1]
                pays = ops[2:]
            return ops

        return timeit(fn, keys, ids, *pay)

    for npay in (0, 2, 4, 9):
        t = sort_payload(npay)
        print(f"sort {P>>10}k key+id+{npay}xf32 : {t*1e3:7.3f} ms", flush=True)

    idx = jnp.asarray(rng.integers(0, N, R, dtype=np.int32))

    def gather(width, dt):
        feat = jnp.asarray(rng.standard_normal((N, width)), dt)

        def fn(f, i):
            acc = jnp.zeros((R, width), dt)
            for r in range(REPS):
                acc = acc + f[(i + r) % N]
            return acc

        t = timeit(fn, feat, idx)
        print(
            f"gather ({R>>10}k rows,{width}) {jnp.dtype(dt).name:8s}: "
            f"{t*1e3:7.3f} ms ({R/t/1e6:6.1f} Mrows/s)", flush=True,
        )

    gather(9, jnp.float32)
    gather(16, jnp.float32)
    gather(1, jnp.int32)
    gather(9, jnp.bfloat16)
    gather(16, jnp.bfloat16)

    def scatter(width, dt):
        upd = jnp.asarray(rng.standard_normal((R, width)), dt)

        def fn(u, i):
            z = jnp.zeros((N, width), dt)
            for r in range(REPS):
                z = z.at[(i + r) % N].add(u)
            return z

        t = timeit(fn, upd, idx)
        print(
            f"scatter-add ({R>>10}k,{width}) {jnp.dtype(dt).name:8s}: "
            f"{t*1e3:7.3f} ms ({R/t/1e6:6.1f} Mrows/s)", flush=True,
        )

    scatter(9, jnp.float32)
    scatter(16, jnp.float32)
    scatter(9, jnp.bfloat16)

    # contiguous-window gather: rows gathered at 128-aligned chunk indices
    # (the "chunk table" trick: 4608 chunk rows instead of 524288 slots)
    chunks = jnp.asarray(
        rng.integers(0, P // 128, 4608, dtype=np.int32)
    )

    def chunk_gather():
        feat = jnp.asarray(rng.standard_normal((P // 128, 128)), jnp.float32)

        def fn(f, c):
            acc = jnp.zeros((4608, 128), jnp.float32)
            for r in range(REPS):
                acc = acc + f[(c + r) % (P // 128)]
            return acc

        t = timeit(fn, feat, chunks)
        print(f"chunk-gather (4608 rows of 128 lanes): {t*1e3:7.3f} ms",
              flush=True)

    chunk_gather()

    # cumulative max over the sorted array (segment-start propagation)
    def cummax():
        x = jnp.asarray(rng.integers(0, 2**30, P, dtype=np.int32))

        def fn(x):
            for r in range(REPS):
                x = jax.lax.cummax(x ^ r, axis=0)
            return x

        t = timeit(fn, x)
        print(f"cummax {P>>10}k int32: {t*1e3:7.3f} ms", flush=True)

    cummax()


if __name__ == "__main__":
    main()
