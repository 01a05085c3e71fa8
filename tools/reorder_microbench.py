"""On-chip microbenches for PERMUTATION-APPLY alternatives to lax.sort.

The streamed rasterizer's two big `lax.sort`s carry 9 f32 feature
channels as payload (ops/rasterizer/streamed.py). Any replacement must
apply a known permutation to ~686K rows of 16 f32 channels. On TPU the
candidate primitives are:

  * the sort itself (payload rides the sort network)  — the baseline;
  * sort (key, iota) only, then apply the permutation via
      - XLA row gather  (out[i] = rows[perm[i]]),
      - XLA row scatter (out[perm[i]] = rows[i]),
    in both (n, 16) row-major and (16, n) lane-indexed layouts;
  * batched sort (K, n/K) — the shard-local / bucketed shape.

This tool measures each at the production shape so the round-5 sort
strategy is decided by data. Run: `timeout 1800 python
tools/reorder_microbench.py`. Writes /tmp/pf3plat_reorder_bench.json
incrementally (tunnel-outage safe).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 688128  # the bench scene's compacted budget (0.65 * 2*256*256*... )
OUT = "/tmp/pf3plat_reorder_bench.json"


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def measure(fn, args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    results = {"device": str(jax.devices()[0]), "rows": N}

    def record(name, ms):
        results[name] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32) | 1)
    ids = jnp.asarray(rng.permutation(N).astype(np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    feats = [
        jnp.asarray(rng.standard_normal(N), jnp.float32) for _ in range(9)
    ]
    rows16 = jnp.asarray(
        rng.standard_normal((N, 16)), jnp.float32
    )
    plane16 = rows16.T.copy()  # (16, N)

    # --- baselines at the production shape ------------------------------
    fn = jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=2, is_stable=False))
    record("sort_688K_11ops", measure(fn, (keys, ids) + tuple(feats)))
    record("sort_688K_2ops", measure(fn, (keys, ids)))
    fn1 = jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=1, is_stable=False))
    record("unsort_688K_10ops", measure(fn1, (ids,) + tuple(feats)))
    record("sort_688K_3ops", measure(fn, (keys, ids, feats[0])))
    record("sort_688K_6ops", measure(fn, (keys, ids) + tuple(feats[:4])))

    # --- permutation apply: row gather ----------------------------------
    fn = jax.jit(lambda r, p: r[p])
    record("gather_rows_688Kx16", measure(fn, (rows16, perm)))
    fn = jax.jit(lambda r, p: jnp.take(r, p, axis=1))
    record("gather_lanes_16x688K", measure(fn, (plane16, perm)))
    # single flat channel gather x9 (the pre-round-2 dense-table pattern)
    fn = jax.jit(
        lambda p, *fs: tuple(f[p] for f in fs)
    )
    record("gather_9x_flat", measure(fn, (perm,) + tuple(feats)))

    # --- permutation apply: row scatter ---------------------------------
    fn = jax.jit(lambda r, p: jnp.zeros_like(r).at[p].set(r))
    record("scatter_rows_688Kx16", measure(fn, (rows16, perm)))

    # --- batched sorts (bucketed / shard-local shapes) ------------------
    for k in (2, 8, 32):
        kk = (keys[: N - N % k]).reshape(k, -1)
        ii = (ids[: N - N % k]).reshape(k, -1)
        ff = [(f[: N - N % k]).reshape(k, -1) for f in feats]
        fn = jax.jit(
            lambda *xs: jax.lax.sort(
                xs, dimension=1, num_keys=2, is_stable=False
            )
        )
        record(f"sort_batched{k}_11ops", measure(fn, (kk, ii) + tuple(ff)))

    # --- fraction-of-rows scaling (shard-local rows/shard) --------------
    for frac, nn in (("half", N // 2), ("quarter", N // 4)):
        ops = (keys[:nn], ids[:nn]) + tuple(f[:nn] for f in feats)
        fn = jax.jit(
            lambda *xs: jax.lax.sort(xs, num_keys=2, is_stable=False)
        )
        record(f"sort_{frac}_11ops", measure(fn, ops))

    # --- HBM copy reference (bandwidth floor for 16 x N f32) ------------
    fn = jax.jit(lambda r: r + 1.0)
    record("copy_16x688K", measure(fn, (plane16,)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
