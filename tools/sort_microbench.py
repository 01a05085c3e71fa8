"""On-chip microbenches for the streamed-rasterizer's sort + glue budget.

Times the exact XLA patterns the streamed pipeline (ops/rasterizer/
streamed.py) is built from, so optimization decisions are measured, not
guessed:

  * `lax.sort` cost vs operand count (2 / 6 / 11 operands), 1M rows;
  * `is_stable=False` vs the default stable sort (the pipeline's key
    tuples are unique — (fused_key, id) and the unsort's ids — so an
    unstable sort is exact);
  * row-count scaling (256K vs 1M rows, 11 operands);
  * the glue ops around the kernels: the (16, padded) feature stack,
    the backward (n_win, 16, 128) -> (16, padded) transpose, and the
    per-(tile, chunk) block scatter-add.

Run on the real chip: `timeout 1800 python tools/sort_microbench.py`.
Writes /tmp/pf3plat_sort_bench.json incrementally (tunnel-outage safe).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

ROWS = 1 << 20
OUT = "/tmp/pf3plat_sort_bench.json"


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
    results = {"device": str(jax.devices()[0])}

    def record(name, ms):
        results[name] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, 1 << 30, ROWS, dtype=np.int32) | 1
    )
    ids = jnp.asarray(rng.permutation(ROWS).astype(np.int32))
    feats = [jnp.asarray(rng.standard_normal(ROWS), jnp.float32)
             for _ in range(9)]

    # --- lax.sort operand/stability scaling, 1M rows -------------------
    for n_ops, stable in [(2, True), (2, False), (6, False),
                          (11, True), (11, False)]:
        ops = (keys, ids) + tuple(feats[: n_ops - 2])

        fn = jax.jit(
            lambda *xs, _s=stable: jax.lax.sort(xs, num_keys=2, is_stable=_s)
        )
        record(f"sort_1M_{n_ops}ops_stable{int(stable)}", measure(fn, ops))

    # --- row scaling: 256K rows, 11 operands ----------------------------
    q = ROWS // 4
    ops_q = tuple(x[:q] for x in (keys, ids) + tuple(feats))
    fn = jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=2, is_stable=False))
    record("sort_256K_11ops_stable0", measure(fn, ops_q))

    # --- single-key unsort pattern (ids unique), 10 operands -------------
    ops_u = (ids,) + tuple(feats)
    for stable in (True, False):
        fn = jax.jit(
            lambda *xs, _s=stable: jax.lax.sort(xs, num_keys=1, is_stable=_s)
        )
        record(f"unsort_1M_10ops_stable{int(stable)}", measure(fn, ops_u))

    # --- glue: feature stack (11 -> (16, padded)) ------------------------
    def stack16(*cols):
        cols = list(cols) + [jnp.zeros_like(cols[0])] * (16 - len(cols))
        return jnp.stack(cols, axis=0)

    fn = jax.jit(stack16)
    record("stack_16xPadded", measure(fn, tuple(feats) + (keys.astype(jnp.float32), ids.astype(jnp.float32))))

    # --- glue: bwd transpose (n_win, 16, 128) -> (16, padded) ------------
    n_win = ROWS // 128
    blocks = jnp.asarray(
        rng.standard_normal((n_win, 16, 128)), jnp.float32
    )
    fn = jax.jit(lambda b: b.transpose(1, 0, 2).reshape(16, ROWS))
    record("transpose_16xPadded", measure(fn, (blocks,)))

    # --- glue: block scatter-add (rows*n_chunks windows of (16,128)) -----
    rows_t, n_chunks = 512, 9
    win = jnp.asarray(
        rng.integers(0, n_win - n_chunks, (rows_t, 1), dtype=np.int32)
        + np.arange(n_chunks, dtype=np.int32)[None, :]
    ).reshape(-1)
    dblk = jnp.asarray(
        rng.standard_normal((rows_t * n_chunks, 16, 128)), jnp.float32
    )

    def scat(win, dblk):
        acc = jnp.zeros((n_win, 16, 128), jnp.float32)
        return acc.at[win].add(dblk)

    fn = jax.jit(scat)
    record("block_scatter_add", measure(fn, (win, dblk)))

    # --- glue: cotangent pad + tile reshape ------------------------------
    g_img = jnp.asarray(rng.standard_normal((2, 256, 256, 3)), jnp.float32)

    def tilify(g):
        ts, tx, ty = 16, 16, 16
        gt = g.reshape(2, ty, ts, tx, ts, 3)
        return gt.transpose(0, 1, 3, 5, 2, 4).reshape(512, 3, 256)

    fn = jax.jit(tilify)
    record("cotangent_tilify", measure(fn, (g_img,)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
