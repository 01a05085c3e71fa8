"""Micro-benchmarks for rasterizer redesign decisions (run on the real chip).

Measures, in isolation:
  * lax.sort throughput at the binning problem size (1-key and 2-key)
  * row-gather throughput vs row width and dtype (dense-table build)
  * scatter-add throughput vs row width (gather VJP)
so kernel-design choices (pallas bitonic sort, padded-row gathers,
stream-layout compositing) are driven by measured numbers, not folklore.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    P = 1 << 20          # binning pairs
    N = 2 * 131072       # gaussians (bv * n)
    R = 512 * 1024       # table rows (tiles * cap)

    keys = jnp.asarray(rng.integers(0, 2**31 - 1, P, dtype=np.int32))
    keys2 = jnp.asarray(rng.integers(0, 2**31 - 1, P, dtype=np.int32))
    vals = jnp.arange(P, dtype=jnp.int32)

    t = timeit(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys, vals)
    print(f"lax.sort 1key kv   {P>>10}k : {t*1e3:7.3f} ms")
    t = timeit(
        jax.jit(lambda k, k2, v: jax.lax.sort((k, k2, v), num_keys=2)),
        keys, keys2, vals,
    )
    print(f"lax.sort 2key kkv  {P>>10}k : {t*1e3:7.3f} ms")
    half = P // 2
    t = timeit(
        jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
        keys[:half], vals[:half],
    )
    print(f"lax.sort 1key kv   {half>>10}k : {t*1e3:7.3f} ms")

    idx = jnp.asarray(rng.integers(0, N, R, dtype=np.int32))
    for width, dt in [(8, jnp.float32), (16, jnp.float32), (32, jnp.float32),
                      (64, jnp.float32), (128, jnp.float32),
                      (16, jnp.bfloat16), (64, jnp.bfloat16)]:
        feat = jnp.asarray(
            rng.standard_normal((N, width)), dt
        )
        t = timeit(jax.jit(lambda f, i: f[i]), feat, idx)
        bytes_moved = R * width * feat.dtype.itemsize
        print(
            f"gather ({N>>10}k,{width}) {feat.dtype.name:8s}: {t*1e3:7.3f} ms "
            f"({R/t/1e6:7.1f} Mrows/s, {bytes_moved/t/2**30:6.1f} GiB/s out)"
        )

    for width, dt in [(8, jnp.float32), (16, jnp.float32), (64, jnp.float32),
                      (128, jnp.float32)]:
        upd = jnp.asarray(rng.standard_normal((R, width)), dt)
        zero = jnp.zeros((N, width), dt)

        def scat(z, u, i):
            return z.at[i].add(u)

        t = timeit(jax.jit(scat), zero, upd, idx)
        print(
            f"scatter-add ({R>>10}k,{width}) {dt.__name__:8s}: {t*1e3:7.3f} ms "
            f"({R/t/1e6:7.1f} Mrows/s)"
        )

    # segment-sum alternative for the VJP: data already in sorted order,
    # reduce max_dup=4 consecutive-by-construction rows per gaussian
    dtab = jnp.asarray(rng.standard_normal((N * 4, 16)), jnp.float32)

    def seg4(d):
        return d.reshape(N, 4, 16).sum(axis=1)

    t = timeit(jax.jit(seg4), dtab)
    print(f"fold4-sum ({N*4>>10}k,16)          : {t*1e3:7.3f} ms")

    # inverse-permutation gather: N*4 rows from (P,16)
    pos = jnp.asarray(rng.integers(0, P, N * 4, dtype=np.int32))
    src = jnp.asarray(rng.standard_normal((P, 16)), jnp.float32)
    t = timeit(jax.jit(lambda s, p: s[p]), src, pos)
    print(f"gather ({N*4>>10}k rows of (P,16)) : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
