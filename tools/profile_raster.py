"""Stage-level rasterizer profiling on the real chip.

Times each pipeline stage (projection, binning sort, segment search, table
gather, pallas compositing) in isolation via pipelined timing with a final
forced host sync (block_until_ready does not synchronize on the axon relay).
Run:  python tools/profile_raster.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    # sync after compile -- slice ON DEVICE first, then fetch 4 bytes
    # (np.asarray(x).ravel() would D2H the full array over the relay)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)
    return (time.time() - t0) / iters


def main():
    from pf3plat_tpu.models.decoder import DecoderCfg, decode
    from pf3plat_tpu.models.types import Gaussians
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig
    from pf3plat_tpu.ops.rasterizer.binning import bin_gaussians_batched
    from pf3plat_tpu.ops.rasterizer.pallas_impl import (
        composite_tiles_pallas_batched,
    )
    from pf3plat_tpu.ops.rasterizer.project import make_camera, project_gaussians

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
    opac = np.where(
        is_far, rng.uniform(0.2, 0.6, (b, n)), rng.uniform(0.7, 0.99, (b, n))
    )

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

    cfg = RasterizeConfig(
        tile_size=16, tile_capacity=1024, chunk=128, fused_sort_key=True
    )
    dcfg = DecoderCfg(impl="pallas", raster=cfg)

    # ---- full step (bench metric) ----
    def loss_fn(g):
        out = decode(dcfg, g, extr, intr, near, far, (h, w))
        return jnp.mean((out.color - target) ** 2)

    step = jax.jit(jax.grad(loss_fn))
    t = timeit(step, gauss)
    rays = b * v * h * w
    print(f"full fwd+bwd      : {t*1e3:8.3f} ms   ({rays/t/1e6:6.2f} Mrays/s)")

    fwd = jax.jit(loss_fn)
    t = timeit(fwd, gauss)
    print(f"full fwd          : {t*1e3:8.3f} ms   ({rays/t/1e6:6.2f} Mrays/s)")

    # ---- stages (flat-batch pallas path, bv=2 cameras) ----
    bv = b * v
    flat = lambda x: jnp.reshape(x, (bv,) + x.shape[2:])
    rep = lambda x: jnp.repeat(x, v, axis=0)
    extr_f, intr_f = flat(extr), flat(intr)
    means_r, cov_r, sh_r, op_r = (
        rep(gauss.means), rep(gauss.covariances), rep(gauss.harmonics),
        rep(gauss.opacities),
    )
    bg = jnp.zeros((bv, 3), jnp.float32)

    @jax.jit
    def proj(m, c, o, s):
        camera = make_camera(extr_f, intr_f, (h, w))
        screen = jax.vmap(
            lambda cam, mm, cc, oo, ss: project_gaussians(
                cam, mm, cc, oo, ss, 4, cfg, use_sh=True
            )
        )(camera, m, c, o, s)
        return screen

    t = timeit(proj, means_r, cov_r, op_r, sh_r)
    print(f"projection fwd    : {t*1e3:8.3f} ms")

    screen = jax.jit(proj)(means_r, cov_r, op_r, sh_r)
    screen = jax.tree_util.tree_map(jnp.asarray, screen)

    @jax.jit
    def binonly(s):
        return bin_gaussians_batched(s, (h, w), cfg)

    t = timeit(binonly, screen)
    print(f"binning (fused)   : {t*1e3:8.3f} ms")

    cfg2 = RasterizeConfig(
        tile_size=16, tile_capacity=1024, chunk=128, fused_sort_key=False
    )

    @jax.jit
    def binonly2(s):
        return bin_gaussians_batched(s, (h, w), cfg2)

    t = timeit(binonly2, screen)
    print(f"binning (2-key)   : {t*1e3:8.3f} ms")

    # isolate the sort itself: same shapes as binning's flat sort
    p = n * cfg.max_dup * bv
    keys = jnp.asarray(
        rng.integers(0, 2**31 - 1, p, dtype=np.int32)
    )
    vals = jnp.arange(p, dtype=jnp.int32)

    @jax.jit
    def sort1(k, vv):
        return jax.lax.sort((k, vv), num_keys=1)

    t = timeit(sort1, keys, vals)
    print(f"lax.sort 1key {p//1000}k: {t*1e3:8.3f} ms")

    binned = jax.jit(binonly)(screen)
    ntx, nty = int(binned.num_tiles_x), int(binned.num_tiles_y)

    @jax.jit
    def comp(s, idx, cnt):
        from pf3plat_tpu.ops.rasterizer.binning import BinnedTiles

        bt = BinnedTiles(idx, cnt, ntx, nty)
        return composite_tiles_pallas_batched(s, bt, (h, w), bg, cfg)

    t = timeit(comp, screen, binned.indices, binned.counts)
    print(f"table+pallas fwd  : {t*1e3:8.3f} ms")

    @jax.jit
    def comp_grad(s, idx, cnt):
        from pf3plat_tpu.ops.rasterizer.binning import BinnedTiles

        bt = BinnedTiles(idx, cnt, ntx, nty)

        def f(xy, conic, op, color):
            ss = s._replace(xy=xy, conic=conic, opacity=op, color=color)
            img = composite_tiles_pallas_batched(ss, bt, (h, w), bg, cfg)
            return jnp.mean((img - target[0]) ** 2)

        return jax.grad(f, argnums=(0, 1, 2, 3))(
            s.xy, s.conic, s.opacity, s.color
        )

    t = timeit(comp_grad, screen, binned.indices, binned.counts)
    print(f"table+pallas f+b  : {t*1e3:8.3f} ms")

    # table build (gather) alone
    @jax.jit
    def table_only(s, idx):
        feat = jnp.concatenate(
            [s.xy, s.conic, s.opacity[..., None], s.color], axis=-1
        )
        nn = feat.shape[1]
        f_dim = feat.shape[-1]
        feat_flat = feat.reshape(bv * nn, f_dim)
        b_off = (jnp.arange(bv, dtype=jnp.int32) * nn)[:, None, None]
        flat_idx = (jnp.maximum(idx, 0) + b_off).reshape(-1)
        cap = idx.shape[-1]
        ntiles = idx.shape[1]
        gathered = feat_flat[flat_idx].reshape(bv * ntiles, cap, f_dim)
        return gathered

    t = timeit(table_only, screen, binned.indices)
    print(f"table gather fwd  : {t*1e3:8.3f} ms")

    # counts statistics
    cnt = np.asarray(binned.counts)
    print(
        f"counts: sum={cnt.sum()} max={cnt.max()} "
        f"mean={cnt.mean():.1f} (tiles={cnt.size}, cap=1024)"
    )


if __name__ == "__main__":
    main()
