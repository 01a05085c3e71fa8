"""TPU bench: anchored vs pallas rasterizer impls on the bench scene."""
import time, sys, os
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from pf3plat_tpu.models.decoder import DecoderCfg, decode
from pf3plat_tpu.models.types import Gaussians
from pf3plat_tpu.ops.rasterizer import RasterizeConfig

rng = np.random.default_rng(0)
b, v, h, w = 1, 2, 256, 256
n = 2 * h * w
xs = rng.uniform(-2, 2, (b, n)); ys = rng.uniform(-2, 2, (b, n))
surf_z = 4.0 + 0.3 * np.sin(3 * xs) * np.cos(2 * ys)
far_z = rng.uniform(8.0, 12.0, (b, n))
is_far = rng.random((b, n)) < 0.3
means = np.stack([xs, ys, np.where(is_far, far_z, surf_z)], axis=-1)
scales = rng.uniform(0.004, 0.012, (b, n, 3))
cov = np.zeros((b, n, 3, 3))
for i in range(3):
    cov[..., i, i] = scales[..., i] ** 2
sh = (rng.standard_normal((b, n, 3, 25)) * 0.2).astype(np.float32)
opac = np.where(is_far, rng.uniform(0.2, 0.6, (b, n)), rng.uniform(0.7, 0.99, (b, n)))
to = lambda a: jnp.asarray(a, jnp.float32)
gauss = Gaussians(to(means), to(cov), to(sh), to(opac))
extr = to(np.broadcast_to(np.eye(4), (b, v, 4, 4)))
intr = to(np.broadcast_to(np.array([[1.0,0,0.5],[0,1.0,0.5],[0,0,1.0]]), (b, v, 3, 3)))
near = jnp.ones((b, v)); far = jnp.full((b, v), 100.0)
target = to(rng.uniform(0, 1, (b, v, h, w, 3)))

def bench(impl, cfg, fwd_only=False):
    dc = DecoderCfg(impl=impl, raster=cfg)
    def loss_fn(g):
        out = decode(dc, g, extr, intr, near, far, (h, w))
        return jnp.mean((out.color - target) ** 2)
    step = jax.jit(loss_fn) if fwd_only else jax.jit(jax.grad(loss_fn))
    g = step(gauss)
    np.asarray(jax.tree_util.tree_leaves(g)[0].ravel()[:1])
    iters = 30
    t0 = time.time()
    for _ in range(iters):
        g = step(gauss)
    np.asarray(jax.tree_util.tree_leaves(g)[0].ravel()[:1])
    dt = (time.time() - t0) / iters
    tag = "fwd" if fwd_only else "fwd+bwd"
    print(f"{impl} {tag}: {dt*1e3:.2f} ms  {b*v*h*w/dt/1e6:.2f} Mrays/s", flush=True)
    return g

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cfg_old = RasterizeConfig(tile_size=16, tile_capacity=1024, chunk=128, fused_sort_key=True)
    cfg_new = RasterizeConfig(tile_size=16, tile_capacity=1024, anchor_capacity=1024, chunk=128)
    if which in ("both", "pallas"):
        g_old = bench("pallas", cfg_old)
    if which in ("both", "anchored"):
        bench("anchored", cfg_new, fwd_only=True)
        g_new = bench("anchored", cfg_new)
    if which == "both":
        d = jax.tree_util.tree_map(lambda a, bb: float(jnp.max(jnp.abs(a - bb))), g_old, g_new)
        print("grad max-abs diff vs pallas impl:", d)
