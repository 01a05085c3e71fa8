"""Synced-iteration TPU check of the anchored grad at a given capacity."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from pf3plat_tpu.models.decoder import DecoderCfg, decode
from pf3plat_tpu.models.types import Gaussians
from pf3plat_tpu.ops.rasterizer import RasterizeConfig

cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
dc = DecoderCfg(impl="anchored", raster=RasterizeConfig(
    tile_size=16, tile_capacity=1024, anchor_capacity=cap, chunk=128))

def loss_fn(g):
    out = decode(dc, g, extr, intr, near, far, (h, w))
    return jnp.mean((out.color - target) ** 2)

step = jax.jit(jax.grad(loss_fn))
for i in range(iters):
    g = step(gauss)
    val = np.asarray(jax.tree_util.tree_leaves(g)[0].ravel()[:1])
    print(i, val, flush=True)
print("ok", flush=True)
