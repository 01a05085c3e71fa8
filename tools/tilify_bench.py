"""On-chip microbench: tile-grid <-> image layout conversion variants.

The streamed pipeline converts between (b, H, W, ch) images and
(b*tiles, ch, ts*ts) per-tile pixel blocks twice per step (forward
output assembly + backward cotangent tiling). The naive 6-D transpose
measured 1.58 ms on the v5e for a 1.5 MB array — ~100x off
bandwidth — so this sweeps formulations to find one XLA lowers well.

Run: `timeout 1200 python tools/tilify_bench.py`
Writes /tmp/pf3plat_tilify_bench.json incrementally.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W, CH, TS = 2, 256, 256, 3, 16
TX, TY = W // TS, H // TS
ROWS = B * TX * TY
P = TS * TS
OUT = "/tmp/pf3plat_tilify_bench.json"


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def measure(fn, args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    results = {"device": str(jax.devices()[0])}

    def record(name, ms):
        results[name] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, H, W, CH)), jnp.float32)
    tiles = jnp.asarray(
        rng.standard_normal((ROWS, CH, P)), jnp.float32
    )

    # --- image -> tiles (the backward cotangent path) --------------------

    def img2tiles_v0(g):  # current formulation
        gt = g.reshape(B, TY, TS, TX, TS, CH)
        return gt.transpose(0, 1, 3, 5, 2, 4).reshape(ROWS, CH, P)

    def img2tiles_v1(g):  # channel-first first, then spatial split
        g = g.transpose(0, 3, 1, 2)  # (B, CH, H, W)
        gt = g.reshape(B, CH, TY, TS, TX, TS)
        return gt.transpose(0, 2, 4, 1, 3, 5).reshape(ROWS, CH, P)

    def img2tiles_v2(g):  # two-step: split x first (lane-dim friendly)
        gt = g.reshape(B, H, TX, TS * CH)
        gt = gt.transpose(0, 2, 1, 3)          # (B, TX, H, TS*CH)
        gt = gt.reshape(B, TX, TY, TS, TS, CH)
        return gt.transpose(0, 2, 1, 5, 3, 4).reshape(ROWS, CH, P)

    def img2tiles_v3(g):  # pixels-last kept contiguous per y-row
        # (B,H,W,CH) -> (B,TY,TS,TX,TS,CH) -> rows=(b,ty,tx), (TS,TS,CH)
        gt = g.reshape(B, TY, TS, TX, TS, CH)
        gt = gt.transpose(0, 1, 3, 2, 4, 5)     # (B,TY,TX,TS,TS,CH)
        gt = gt.reshape(ROWS, P, CH)
        return gt.transpose(0, 2, 1)

    for name, fn in [("img2tiles_v0", img2tiles_v0),
                     ("img2tiles_v1", img2tiles_v1),
                     ("img2tiles_v2", img2tiles_v2),
                     ("img2tiles_v3", img2tiles_v3)]:
        record(name, measure(jax.jit(fn), (img,)))

    # --- tiles -> image (the forward output assembly) ---------------------

    def tiles2img_v0(t):  # current formulation
        out = t.reshape(B, TY, TX, CH, TS, TS)
        return out.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, CH)

    def tiles2img_v1(t):  # via channel-first intermediate
        out = t.reshape(B, TY, TX, CH, TS, TS)
        out = out.transpose(0, 3, 1, 4, 2, 5).reshape(B, CH, H, W)
        return out.transpose(0, 2, 3, 1)

    def tiles2img_v2(t):  # pixel-major tiles first
        out = t.reshape(B, TY, TX, CH, TS, TS)
        out = out.transpose(0, 1, 2, 4, 5, 3)   # (B,TY,TX,TS,TS,CH)
        out = out.transpose(0, 1, 3, 2, 4, 5)   # (B,TY,TS,TX,TS,CH)
        return out.reshape(B, H, W, CH)

    for name, fn in [("tiles2img_v0", tiles2img_v0),
                     ("tiles2img_v1", tiles2img_v1),
                     ("tiles2img_v2", tiles2img_v2)]:
        record(name, measure(jax.jit(fn), (tiles,)))

    # Kernel-native alternative: what if tiles came out (ROWS, TS, TS*CH)
    # pixel-row-major (y on sublanes, x*ch on lanes)?
    tiles_yx = jnp.asarray(
        rng.standard_normal((ROWS, TS, TS * CH)), jnp.float32
    )

    def tiles2img_yx(t):
        out = t.reshape(B, TY, TX, TS, TS, CH)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, CH)

    record("tiles2img_yxlayout", measure(jax.jit(tiles2img_yx), (tiles_yx,)))

    def img2tiles_yx(g):
        gt = g.reshape(B, TY, TS, TX, TS * CH)
        return gt.transpose(0, 1, 3, 2, 4).reshape(ROWS, TS, TS * CH)

    record("img2tiles_yxlayout", measure(jax.jit(img2tiles_yx), (img,)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
