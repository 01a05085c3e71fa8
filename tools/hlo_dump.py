"""Compile the bench-scene rasterizer step and dump per-fusion source
attribution (fusion name -> source file:line metadata) so trace entries
like `copy.298` / `convolution_bitcast_fusion` can be mapped to the exact
jnp op that produced them.

Usage (on the chip; compile-only, no run):
    python tools/hlo_dump.py [fwd|fwdbwd] [impl] [grep...]
Prints every fusion/copy/sort/transpose in the optimized HLO with its
op_name/source metadata, largest shapes first.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
    impl = sys.argv[2] if len(sys.argv) > 2 else "streamed"
    pats = sys.argv[3:] or ["sort", "copy", "transpose", "fusion",
                            "scatter", "bitcast"]

    from pf3plat_tpu.models.decoder import DecoderCfg, decode
    from pf3plat_tpu.models.types import Gaussians
    from pf3plat_tpu.ops.rasterizer import RasterizeConfig

    rng = np.random.default_rng(0)
    b, v, h, w = 1, 2, 256, 256
    n = 2 * h * w
    means = np.stack(
        [rng.uniform(-2, 2, (b, n)), rng.uniform(-2, 2, (b, n)),
         rng.uniform(3, 9, (b, n))], axis=-1)
    cov = np.zeros((b, n, 3, 3))
    for i in range(3):
        cov[..., i, i] = rng.uniform(0.004, 0.012, (b, n)) ** 2
    sh = (rng.standard_normal((b, n, 3, 25)) * 0.2).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, (b, n))
    to = lambda a: jnp.asarray(a, jnp.float32)
    gauss = Gaussians(to(means), to(cov), to(sh), to(opac))
    extr = to(np.broadcast_to(np.eye(4), (b, v, 4, 4)))
    intr = to(np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)))
    near, far = jnp.ones((b, v)), jnp.full((b, v), 100.0)
    target = to(rng.uniform(0, 1, (b, v, h, w, 3)))
    cfg = DecoderCfg(impl=impl, raster=RasterizeConfig())

    def loss_fn(g):
        out = decode(cfg, g, extr, intr, near, far, (h, w))
        return jnp.mean((out.color - target) ** 2)

    f = loss_fn if mode == "fwd" else jax.grad(loss_fn)
    compiled = jax.jit(f).lower(gauss).compile()
    txt = compiled.as_text()

    # Parse instructions: name = opcode(...) ... metadata={op_name="..."
    # source_file="..." source_line=N}
    inst = re.compile(
        r"^\s*(?:ROOT )?%?([\w.\-]+) = (\S+?)\[([\d,]*)\][^\n]*?"
        r"(?:metadata=\{([^}]*)\})?[^\n]*$",
        re.M,
    )
    rows = []
    for m in inst.finditer(txt):
        name, ty, shape, meta = m.groups()
        if not any(p in name for p in pats):
            continue
        size = 1
        for d in filter(None, (shape or "").split(",")):
            size *= int(d)
        op = src = ""
        if meta:
            mm = re.search(r'op_name="([^"]*)"', meta)
            op = mm.group(1) if mm else ""
            mf = re.search(r'source_file="([^"]*)"', meta)
            ml = re.search(r"source_line=(\d+)", meta)
            if mf:
                src = f"{Path(mf.group(1)).name}:{ml.group(1) if ml else '?'}"
        rows.append((size * 4, name, shape, op[-110:], src))
    rows.sort(reverse=True)
    seen = set()
    count = 0
    for sz, name, shape, op, src in rows:
        base = re.sub(r"\.\d+$", "", name)
        if (base, shape) in seen:
            continue
        seen.add((base, shape))
        print(f"{sz/1e6:9.1f}MB  {name:32s} [{shape}]  {src:28s} {op}")
        count += 1
        if count >= 60:
            break


if __name__ == "__main__":
    main()
