"""Load converted pretrained frozen weights into a PF3plat parameter tree.

The reference initializes its frozen perception models from hub checkpoints
at construction time (`src/model/LightGlue/lightglue/superpoint.py:144-145`,
`lightglue.py:409-415`, `src/model/encoder/encoder_costvolume.py:81`
`UniDepthV2.from_pretrained`). This repo splits that into an offline
conversion step (`pf3plat_tpu.models.backbones.weight_convert` CLI, torch ->
`.pkl` Flax trees) and this loader, which overlays the converted trees onto
the randomly-initialized frozen params — validating every leaf path and
shape so a converter/model mismatch fails loudly instead of training
against silently-random features.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

import jax.numpy as jnp

# .pkl artifact name (weight_convert.main) -> frozen-params key (PF3plat.init)
_ARTIFACTS = {
    "superpoint": "superpoint",
    "lightglue": "lightglue",
    "unidepth": "unidepth",   # full pixel_encoder (DINOv2) + pixel_decoder
    "lpips_vgg": "lpips",
}


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def load_pretrained_frozen(
    weights_dir: Path, frozen: dict, require_all: bool = False
) -> dict:
    """Overlay converted `.pkl` trees from `weights_dir` onto `frozen`.

    Each present artifact must match the initialized tree leaf-for-leaf
    (paths and shapes). Missing artifacts keep their random init unless
    `require_all`. Returns a new frozen dict (jnp leaves).
    """
    weights_dir = Path(weights_dir)
    loaded = dict(frozen)
    found = []
    for artifact, key in _ARTIFACTS.items():
        path = weights_dir / f"{artifact}.pkl"
        if not path.exists():
            if require_all:
                raise FileNotFoundError(
                    f"pretrained weights: missing {path} (required)"
                )
            continue
        if key not in frozen:
            continue  # model built without this frozen module
        with path.open("rb") as f:
            tree = pickle.load(f)
        init_flat = _flatten(frozen[key])
        new_flat = _flatten(tree)
        missing = set(init_flat) - set(new_flat)
        extra = set(new_flat) - set(init_flat)
        if missing or extra:
            raise ValueError(
                f"pretrained {artifact}: tree mismatch vs initialized model "
                f"(missing={sorted(missing)[:4]}, extra={sorted(extra)[:4]})"
            )
        for p, leaf in new_flat.items():
            want = np.shape(init_flat[p])
            got = np.shape(leaf)
            if want != got:
                raise ValueError(
                    f"pretrained {artifact}: shape mismatch at "
                    f"{'/'.join(p)}: checkpoint {got} vs model {want}"
                )
        def _unflatten(flat):
            out: dict = {}
            for p, leaf in flat.items():
                d = out
                for part in p[:-1]:
                    d = d.setdefault(part, {})
                d[p[-1]] = jnp.asarray(leaf)
            return out

        loaded[key] = _unflatten(new_flat)
        found.append(artifact)
    if not found:
        raise FileNotFoundError(
            f"pretrained weights: no known artifacts "
            f"({', '.join(sorted(_ARTIFACTS))}) under {weights_dir}"
        )
    print(f"loaded pretrained frozen weights: {', '.join(found)}")
    return loaded
