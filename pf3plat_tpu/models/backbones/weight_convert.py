"""Torch checkpoint -> Flax parameter conversion for the frozen backbones.

Offline tool (runs on CPU torch): maps the reference's pretrained
state_dicts into this repo's Flax parameter trees. Usage:

    python -m pf3plat_tpu.models.backbones.weight_convert \
        --superpoint superpoint_v1.pth --lightglue superpoint_lightglue.pth \
        --dinov2 dinov2_vitl14.pth --vgg lpips_vgg.pth --out weights/

Conversion rules:
  * torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
  * torch Linear weight (O, I)         -> flax Dense kernel (I, O)
  * LayerNorm weight/bias              -> scale/bias

The checkpoints themselves ship with the reference's external deps
(torch hub; `superpoint.py:144-145`, `lightglue.py:409-415`,
`UniDepthV2.from_pretrained`, lpips) — this environment has no network
access, so the tool is exercised by round-trip tests on randomly
initialized torch modules with the same layouts.
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_w(w: np.ndarray) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return np.transpose(w, (1, 0))


def convert_superpoint(sd: dict) -> dict:
    """SuperPoint state_dict -> flax params for `superpoint.SuperPoint`."""
    params = {}
    for name in [
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ]:
        params[name] = {
            "kernel": conv_w(np.asarray(sd[f"{name}.weight"])),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }
    return {"params": params}


def _self_block(sd: dict, prefix: str) -> dict:
    return {
        "Dense_0": {  # Wqkv
            "kernel": linear_w(np.asarray(sd[f"{prefix}.Wqkv.weight"])),
            "bias": np.asarray(sd[f"{prefix}.Wqkv.bias"]),
        },
        "Dense_1": {  # out_proj
            "kernel": linear_w(np.asarray(sd[f"{prefix}.out_proj.weight"])),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
        },
        "Dense_2": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.ffn.0.weight"])),
            "bias": np.asarray(sd[f"{prefix}.ffn.0.bias"]),
        },
        "LayerNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.ffn.1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.ffn.1.bias"]),
        },
        "Dense_3": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.ffn.3.weight"])),
            "bias": np.asarray(sd[f"{prefix}.ffn.3.bias"]),
        },
    }


def _cross_block(sd: dict, prefix: str) -> dict:
    return {
        "to_qk": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.to_qk.weight"])),
            "bias": np.asarray(sd[f"{prefix}.to_qk.bias"]),
        },
        "to_v": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.to_v.weight"])),
            "bias": np.asarray(sd[f"{prefix}.to_v.bias"]),
        },
        "to_out": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.to_out.weight"])),
            "bias": np.asarray(sd[f"{prefix}.to_out.bias"]),
        },
        "Dense_0": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.ffn.0.weight"])),
            "bias": np.asarray(sd[f"{prefix}.ffn.0.bias"]),
        },
        "LayerNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.ffn.1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.ffn.1.bias"]),
        },
        "Dense_1": {
            "kernel": linear_w(np.asarray(sd[f"{prefix}.ffn.3.weight"])),
            "bias": np.asarray(sd[f"{prefix}.ffn.3.bias"]),
        },
    }


def convert_lightglue(sd: dict, n_layers: int = 9) -> dict:
    params = {
        "input_proj": {
            "kernel": linear_w(np.asarray(sd["input_proj.weight"])),
            "bias": np.asarray(sd["input_proj.bias"]),
        },
        "posenc": {
            "Dense_0": {
                "kernel": linear_w(np.asarray(sd["posenc.Wr.weight"])),
            }
        },
        "final_proj": {
            "kernel": linear_w(
                np.asarray(sd[f"log_assignment.{n_layers - 1}.final_proj.weight"])
            ),
            "bias": np.asarray(
                sd[f"log_assignment.{n_layers - 1}.final_proj.bias"]
            ),
        },
        "matchability": {
            "kernel": linear_w(
                np.asarray(sd[f"log_assignment.{n_layers - 1}.matchability.weight"])
            ),
            "bias": np.asarray(
                sd[f"log_assignment.{n_layers - 1}.matchability.bias"]
            ),
        },
    }
    for i in range(n_layers):
        params[f"self_{i}"] = _self_block(
            sd, f"transformers.{i}.self_attn"
        )
        params[f"cross_{i}"] = _cross_block(
            sd, f"transformers.{i}.cross_attn"
        )
    return {"params": params}


def convert_dinov2(sd: dict, depth: int = 24) -> dict:
    params = {
        "patch_embed": {
            "kernel": conv_w(np.asarray(sd["patch_embed.proj.weight"])),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        },
        "cls_token": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {"scale": np.asarray(sd[f"{p}.norm1.weight"]),
                      "bias": np.asarray(sd[f"{p}.norm1.bias"])},
            "attn_qkv": {"kernel": linear_w(np.asarray(sd[f"{p}.attn.qkv.weight"])),
                         "bias": np.asarray(sd[f"{p}.attn.qkv.bias"])},
            "attn_proj": {"kernel": linear_w(np.asarray(sd[f"{p}.attn.proj.weight"])),
                          "bias": np.asarray(sd[f"{p}.attn.proj.bias"])},
            "ls1_gamma": np.asarray(sd[f"{p}.ls1.gamma"]),
            "norm2": {"scale": np.asarray(sd[f"{p}.norm2.weight"]),
                      "bias": np.asarray(sd[f"{p}.norm2.bias"])},
            "mlp_fc1": {"kernel": linear_w(np.asarray(sd[f"{p}.mlp.fc1.weight"])),
                        "bias": np.asarray(sd[f"{p}.mlp.fc1.bias"])},
            "mlp_fc2": {"kernel": linear_w(np.asarray(sd[f"{p}.mlp.fc2.weight"])),
                        "bias": np.asarray(sd[f"{p}.mlp.fc2.bias"])},
            "ls2_gamma": np.asarray(sd[f"{p}.ls2.gamma"]),
        }
    return {"params": params}


_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
    "conv5_3",
]


def convert_lpips_vgg(sd: dict) -> dict:
    """lpips package checkpoint (net.slice*/lin*) -> flax LPIPS params."""
    vgg = {}
    for idx, name in zip(_VGG_TORCH_IDX, _VGG_NAMES):
        # The lpips package stores the torchvision VGG features as
        # net.sliceK.<idx>; accept either flat `features.<idx>` or sliced keys.
        for key in (f"features.{idx}", f"net.features.{idx}"):
            if f"{key}.weight" in sd:
                vgg[name] = {
                    "kernel": conv_w(np.asarray(sd[f"{key}.weight"])),
                    "bias": np.asarray(sd[f"{key}.bias"]),
                }
                break
    lins = {
        f"lin{i}": {
            "kernel": conv_w(np.asarray(sd[f"lin{i}.model.1.weight"]))
        }
        for i in range(5)
        if f"lin{i}.model.1.weight" in sd
    }
    return {"params": {"vgg": vgg, **lins}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--superpoint", type=Path)
    ap.add_argument("--lightglue", type=Path)
    ap.add_argument("--dinov2", type=Path)
    ap.add_argument("--vgg", type=Path)
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    import torch

    args.out.mkdir(parents=True, exist_ok=True)
    jobs = [
        ("superpoint", args.superpoint, convert_superpoint),
        ("lightglue", args.lightglue, convert_lightglue),
        ("dinov2", args.dinov2, convert_dinov2),
        ("lpips_vgg", args.vgg, convert_lpips_vgg),
    ]
    for name, path, fn in jobs:
        if path is None:
            continue
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = fn({k: v.numpy() for k, v in sd.items()})
        with (args.out / f"{name}.pkl").open("wb") as f:
            pickle.dump(params, f)
        print(f"converted {name} -> {args.out / f'{name}.pkl'}")


if __name__ == "__main__":
    main()
