"""End-to-end pretrained-weights rehearsal.

Writes synthetic torch checkpoints in the RELEASE layouts for all five
frozen models (SuperPoint, LightGlue, DINOv2, full UniDepthV2
pixel_encoder.*/pixel_decoder.*, LPIPS-VGG), runs the actual
`weight_convert.main()` CLI, loads the resulting `.pkl`s through
`load_pretrained_frozen` / the `weights=` config flag, and runs the model —
so the day the real hub checkpoints are available, ingest is a solved
problem. (Reference loads these at init: `superpoint.py:144-145`,
`lightglue.py:409-415`, `encoder_costvolume.py:81`.)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"

# Tiny-but-release-shaped model configuration (shared with test_configs_eval).
from test_configs_eval import TINY_OVERRIDES


def _t(rng, shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)


def _inv_conv(rng, kernel):
    """Random torch conv weight whose conv_w() matches `kernel`'s shape."""
    kh, kw, i, o = np.shape(kernel)
    return _t(rng, (o, i, kh, kw))


def _inv_linear(rng, kernel):
    i, o = np.shape(kernel)
    return _t(rng, (o, i))


def make_superpoint_sd(rng, flax_params):
    """Release layout: flat `conv1a.weight`... (`superpoint.py` state dict)."""
    sd = {}
    for name, leaf in flax_params["params"].items():
        sd[f"{name}.weight"] = _inv_conv(rng, leaf["kernel"])
        sd[f"{name}.bias"] = _t(rng, np.shape(leaf["bias"]))
    return sd


def make_lightglue_sd(rng, flax_params):
    """Release layout: `input_proj/posenc.Wr/transformers.i.{self,cross}_attn
    .../log_assignment.i.*` (`lightglue.py` state dict)."""
    p = flax_params["params"]
    n_layers = sum(1 for k in p if k.startswith("self_"))
    sd = {
        "input_proj.weight": _inv_linear(rng, p["input_proj"]["kernel"]),
        "input_proj.bias": _t(rng, np.shape(p["input_proj"]["bias"])),
        "posenc.Wr.weight": _inv_linear(rng, p["posenc"]["Dense_0"]["kernel"]),
    }
    for i in range(n_layers):
        s = p[f"self_{i}"]
        pre = f"transformers.{i}.self_attn"
        sd[f"{pre}.Wqkv.weight"] = _inv_linear(rng, s["Dense_0"]["kernel"])
        sd[f"{pre}.Wqkv.bias"] = _t(rng, np.shape(s["Dense_0"]["bias"]))
        sd[f"{pre}.out_proj.weight"] = _inv_linear(rng, s["Dense_1"]["kernel"])
        sd[f"{pre}.out_proj.bias"] = _t(rng, np.shape(s["Dense_1"]["bias"]))
        sd[f"{pre}.ffn.0.weight"] = _inv_linear(rng, s["Dense_2"]["kernel"])
        sd[f"{pre}.ffn.0.bias"] = _t(rng, np.shape(s["Dense_2"]["bias"]))
        sd[f"{pre}.ffn.1.weight"] = _t(
            rng, np.shape(s["LayerNorm_0"]["scale"]))
        sd[f"{pre}.ffn.1.bias"] = _t(rng, np.shape(s["LayerNorm_0"]["bias"]))
        sd[f"{pre}.ffn.3.weight"] = _inv_linear(rng, s["Dense_3"]["kernel"])
        sd[f"{pre}.ffn.3.bias"] = _t(rng, np.shape(s["Dense_3"]["bias"]))
        c = p[f"cross_{i}"]
        pre = f"transformers.{i}.cross_attn"
        for tname, fname in (("to_qk", "to_qk"), ("to_v", "to_v"),
                             ("to_out", "to_out")):
            sd[f"{pre}.{tname}.weight"] = _inv_linear(rng, c[fname]["kernel"])
            sd[f"{pre}.{tname}.bias"] = _t(rng, np.shape(c[fname]["bias"]))
        sd[f"{pre}.ffn.0.weight"] = _inv_linear(rng, c["Dense_0"]["kernel"])
        sd[f"{pre}.ffn.0.bias"] = _t(rng, np.shape(c["Dense_0"]["bias"]))
        sd[f"{pre}.ffn.1.weight"] = _t(
            rng, np.shape(c["LayerNorm_0"]["scale"]))
        sd[f"{pre}.ffn.1.bias"] = _t(rng, np.shape(c["LayerNorm_0"]["bias"]))
        sd[f"{pre}.ffn.3.weight"] = _inv_linear(rng, c["Dense_1"]["kernel"])
        sd[f"{pre}.ffn.3.bias"] = _t(rng, np.shape(c["Dense_1"]["bias"]))
    # Release checkpoints carry per-layer assignment heads; only the last is
    # used when early exit is disabled (encoder_costvolume.py:79).
    for i in range(n_layers):
        for head in ("final_proj", "matchability"):
            sd[f"log_assignment.{i}.{head}.weight"] = _inv_linear(
                rng, p[head]["kernel"])
            sd[f"log_assignment.{i}.{head}.bias"] = _t(
                rng, np.shape(p[head]["bias"]))
    return sd


_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
    "conv5_3",
]


def make_lpips_sd(rng, flax_params):
    """Release layout: lpips-package vgg.pth (`net.features.*` + `lin*`)."""
    p = flax_params["params"]
    sd = {}
    for idx, name in zip(_VGG_TORCH_IDX, _VGG_NAMES):
        sd[f"features.{idx}.weight"] = _inv_conv(rng, p["vgg"][name]["kernel"])
        sd[f"features.{idx}.bias"] = _t(rng, np.shape(p["vgg"][name]["bias"]))
    for i in range(5):
        if f"lin{i}" in p:
            sd[f"lin{i}.model.1.weight"] = _inv_conv(
                rng, p[f"lin{i}"]["kernel"])
    return sd


def _tiny_cfg(tmp_path, extra=()):
    from test_data import make_chunk

    from pf3plat_tpu.utils.config import load_config

    data_dir = tmp_path / "data" / "test"
    data_dir.mkdir(parents=True, exist_ok=True)
    make_chunk(data_dir / "000000.torch", n_scenes=1, n_frames=12,
               h=72, w=128, seed=11)
    overrides = list(TINY_OVERRIDES) + [
        'dataset.roots=["%s"]' % (tmp_path / "data"),
        f"test.output_path={tmp_path / 'out'}",
        f"checkpointing.directory={tmp_path / 'ckpt'}",
        "test.save_video=false",
        "evaluation_index=null",  # bounded-sampler fallback on synth chunks
        # synthetic scenes are 12 frames; shrink the re10k 75-frame gap
        "view_sampler.min_distance_between_context_views=2",
        "view_sampler.max_distance_between_context_views=6",
        "view_sampler.initial_min_distance_between_context_views=2",
        "view_sampler.initial_max_distance_between_context_views=6",
    ] + list(extra)
    return load_config(CONFIG_DIR / "re10k_test.yaml", overrides)


def _write_release_checkpoints(tmp_path, frozen):
    """Synthesize release-layout torch checkpoints matching `frozen`'s
    shapes and convert them via the real weight_convert CLI."""
    from test_unidepth_parity import TDecoder, _tiny_vit_sd, sd_np

    from pf3plat_tpu.models.backbones import weight_convert as wc
    from pf3plat_tpu.models.backbones.unidepth import UniDepthCfg

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir(exist_ok=True)
    torch.save(make_superpoint_sd(rng, frozen["superpoint"]),
               raw / "superpoint.pth")
    torch.save(make_lightglue_sd(rng, frozen["lightglue"]),
               raw / "lightglue.pth")
    torch.save(make_lpips_sd(rng, frozen["lpips"]), raw / "vgg.pth")

    ucfg = UniDepthCfg.tiny_test()
    e = ucfg.vit.embed_dim
    dec = TDecoder(e, ucfg.hidden_dim, ucfg.num_heads, ucfg.expansion,
                   ucfg.depths, ucfg.camera_dim, len(ucfg.output_idx))
    vit_sd = _tiny_vit_sd(e, ucfg.vit.depth, ucfg.vit.pos_embed_size)
    usd = {f"pixel_decoder.{k}": torch.tensor(v)
           for k, v in sd_np(dec).items()}
    usd.update({f"pixel_encoder.{k}": torch.tensor(np.asarray(v))
                for k, v in vit_sd.items()})
    torch.save(usd, raw / "unidepth.pth")
    # standalone DINOv2 artifact (release layout is the pixel_encoder's)
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in vit_sd.items()},
               raw / "dinov2.pth")

    out = tmp_path / "weights"
    argv = [
        "weight_convert",
        "--superpoint", str(raw / "superpoint.pth"),
        "--lightglue", str(raw / "lightglue.pth"),
        "--dinov2", str(raw / "dinov2.pth"),
        "--unidepth", str(raw / "unidepth.pth"),
        "--vgg", str(raw / "vgg.pth"),
        "--out", str(out),
    ]
    old = sys.argv
    try:
        sys.argv = argv
        wc.main()
    finally:
        sys.argv = old
    return out


class TestWeightsPath:
    @pytest.mark.slow
    def test_convert_cli_and_loader(self, tmp_path):
        """weight_convert.main() -> .pkl -> load_pretrained_frozen: every
        artifact converts, validates against the init tree, and actually
        replaces the random init."""
        import jax
        import jax.numpy as jnp

        from pf3plat_tpu.main import build_model
        from pf3plat_tpu.training.pretrained import load_pretrained_frozen

        cfg = _tiny_cfg(tmp_path)
        model = build_model(cfg)
        images = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)).astype(jnp.float32)
        near = jnp.ones((1, 2))
        far = jnp.full((1, 2), 100.0)
        params = model.init(jax.random.PRNGKey(0), images, intr, near, far)

        out = _write_release_checkpoints(tmp_path, params.frozen)
        for artifact in ("superpoint", "lightglue", "dinov2", "unidepth",
                         "lpips_vgg"):
            assert (out / f"{artifact}.pkl").exists(), artifact

        loaded = load_pretrained_frozen(out, params.frozen)
        for key in ("superpoint", "lightglue", "unidepth", "lpips"):
            old_leaf = jax.tree_util.tree_leaves(params.frozen[key])[0]
            new_leaf = jax.tree_util.tree_leaves(loaded[key])[0]
            assert np.shape(old_leaf) == np.shape(new_leaf)
        # the checkpoints were random — at least one leaf must differ per model
        for key in ("superpoint", "lightglue", "unidepth", "lpips"):
            diffs = [
                not np.allclose(a, b)
                for a, b in zip(jax.tree_util.tree_leaves(params.frozen[key]),
                                jax.tree_util.tree_leaves(loaded[key]))
            ]
            assert any(diffs), f"{key}: loader returned the init tree"

        # a corrupted artifact must fail loudly
        import pickle

        bad = dict_replace_first_leaf_shape(loaded["superpoint"])
        with (out / "superpoint.pkl").open("wb") as f:
            pickle.dump(bad, f)
        with pytest.raises(ValueError, match="superpoint"):
            load_pretrained_frozen(out, params.frozen)

    @pytest.mark.slow
    def test_run_test_with_weights(self, tmp_path):
        """`mode=test weights=<dir>` runs the full eval protocol on the
        converted weights (the main.py-level load path)."""
        import json

        import jax
        import jax.numpy as jnp

        from pf3plat_tpu.main import build_model, run_test

        cfg = _tiny_cfg(tmp_path)
        model = build_model(cfg)
        images = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
        intr = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)).astype(jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), images, intr,
            jnp.ones((1, 2)), jnp.full((1, 2), 100.0),
        )
        out = _write_release_checkpoints(tmp_path, params.frozen)

        cfg = _tiny_cfg(tmp_path, extra=[f"weights={out}"])
        run_test(cfg)
        scores = json.loads(
            (tmp_path / "out" / "scores_all_avg.json").read_text()
        )
        assert scores["all"]["count"] >= 1
        assert np.isfinite(scores["all"]["psnr"])


def dict_replace_first_leaf_shape(tree):
    """Deep-copy `tree` with one leaf's shape broken (for failure tests)."""
    import copy

    bad = copy.deepcopy(jax.tree_util.tree_map(np.asarray, tree))
    d = bad
    while isinstance(d, dict):
        k = sorted(d)[0]
        if isinstance(d[k], dict):
            d = d[k]
        else:
            d[k] = np.zeros(np.shape(d[k]) + (2,), np.float32)
            break
    return bad


import jax  # noqa: E402  (used by dict_replace_first_leaf_shape)
