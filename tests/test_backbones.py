"""Frozen-backbone tests: SuperPoint/LightGlue/DINOv2/UniDepth/LPIPS shapes,
matcher behavior on warped images, converter round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.models.backbones.dinov2 import DINOv2, ViTCfg
from pf3plat_tpu.models.backbones.lightglue import LightGlue, normalize_keypoints
from pf3plat_tpu.models.backbones.matching import match_context_views
from pf3plat_tpu.models.backbones.superpoint import SuperPoint, simple_nms
from pf3plat_tpu.models.backbones.unidepth import UniDepth, UniDepthCfg
from pf3plat_tpu.models.backbones.vgg_lpips import LPIPS


class TestSuperPoint:
    def test_keypoints_on_corners(self):
        """A bright checkerboard should yield valid keypoints at corners."""
        rng = np.random.default_rng(0)
        img = np.zeros((1, 64, 64, 3), np.float32)
        img[:, ::8, :, :] = 1.0
        img[:, :, ::8, :] = 1.0
        img += rng.uniform(0, 0.05, img.shape).astype(np.float32)
        sp = SuperPoint(max_num_keypoints=128)
        params = sp.init(jax.random.PRNGKey(0), jnp.asarray(img))
        kp = sp.apply(params, jnp.asarray(img))
        assert kp.xy.shape == (1, 128, 2)
        assert kp.descriptors.shape == (1, 128, 256)
        # Descriptors of valid keypoints are unit-normalized.
        norms = np.linalg.norm(np.asarray(kp.descriptors), axis=-1)
        valid = np.asarray(kp.valid)
        if valid.any():
            np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)

    def test_nms_suppresses_neighbors(self):
        scores = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(1.0).at[0, 10, 12].set(0.5)
        out = np.asarray(simple_nms(scores, 4))
        assert out[0, 10, 10] == 1.0
        assert out[0, 10, 12] == 0.0


class TestLightGlue:
    def test_normalize_keypoints(self):
        xy = jnp.asarray([[[0.0, 0.0], [64.0, 32.0]]])
        n = normalize_keypoints(xy, 32, 64)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [-1.0, -0.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(n[0, 1]), [1.0, 0.5], atol=1e-6)

    def test_forward_shapes_and_mask(self):
        from pf3plat_tpu.models.backbones.superpoint import Keypoints

        rng = np.random.default_rng(1)
        k = 32
        mk = lambda: Keypoints(
            xy=jnp.asarray(rng.uniform(0, 64, (1, k, 2)), jnp.float32),
            scores=jnp.asarray(rng.uniform(0, 1, (1, k)), jnp.float32),
            descriptors=jnp.asarray(rng.standard_normal((1, k, 64)), jnp.float32),
            valid=jnp.asarray((np.arange(k) < 24)[None]),  # last 8 invalid
        )
        lg = LightGlue(descriptor_dim=64, n_layers=2, num_heads=4)
        kp0, kp1 = mk(), mk()
        params = lg.init(jax.random.PRNGKey(0), kp0, kp1, (64, 64))
        res = lg.apply(params, kp0, kp1, (64, 64))
        assert res.m0.shape == (1, k)
        # Invalid slots can never be matched.
        assert not bool(res.valid[0, 24:].any())

    def test_identical_descriptors_match_identity(self):
        """Same keypoints+descriptors in both images -> identity matching."""
        from pf3plat_tpu.models.backbones.superpoint import Keypoints

        rng = np.random.default_rng(2)
        k = 16
        desc = rng.standard_normal((1, k, 64)).astype(np.float32) * 3
        kp = Keypoints(
            xy=jnp.asarray(rng.uniform(0, 64, (1, k, 2)), jnp.float32),
            scores=jnp.ones((1, k)),
            descriptors=jnp.asarray(desc),
            valid=jnp.ones((1, k), bool),
        )
        lg = LightGlue(descriptor_dim=64, n_layers=2, num_heads=4,
                       filter_threshold=0.0)
        params = lg.init(jax.random.PRNGKey(0), kp, kp, (64, 64))
        res = lg.apply(params, kp, kp, (64, 64))
        # With identical inputs the assignment should be near-identity for
        # most points even at random init (descriptor similarity dominates).
        m0 = np.asarray(res.m0[0])
        frac_id = (m0 == np.arange(k)).mean()
        assert frac_id > 0.5, f"identity fraction {frac_id}"


class TestMatching:
    @pytest.mark.slow
    def test_match_context_views_shapes(self):
        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.uniform(0, 1, (1, 2, 64, 64, 3)), jnp.float32)
        sp = SuperPoint(max_num_keypoints=64)
        sp_params = sp.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
        lg = LightGlue(descriptor_dim=256, n_layers=2, num_heads=4)
        from pf3plat_tpu.models.backbones.superpoint import Keypoints

        dummy = Keypoints(
            xy=jnp.zeros((1, 64, 2)), scores=jnp.zeros((1, 64)),
            descriptors=jnp.zeros((1, 64, 256)), valid=jnp.zeros((1, 64), bool),
        )
        lg_params = lg.init(jax.random.PRNGKey(1), dummy, dummy, (64, 64))
        corr = match_context_views(sp, sp_params, lg, lg_params, images,
                                   max_matches=32)
        assert corr.kpts0.shape == (1, 1, 32, 2)
        assert corr.valid.shape == (1, 1, 32)


class TestDINOv2:
    def test_vit_taps(self):
        cfg = ViTCfg.tiny_test()
        m = DINOv2(cfg, out_layers=(0, 1))
        x = jnp.ones((1, 28, 28, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        taps, cls = m.apply(params, x)
        assert len(taps) == 2 and len(cls) == 2
        assert taps[0].shape == (1, 2, 2, 64)
        assert cls[0].shape == (1, 1, 64)

    def test_pos_embed_interpolation(self):
        cfg = ViTCfg.tiny_test()  # pos_embed_size 8 vs 2x2 grid
        m = DINOv2(cfg, out_layers=(1,))
        x = jnp.ones((1, 56, 56, 3))  # 4x4 grid != 8x8 embedding
        params = m.init(jax.random.PRNGKey(0), x)
        taps, _ = m.apply(params, x)
        assert taps[0].shape == (1, 4, 4, 64)


class TestUniDepth:
    @pytest.mark.slow
    def test_interface(self):
        cfg = UniDepthCfg.tiny_test()
        m = UniDepth(cfg)
        img = jnp.ones((1, 56, 56, 3)) * 0.5
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        params = m.init(jax.random.PRNGKey(0), img, intr)
        out = m.apply(params, img, intr)
        assert out.depth.shape == (1, 56, 56)
        assert out.confidence.shape == (1, 56, 56)
        assert out.features.shape[-1] == 128  # 2 taps x 64
        assert bool(jnp.all(out.depth > 0))
        assert bool(jnp.all(jnp.isfinite(out.depth)))
        # predicted-intrinsics path
        out2 = m.apply(params, img, None)
        assert out2.intrinsics.shape == (1, 3, 3)


class TestLPIPS:
    def test_zero_for_identical(self):
        m = LPIPS()
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)), jnp.float32
        )
        params = m.init(jax.random.PRNGKey(0), img, img)
        d = m.apply(params, img, img)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_positive_for_different(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
        m = LPIPS()
        params = m.init(jax.random.PRNGKey(0), a, b)
        assert float(m.apply(params, a, b)[0]) > 0


class TestWeightConverter:
    def test_superpoint_roundtrip(self):
        """Random torch SuperPoint -> converted flax params -> same output."""
        torch = pytest.importorskip("torch")
        from pf3plat_tpu.models.backbones.weight_convert import (
            convert_superpoint,
        )

        tnn = torch.nn
        layers = {
            "conv1a": tnn.Conv2d(1, 64, 3, padding=1),
            "conv1b": tnn.Conv2d(64, 64, 3, padding=1),
            "conv2a": tnn.Conv2d(64, 64, 3, padding=1),
            "conv2b": tnn.Conv2d(64, 64, 3, padding=1),
            "conv3a": tnn.Conv2d(64, 128, 3, padding=1),
            "conv3b": tnn.Conv2d(128, 128, 3, padding=1),
            "conv4a": tnn.Conv2d(128, 128, 3, padding=1),
            "conv4b": tnn.Conv2d(128, 128, 3, padding=1),
            "convPa": tnn.Conv2d(128, 256, 3, padding=1),
            "convPb": tnn.Conv2d(256, 65, 1),
            "convDa": tnn.Conv2d(128, 256, 3, padding=1),
            "convDb": tnn.Conv2d(256, 256, 1),
        }
        sd = {}
        for name, mod in layers.items():
            sd[f"{name}.weight"] = mod.weight.detach()
            sd[f"{name}.bias"] = mod.bias.detach()
        flax_params = convert_superpoint(
            {k: v.numpy() for k, v in sd.items()}
        )

        # torch forward of the first conv vs flax conv with converted params
        img = np.random.default_rng(0).uniform(0, 1, (1, 1, 16, 16)).astype(
            np.float32
        )
        with torch.no_grad():
            t_out = torch.relu(layers["conv1a"](torch.from_numpy(img))).numpy()
        import flax.linen as fnn

        conv = fnn.Conv(64, (3, 3))
        j_out = jax.nn.relu(
            conv.apply(
                {"params": flax_params["params"]["conv1a"]},
                jnp.asarray(img.transpose(0, 2, 3, 1)),
            )
        )
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.transpose(0, 2, 3, 1), atol=1e-5
        )
