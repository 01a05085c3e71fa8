"""Shape/finiteness/gradient tests for the encoder's Flax modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.models.costvolume import (
    DepthPredictorCfg,
    DepthPredictorMultiView,
    bilinear_sample,
    warp_with_pose_depth_candidates,
)
from pf3plat_tpu.models.layers import (
    CrossBlock,
    LearnableFourierPositionalEncoding,
    LocalFeatureTransformer,
    SelfBlock,
)
from pf3plat_tpu.models.multiview_transformer import MultiViewFeatureTransformer
from pf3plat_tpu.models.unet import UNetModel


class TestLayers:
    def test_self_block(self):
        m = SelfBlock(embed_dim=64, num_heads=4)
        x = jnp.ones((2, 10, 64))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))

    def test_self_block_with_rotary(self):
        posenc = LearnableFourierPositionalEncoding(dim=16)
        pts = jnp.ones((2, 10, 2))
        pp = posenc.init(jax.random.PRNGKey(0), pts)
        enc = posenc.apply(pp, pts)
        assert enc.shape == (2, 2, 1, 10, 16)
        m = SelfBlock(embed_dim=64, num_heads=4)
        x = jnp.ones((2, 10, 64))
        params = m.init(jax.random.PRNGKey(1), x, enc)
        y = m.apply(params, x, enc)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))

    def test_cross_block(self):
        m = CrossBlock(embed_dim=64, num_heads=4)
        x0 = jnp.ones((2, 10, 64))
        x1 = jnp.ones((2, 7, 64))
        params = m.init(jax.random.PRNGKey(0), x0, x1)
        y0, y1 = m.apply(params, x0, x1)
        assert y0.shape == x0.shape and y1.shape == x1.shape

    def test_loftr_linear_attention(self):
        m = LocalFeatureTransformer(d_model=32, nhead=4)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 32)),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


class TestMultiViewTransformer:
    def test_window_attention_shapes(self):
        m = MultiViewFeatureTransformer(num_layers=2, d_model=32)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 14, 14, 32)), jnp.float32
        )
        params = m.init(jax.random.PRNGKey(0), x, 7)
        y = m.apply(params, x, 7)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))

    def test_no_split_fallback(self):
        m = MultiViewFeatureTransformer(num_layers=1, d_model=32)
        x = jnp.ones((2, 8, 8, 32))
        params = m.init(jax.random.PRNGKey(0), x, 1)
        y = m.apply(params, x, 1)
        assert y.shape == x.shape


class TestUNet:
    @pytest.mark.slow
    def test_unet_with_cross_view_attention(self):
        m = UNetModel(
            model_channels=16, out_channels=8,
            attention_resolutions=(4,), channel_mult=(1, 1, 1), num_views=2,
        )
        x = jnp.ones((4, 16, 16, 12))  # (v*b with v=2, b=2)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (4, 16, 16, 8)
        assert bool(jnp.all(jnp.isfinite(y)))

    @pytest.mark.slow
    def test_bfloat16_compute_dtype(self):
        """dtype=bfloat16 keeps f32 params/output and tracks the f32
        forward closely (norm stats and softmax stay f32); gradients
        stay finite."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 8, 8, 12)), jnp.float32)

        def build(dtype):
            return UNetModel(
                model_channels=16, out_channels=8,
                attention_resolutions=(2,), channel_mult=(1, 1),
                num_views=2, dtype=dtype,
            )

        params = build(None).init(jax.random.PRNGKey(0), x)
        y32 = build(None).apply(params, x)
        m16 = build(jnp.bfloat16)
        y16 = m16.apply(params, x)  # same param tree: params stay f32
        assert y16.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(y16), np.asarray(y32), atol=0.05, rtol=0.05
        )

        g = jax.grad(
            lambda p: jnp.sum(m16.apply(p, x) ** 2)
        )(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


class TestWarp:
    def test_bilinear_sample_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        xs, ys = np.meshgrid(np.arange(8, dtype=np.float32),
                             np.arange(8, dtype=np.float32))
        x = jnp.asarray(np.tile(xs.ravel()[None], (2, 1)))
        y = jnp.asarray(np.tile(ys.ravel()[None], (2, 1)))
        out = bilinear_sample(img, x, y).reshape(2, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_bilinear_sample_out_of_bounds_zero(self):
        img = jnp.ones((1, 4, 4, 1))
        out = bilinear_sample(img, jnp.asarray([[-5.0, 10.0]]), jnp.asarray([[0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_warp_identity_pose_correct_depth(self):
        """With identity relative pose, warped features == original at any depth."""
        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
        intr = jnp.asarray([[[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1.0]]])
        pose = jnp.eye(4)[None]
        depth = jnp.asarray([[2.0, 5.0]])
        out = warp_with_pose_depth_candidates(feat, intr, pose, depth)
        assert out.shape == (1, 2, 8, 8, 4)
        for d in range(2):
            np.testing.assert_allclose(
                np.asarray(out[0, d]), np.asarray(feat[0]), atol=1e-4
            )


@pytest.mark.slow
class TestDepthPredictor:
    def test_full_forward(self):
        cfg = DepthPredictorCfg(
            feature_channels=32,
            num_depth_candidates=16,
            costvolume_unet_feat_dim=16,
            costvolume_unet_channel_mult=(1, 1),
            costvolume_unet_attn_res=(2,),
            gaussian_raw_channels=20,
            depth_unet_feat_dim=8,
            depth_unet_attn_res=(4,),
            depth_unet_channel_mult=(1, 1, 1),
            num_views=2,
        )
        m = DepthPredictorMultiView(cfg)
        b, v, h, w = 1, 2, 32, 32
        h4, w4 = h // 4, w // 4
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((b, v, h4, w4, 32)), jnp.float32)
        intr = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
        )
        extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
        near = jnp.ones((b, v))
        far = jnp.full((b, v), 100.0)
        images = jnp.asarray(rng.uniform(0, 1, (v * b, h, w, 3)), jnp.float32)
        disparity = jnp.asarray(rng.uniform(0, 1, (v * b, h, w, 1)), jnp.float32)
        mono = jnp.asarray(rng.uniform(0, 1, (v * b, h4, w4, 16)), jnp.float32)
        params = m.init(
            jax.random.PRNGKey(0), feats, intr, extr, near, far, images,
            disparity, mono,
        )
        densities, raw_g = m.apply(
            params, feats, intr, extr, near, far, images, disparity, mono
        )
        assert densities.shape == (b, v, h * w, 1)
        assert raw_g.shape == (b, v, h * w, 20)
        assert bool(jnp.all(jnp.isfinite(densities)))
        assert bool(jnp.all(jnp.isfinite(raw_g)))
        assert float(densities.min()) >= 0 and float(densities.max()) <= 1
