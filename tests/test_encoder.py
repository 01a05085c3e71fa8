"""End-to-end encoder tests on synthetic scenes with known geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.geometry.transforms import geodesic_distance
from pf3plat_tpu.models.encoder import (
    Correspondences,
    EncoderCfg,
    FrozenInputs,
    PoseFreeEncoder,
    view_pairs,
)
from pf3plat_tpu.models.gaussian_adapter import GaussianAdapterCfg


def tiny_cfg(v=2):
    return EncoderCfg(
        d_feature=32,
        d_backbone=48,
        num_depth_candidates=16,
        multiview_trans_attn_split=2,
        n_attn_layers=2,
        d_pose=32,
        pose_heads=4,
        ransac_samples=32,
        gaussian_adapter=GaussianAdapterCfg(sh_degree=1),
        costvolume_unet_feat_dim=16,
        costvolume_unet_channel_mult=(1, 1),
        costvolume_unet_attn_res=(2,),
        depth_unet_feat_dim=8,
        depth_unet_attn_res=(4,),
        depth_unet_channel_mult=(1, 1, 1),
    )


def synthetic_scene(v=2, b=1, h=32, w=32, hd=8, wd=8, seed=0):
    """Views of a z=4 textured wall with known relative poses."""
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
    ).astype(np.float32)
    near = np.ones((b, v), np.float32)
    far = np.full((b, v), 50.0, np.float32)

    # Camera k is translated by 0.2*k along x; wall at z=4 in cam-0 frame.
    c2w = np.broadcast_to(np.eye(4), (b, v, 4, 4)).copy()
    for k in range(v):
        c2w[:, k, 0, 3] = 0.2 * k
    depth = np.full((b, v, h, w), 4.0, np.float32)
    feats = rng.standard_normal((b, v, hd, wd, 48)).astype(np.float32)

    # Correspondences: random 3D points on the wall observed in both views.
    pair_i, pair_j = view_pairs(v)
    m = 64
    k0 = np.zeros((b, len(pair_i), m, 2), np.float32)
    k1 = np.zeros_like(k0)
    for p, (i, j) in enumerate(zip(pair_i, pair_j)):
        pts = np.stack(
            [rng.uniform(-1.5, 1.5, (b, m)), rng.uniform(-1.5, 1.5, (b, m)),
             np.full((b, m), 4.0)], axis=-1)  # world(=cam0) coords
        for (vi, arr) in ((i, k0), (j, k1)):
            cam = pts - c2w[:, vi, None, :3, 3]  # identity rotations
            x = cam[..., 0] / cam[..., 2] * w + 0.5 * w
            y = cam[..., 1] / cam[..., 2] * h + 0.5 * h
            arr[:, p, :, 0] = x
            arr[:, p, :, 1] = y
    scores = np.full((b, len(pair_i), m), 0.9, np.float32)
    valid = np.ones((b, len(pair_i), m), bool)

    return dict(
        images=jnp.asarray(images),
        intrinsics=jnp.asarray(intr),
        near=jnp.asarray(near),
        far=jnp.asarray(far),
        frozen=FrozenInputs(jnp.asarray(depth), jnp.asarray(feats)),
        corr=Correspondences(
            jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(scores),
            jnp.asarray(valid),
        ),
        c2w=c2w,
    )


@pytest.mark.slow
class TestEncoder:
    @pytest.mark.parametrize("v", [2, 3, 5])
    def test_forward_shapes_and_pose_recovery(self, v):
        cfg = tiny_cfg(v)
        scene = synthetic_scene(v=v)
        model = PoseFreeEncoder(cfg)
        args = (
            scene["images"], scene["intrinsics"], scene["near"], scene["far"],
            scene["frozen"], scene["corr"], jnp.asarray(0), jax.random.PRNGKey(0),
        )
        params = model.init(jax.random.PRNGKey(1), *args)
        out = model.apply(params, *args)

        b, h, w = 1, 32, 32
        n_g = 2 * h * w  # first & last view
        assert out.gaussians.means.shape == (b, n_g, 3)
        assert out.gaussians.covariances.shape == (b, n_g, 3, 3)
        assert out.gaussians.opacities.shape == (b, n_g)
        assert bool(jnp.all(jnp.isfinite(out.gaussians.means)))
        assert out.refined_poses.shape == (b, v, 4, 4)
        assert out.depths.shape == (b, v, h, w)

        # Coarse pose recovery: synthetic correspondences are exact, so the
        # RANSAC Procrustes poses must match ground truth.
        c2w = scene["c2w"]
        pair_i, pair_j = view_pairs(v)
        for p, (i, j) in enumerate(zip(pair_i, pair_j)):
            true_rel = np.linalg.inv(c2w[0, j]) @ c2w[0, i]
            got = np.asarray(out.pairwise_poses[0, p])
            rot_err = geodesic_distance(
                jnp.asarray(got[:3, :3]), jnp.asarray(true_rel[:3, :3].astype(np.float32))
            )
            assert float(rot_err) < 0.05, f"pair {i}->{j} rot err {float(rot_err)}"
            np.testing.assert_allclose(got[:3, 3], true_rel[:3, 3], atol=0.1)

        # Synced poses: w2c in view-0 frame.
        for k in range(v):
            true_sync = np.linalg.inv(c2w[0, k]) @ c2w[0, 0]
            got = np.asarray(out.sync_poses[0, k])
            np.testing.assert_allclose(got[:3, 3], true_sync[:3, 3], atol=0.1)

    def test_no_valid_matches_falls_back_finite(self):
        """SURVEY §5.3 failure fallback: with ZERO valid correspondences the
        RANSAC solver must fall back to identity pairwise poses and the
        whole forward must stay finite (reference behavior: cv2 PnP simply
        fails and the step is skipped; here the fallback keeps training)."""
        import jax.tree_util as jtu

        cfg = tiny_cfg()
        scene = synthetic_scene()
        corr = scene["corr"]._replace(
            valid=jnp.zeros_like(scene["corr"].valid),
            scores=jnp.zeros_like(scene["corr"].scores),
        )
        model = PoseFreeEncoder(cfg)
        args = (
            scene["images"], scene["intrinsics"], scene["near"], scene["far"],
            scene["frozen"], corr, jnp.asarray(0), jax.random.PRNGKey(0),
        )
        params = model.init(jax.random.PRNGKey(1), *args)
        out = model.apply(params, *args)
        for leaf in jtu.tree_leaves(out):
            assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite output"
        # coarse pairwise poses fell back to identity
        np.testing.assert_allclose(
            np.asarray(out.pairwise_poses[0, 0]), np.eye(4), atol=1e-5
        )

    def test_gradients_flow(self):
        cfg = tiny_cfg()
        scene = synthetic_scene()
        model = PoseFreeEncoder(cfg)
        args = (
            scene["images"], scene["intrinsics"], scene["near"], scene["far"],
            scene["frozen"], scene["corr"], jnp.asarray(0), jax.random.PRNGKey(0),
        )
        params = model.init(jax.random.PRNGKey(1), *args)

        def loss(p):
            out = model.apply(p, *args)
            return (
                jnp.mean(out.gaussians.means**2)
                + jnp.mean(out.gaussians.opacities)
                + jnp.mean(out.refined_poses[:, 1:, :3, 3] ** 2)
            )

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        # At least the depth predictor and pose branch must receive gradient.
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).max()) for k, v in flat}
        assert any("depth_predictor" in k and m > 0 for k, m in nonzero.items())
        assert any("pose_branch" in k and m > 0 for k, m in nonzero.items())
