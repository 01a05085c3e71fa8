"""Losses, metrics, and end-to-end train-step tests (loss must decrease)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.models.decoder import DecoderCfg
from pf3plat_tpu.models.encoder import PoseFreeEncoder
from pf3plat_tpu.ops.rasterizer import RasterizeConfig
from pf3plat_tpu.ops.ssim import ssim
from pf3plat_tpu.training import metrics
from pf3plat_tpu.training.losses import LossCfg, total_loss
from pf3plat_tpu.training.train import (
    OptimizerCfg,
    init_train_state,
    make_optimizer,
    make_train_step,
)

from test_encoder import synthetic_scene, tiny_cfg


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)), jnp.float32
        )
        assert float(ssim(img, img)) > 0.999

    def test_noise_lowers_ssim(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
        noisy = img + jnp.asarray(rng.normal(0, 0.2, img.shape), jnp.float32)
        val = float(ssim(img, noisy))
        assert 0.0 < val < 0.9

    def test_matches_skimage(self):
        skimage = pytest.importorskip("skimage")
        from skimage.metrics import structural_similarity

        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None]))
        ref = structural_similarity(
            a, b, win_size=11, gaussian_weights=True, channel_axis=2,
            data_range=1.0, sigma=1.5, use_sample_covariance=False,
        )
        np.testing.assert_allclose(ours, ref, atol=0.015)


class TestMetrics:
    def test_psnr(self):
        gt = jnp.zeros((1, 8, 8, 3))
        pred = jnp.full((1, 8, 8, 3), 0.1)
        np.testing.assert_allclose(
            float(metrics.compute_psnr(gt, pred)[0]), 20.0, atol=1e-3
        )

    def test_pose_errors_zero_for_identical(self):
        rng = np.random.default_rng(3)
        c2w = np.broadcast_to(np.eye(4), (1, 2, 4, 4)).copy()
        c2w[:, 1, :3, 3] = [1.0, 0, 0]
        e = metrics.pose_errors(jnp.asarray(c2w), jnp.asarray(c2w))
        assert float(e["rot_deg"][0]) < 1e-3
        assert float(e["trans_norm"][0]) < 1e-6


@pytest.mark.slow
class TestTrainStep:
    def test_loss_decreases(self):
        cfg = tiny_cfg()
        scene = synthetic_scene(v=2)
        encoder = PoseFreeEncoder(cfg)
        args = (
            scene["images"], scene["intrinsics"], scene["near"], scene["far"],
            scene["frozen"], scene["corr"], jnp.asarray(0), jax.random.PRNGKey(0),
        )
        enc_params = encoder.init(jax.random.PRNGKey(1), *args)
        params = {"encoder": enc_params}

        opt = make_optimizer(OptimizerCfg(lr=1e-3, max_steps=100))
        state = init_train_state(params, opt)
        decoder_cfg = DecoderCfg(
            impl="tiled",
            raster=RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64),
        )
        step = make_train_step(
            encoder, decoder_cfg, LossCfg(ssim_weight=0.0), opt, (32, 32)
        )
        step = jax.jit(step)

        batch = {
            "context": {
                "image": scene["images"],
                "intrinsics": scene["intrinsics"],
                "near": scene["near"],
                "far": scene["far"],
            },
            "target": {"image": scene["images"]},
            "frozen": scene["frozen"],
            "corr": scene["corr"],
        }
        mses = []
        rng = jax.random.PRNGKey(2)
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, aux = step(state, batch, sub)
            mses.append(float(aux["mse"]))
            assert np.isfinite(float(aux["loss"]))
        # The photometric term must decrease (the pose term is noisy due to
        # per-step RANSAC resampling, so total loss is not monotone).
        assert mses[-1] < mses[0], f"mse did not decrease: {mses}"
        assert int(state.step) == 8


class TestPoseAUC:
    def test_exact_values(self):
        from pf3plat_tpu.training.metrics import pose_auc

        # All errors zero -> recall 1 everywhere -> AUC 1 at any threshold.
        out = pose_auc([0.0, 0.0, 0.0])
        assert out == {"auc_5": 1.0, "auc_10": 1.0, "auc_20": 1.0}

        # All errors above every threshold -> AUC 0.
        out = pose_auc([50.0, 60.0])
        for v in out.values():
            assert v == 0.0

        # Standard (SuperGlue-style) trapezoid over the recall curve:
        # single error 2 at t=5 -> points (0,0),(2,1),(5,1) -> (1+3)/5.
        out = pose_auc([2.0], thresholds=(5.0,))
        np.testing.assert_allclose(out["auc_5"], 0.8)

        # Errors 2, 8 at t=10 -> (0,0),(2,.5),(8,1),(10,1) ->
        # (0.5 + 4.5 + 2) / 10.
        out = pose_auc([2.0, 8.0], thresholds=(10.0,))
        np.testing.assert_allclose(out["auc_10"], 0.7)

    def test_empty(self):
        from pf3plat_tpu.training.metrics import pose_auc

        assert pose_auc([]) == {"auc_5": 0.0, "auc_10": 0.0, "auc_20": 0.0}


class TestCheckpointWarmStart:
    def test_load_from_other_run(self, tmp_path):
        import optax

        from pf3plat_tpu.training.checkpoints import (
            CheckpointCfg, CheckpointManager,
        )
        from pf3plat_tpu.training.train import TrainState

        params = {"w": jnp.arange(4.0)}
        opt = optax.sgd(0.1)
        state = TrainState(params, opt.init(params), jnp.asarray(7))

        src = CheckpointManager(CheckpointCfg(
            directory=tmp_path / "src", every_n_steps=1, keep=1,
        ))
        src.save_frozen({"f": jnp.ones(2) * 3})
        src.maybe_save(jax.device_get(state))
        src.wait()

        template = TrainState(
            {"w": jnp.zeros(4)}, opt.init({"w": jnp.zeros(4)}),
            jnp.asarray(0),
        )
        dst = CheckpointManager(CheckpointCfg(
            directory=tmp_path / "dst", every_n_steps=1, keep=1,
            load=tmp_path / "src",
        ))
        restored = dst.restore_latest(template)
        assert restored is not None
        assert int(restored.step) == 7
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(4.0))
        # frozen weights carried into the new run's directory
        assert dst.has_frozen()
        frozen = dst.restore_frozen({"f": jnp.zeros(2)})
        np.testing.assert_allclose(np.asarray(frozen["f"]), 3.0)

    def test_load_missing_raises(self, tmp_path):
        import optax

        from pf3plat_tpu.training.checkpoints import (
            CheckpointCfg, CheckpointManager,
        )
        from pf3plat_tpu.training.train import TrainState

        opt = optax.sgd(0.1)
        template = TrainState(
            {"w": jnp.zeros(2)}, opt.init({"w": jnp.zeros(2)}),
            jnp.asarray(0),
        )
        dst = CheckpointManager(CheckpointCfg(
            directory=tmp_path / "dst", load=tmp_path / "nonexistent",
        ))
        with pytest.raises(FileNotFoundError):
            dst.restore_latest(template)
