"""Experiment-config coverage + evaluation-protocol compatibility.

Covers VERDICT round-1 items: ACID/DL3DV experiment + test configs
(BASELINE configs 3-4), the real `assets/evaluation_index_re10k.json`
schema (incl. null entries) through `EvaluationViewSampler`, and a
`mode=test` dry-run on synthetic chunks for all three dataset protocols.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"
REF_INDEX = Path("/root/reference/assets/evaluation_index_re10k.json")


class TestConfigsParse:
    @pytest.mark.parametrize(
        "name", sorted(p.name for p in CONFIG_DIR.glob("*.yaml"))
    )
    def test_parses(self, name):
        from pf3plat_tpu.utils.config import load_config

        cfg = load_config(CONFIG_DIR / name)
        assert cfg.mode in ("train", "test")
        assert tuple(cfg.dataset.image_shape)
        if name in ("re10k.yaml", "acid.yaml", "dl3dv.yaml"):
            # reference protocol of record: 1 target view, lpips from step 0
            assert cfg.view_sampler.num_target_views == 1
            assert cfg.loss.lpips_weight == pytest.approx(0.1)
            assert cfg.loss.pose_weight_2d == pytest.approx(0.005)
            assert cfg.loss.pose_weight_3d == pytest.approx(0.025)
        if name.endswith("_test.yaml"):
            assert cfg.mode == "test"

    def test_re10k_matches_reference_schedule(self):
        from pf3plat_tpu.utils.config import load_config

        cfg = load_config(CONFIG_DIR / "re10k.yaml")
        vs = cfg.view_sampler
        # config/dataset/view_sampler_dataset_specific_config/bounded_re10k.yaml
        assert vs.min_distance_between_context_views == 75
        assert vs.max_distance_between_context_views == 75
        assert vs.initial_min_distance_between_context_views == 75
        assert vs.warm_up_steps == 150000


class TestRealEvaluationIndex:
    @pytest.mark.skipif(not REF_INDEX.exists(), reason="reference assets absent")
    def test_real_index_schema(self):
        """The released CoPoNeRF RE10K index (7194 scenes, 720 nulls) must
        load as-is: non-null entries give (ctx 2, tgt 3), null entries raise
        SampleError (the dataset skips those scenes)."""
        from pf3plat_tpu.data.view_samplers import (
            EvaluationViewSampler, SampleError,
        )

        s = EvaluationViewSampler(REF_INDEX)
        raw = json.loads(REF_INDEX.read_text())
        some_valid = next(k for k, v in raw.items() if v is not None)
        some_null = next(k for k, v in raw.items() if v is None)
        ctx, tgt = s.sample(some_valid, num_views=10**9)
        assert ctx.shape == (2,) and tgt.shape == (3,)
        assert ctx.dtype == np.int64
        with pytest.raises(SampleError):
            s.sample(some_null, num_views=10**9)
        with pytest.raises(SampleError):
            s.sample("not_a_scene", num_views=10**9)


TINY_OVERRIDES = [
    "model.tiny_backbones=true",
    "model.max_keypoints=64",
    "model.max_matches=32",
    "model.lightglue_layers=2",
    "encoder.d_feature=32",
    "encoder.d_backbone=128",
    "encoder.num_depth_candidates=16",
    "encoder.multiview_trans_attn_split=2",
    "encoder.n_attn_layers=2",
    "encoder.d_pose=32",
    "encoder.ransac_samples=32",
    "encoder.gaussian_adapter.sh_degree=1",
    "encoder.costvolume_unet_feat_dim=16",
    "encoder.costvolume_unet_channel_mult=[1,1]",
    "encoder.costvolume_unet_attn_res=[2]",
    "encoder.depth_unet_feat_dim=8",
    "encoder.depth_unet_attn_res=[4]",
    "encoder.depth_unet_channel_mult=[1,1,1]",
    "decoder.impl=tiled",
    "decoder.raster.tile_capacity=256",
    "dataset.image_shape=[32,32]",
    "dataset.original_image_shape=[72,128]",
    "test.eval_time_skip_steps=0",
    "test.save_video=true",
    "test.video_frames=4",
]


@pytest.mark.slow
class TestModeTestDryRun:
    """`mode=test` end-to-end on synthetic chunks for each dataset config."""

    @pytest.mark.parametrize("name", ["re10k_test", "acid_test", "dl3dv_test"])
    def test_dry_run(self, name, tmp_path):
        from test_data import make_chunk

        from pf3plat_tpu.main import run_test
        from pf3plat_tpu.utils.config import load_config

        data_dir = tmp_path / "data" / "test"
        data_dir.mkdir(parents=True)
        make_chunk(data_dir / "000000.torch", n_scenes=2, n_frames=20,
                   h=72, w=128, seed=3)

        overrides = list(TINY_OVERRIDES) + [
            'dataset.roots=["%s"]' % (tmp_path / "data"),
            f"test.output_path={tmp_path / 'out'}",
            f"checkpointing.directory={tmp_path / 'ckpt'}",
        ]
        if name in ("re10k_test", "acid_test"):
            # synthetic evaluation index in the released schema (incl. a
            # null entry the loop must skip)
            import torch

            chunk = torch.load(data_dir / "000000.torch",
                               weights_only=False)
            scenes = [ex["key"] for ex in chunk]
            index = {
                scenes[0]: {"context": [2, 14], "target": [5, 8, 11]},
                scenes[1]: None,
            }
            idx_path = tmp_path / "index.json"
            idx_path.write_text(json.dumps(index))
            overrides.append(f"evaluation_index={idx_path}")

        cfg = load_config(CONFIG_DIR / f"{name}.yaml", overrides)
        run_test(cfg)

        out = tmp_path / "out"
        scores = json.loads((out / "scores_all_avg.json").read_text())
        assert scores["all"]["count"] >= 1
        assert np.isfinite(scores["all"]["psnr"])
        # pose AUC buckets reported whenever pose errors were recorded
        if "rot_deg" in scores["all"]:
            for k in ("auc_5", "auc_10", "auc_20"):
                assert 0.0 <= scores["all"][k] <= 1.0
        assert (out / "metrics.txt").exists()
        assert list((out / "images" / "pred").glob("*.png"))
        assert list((out / "images" / "gt").glob("*.png"))
        # rendered-depth panels (reference `model_wrapper.py:269-278`)
        assert list((out / "depth").glob("*.png"))
        assert list((out / "video").glob("*.gif")) or list(
            (out / "video").glob("*.mp4")
        )

    def test_all_sampler_video_eval(self, tmp_path):
        """`test.sampler=all` runs the trajectory-video protocol: every
        (capped) frame becomes context+target (reference
        `view_sampler_all.py`)."""
        from test_data import make_chunk

        from pf3plat_tpu.main import run_test
        from pf3plat_tpu.utils.config import load_config

        data_dir = tmp_path / "data" / "test"
        data_dir.mkdir(parents=True)
        make_chunk(data_dir / "000000.torch", n_scenes=1, n_frames=9,
                   h=72, w=128, seed=5)
        overrides = list(TINY_OVERRIDES) + [
            'dataset.roots=["%s"]' % (tmp_path / "data"),
            f"test.output_path={tmp_path / 'out'}",
            f"checkpointing.directory={tmp_path / 'ckpt'}",
            "test.sampler=all",
            "test.all_sampler_max_views=4",
        ]
        cfg = load_config(CONFIG_DIR / "re10k_test.yaml", overrides)
        run_test(cfg)
        out = tmp_path / "out"
        scores = json.loads((out / "scores_all_avg.json").read_text())
        assert scores["all"]["count"] >= 1
        # 4 views spliced: targets = views[1:-1] -> 2 pred/gt images
        assert len(list((out / "images" / "pred").glob("*.png"))) == 2
        assert list((out / "video").glob("*.mp4")) or list(
            (out / "video").glob("*.gif")
        )
