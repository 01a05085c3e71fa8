"""Data pipeline tests on synthetic chunk fixtures."""

import io
from pathlib import Path

import numpy as np
import pytest

from pf3plat_tpu.data.dataset import (
    ChunkDataset,
    DatasetCfg,
    batch_examples,
    convert_poses,
)
from pf3plat_tpu.data.shims import (
    apply_augmentation_shim,
    apply_crop_shim,
    apply_patch_shim,
    reflect_extrinsics,
)
from pf3plat_tpu.data.view_samplers import (
    AllViewSampler,
    BoundedSamplerCfg,
    BoundedViewSampler,
    EvaluationViewSampler,
    SampleError,
)


def make_chunk(path: Path, n_scenes=2, n_frames=60, h=72, w=128, seed=0):
    import torch
    from PIL import Image

    rng = np.random.default_rng(seed)
    chunk = []
    for s in range(n_scenes):
        cams = np.zeros((n_frames, 18), np.float32)
        cams[:, 0] = 0.9   # fx
        cams[:, 1] = 1.6   # fy (normalized; fov ~35deg)
        cams[:, 2] = 0.5
        cams[:, 3] = 0.5
        for f in range(n_frames):
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = -0.01 * f
            cams[f, 6:] = w2c[:3].reshape(-1)
        images = []
        for f in range(n_frames):
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            images.append(torch.frombuffer(
                bytearray(buf.getvalue()), dtype=torch.uint8).clone())
        chunk.append({
            "key": f"scene_{s}_{seed}",
            "cameras": torch.asarray(cams),
            "images": images,
            "url": "",
            "timestamps": torch.arange(n_frames),
        })
    torch.save(chunk, path)


class TestPoseDecode:
    def test_convert_poses_roundtrip(self):
        rng = np.random.default_rng(0)
        cams = np.zeros((3, 18), np.float32)
        cams[:, :4] = [0.8, 1.1, 0.5, 0.45]
        for f in range(3):
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, 3] = rng.standard_normal(3)
            cams[f, 6:] = w2c[:3].reshape(-1)
        c2w, intr = convert_poses(cams)
        assert c2w.shape == (3, 4, 4)
        np.testing.assert_allclose(intr[0, 0, 0], 0.8, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.inv(c2w[1])[:3].reshape(-1), cams[1, 6:], atol=1e-5
        )


class TestSamplers:
    def test_bounded_sampler(self):
        cfg = BoundedSamplerCfg(
            num_target_views=3,
            min_distance_between_context_views=10,
            max_distance_between_context_views=20,
        )
        s = BoundedViewSampler(cfg)
        rng = np.random.default_rng(0)
        ctx, tgt = s.sample("x", 60, rng, 0)
        assert len(ctx) == 2 and len(tgt) == 3
        assert ctx[0] <= tgt.min() and tgt.max() <= ctx[1]

    def test_bounded_sampler_not_enough_frames(self):
        cfg = BoundedSamplerCfg(
            min_distance_between_context_views=100,
            max_distance_between_context_views=100,
        )
        s = BoundedViewSampler(cfg)
        with pytest.raises(SampleError):
            # num_views-1 < min_gap after the pixelsplat-quirk clamp is fine;
            # quirk: max_gap = min(num_views-1, min_gap) = 9 < min_gap=100
            s.sample("x", 10, np.random.default_rng(0), 0)

    def test_evaluation_sampler(self, tmp_path):
        import json

        idx = {"sceneA": {"context": [0, 30], "target": [10, 15, 20]},
               "sceneB": None}
        p = tmp_path / "index.json"
        p.write_text(json.dumps(idx))
        s = EvaluationViewSampler(p)
        ctx, tgt = s.sample("sceneA", 60)
        assert ctx.tolist() == [0, 30]
        assert tgt.tolist() == [10, 15, 20]
        with pytest.raises(SampleError):
            s.sample("sceneB", 60)


class TestShims:
    def _example(self, h=64, w=96, v=2):
        rng = np.random.default_rng(0)
        views = {
            "extrinsics": np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)),
            "intrinsics": np.tile(
                np.asarray([[1, 0, 0.5], [0, 1, 0.5], [0, 0, 1]], np.float32),
                (v, 1, 1),
            ),
            "image": rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32),
            "near": np.ones(v, np.float32),
            "far": np.full(v, 100.0, np.float32),
            "index": np.arange(v),
        }
        return {"context": views, "target": dict(views), "scene": "s"}

    def test_crop_shim(self):
        ex = apply_crop_shim(self._example(), (48, 48))
        assert ex["context"]["image"].shape == (2, 48, 48, 3)
        # fx scaled by w_in/w_out after aspect-preserving rescale.
        assert ex["context"]["intrinsics"][0, 0, 0] > 1.0

    def test_patch_shim(self):
        ex = apply_patch_shim(self._example(h=66, w=98), 16)
        assert ex["context"]["image"].shape == (2, 64, 96, 3)

    def test_augmentation_flip_preserves_geometry(self):
        ex = self._example()
        rng = np.random.default_rng(5)  # chosen so flip occurs
        out = apply_augmentation_shim(ex, rng)
        r = reflect_extrinsics(ex["context"]["extrinsics"])
        assert np.allclose(r[:, 1:3, 1:3], np.eye(2))  # y/z rows intact
        np.testing.assert_allclose(
            np.linalg.det(r[:, :3, :3]), 1.0, atol=1e-5
        )


class TestChunkDataset:
    def test_iterate_and_batch(self, tmp_path):
        train_dir = tmp_path / "train"
        train_dir.mkdir()
        make_chunk(train_dir / "000000.torch", seed=0)
        make_chunk(train_dir / "000001.torch", seed=1)

        cfg = DatasetCfg(
            roots=[tmp_path], image_shape=(64, 64),
            original_image_shape=(72, 128),
        )
        sampler = BoundedViewSampler(BoundedSamplerCfg(
            num_target_views=2,
            min_distance_between_context_views=10,
            max_distance_between_context_views=20,
        ))
        ds = ChunkDataset(cfg, sampler, stage="train", seed=0)
        examples = []
        for ex in ds.examples(global_step=0):
            examples.append(ex)
            if len(examples) == 2:
                break
        assert len(examples) == 2
        v = examples[0]["context"]["image"].shape[0]
        assert 2 <= v <= 4  # union of 2 context + 2 targets
        assert examples[0]["context"]["image"].shape[1:] == (64, 64, 3)
        # union trick: context == target indices
        np.testing.assert_array_equal(
            examples[0]["context"]["index"], examples[0]["target"]["index"]
        )

        # batching requires equal view counts; filter to same v
        same = [e for e in examples if e["context"]["image"].shape[0] == v]
        batch = batch_examples(same)
        assert batch["context"]["image"].shape[1:] == (v, 64, 64, 3)

    def test_parallel_pipeline_matches_synchronous(self, tmp_path):
        """ExamplePipeline yields byte-identical examples in the same order
        as the synchronous path (determinism is worker-count independent)."""
        from pf3plat_tpu.data.prefetch import ExamplePipeline

        train_dir = tmp_path / "train"
        train_dir.mkdir()
        make_chunk(train_dir / "000000.torch", seed=0)
        make_chunk(train_dir / "000001.torch", seed=1)
        cfg = DatasetCfg(
            roots=[tmp_path], image_shape=(64, 64),
            original_image_shape=(72, 128),
        )

        def make_ds():
            sampler = BoundedViewSampler(BoundedSamplerCfg(
                num_target_views=2,
                min_distance_between_context_views=10,
                max_distance_between_context_views=20,
            ))
            return ChunkDataset(cfg, sampler, stage="train", seed=3)

        sync = list(make_ds().examples(global_step=0))
        with ExamplePipeline(
            make_ds(), lambda: 0, num_workers=4, prefetch=3
        ) as pipe:
            par = list(pipe)
        assert len(sync) == len(par) > 0
        for a, b in zip(sync, par):
            assert a["scene"] == b["scene"]
            np.testing.assert_array_equal(
                a["context"]["index"], b["context"]["index"]
            )
            np.testing.assert_array_equal(
                a["context"]["image"], b["context"]["image"]
            )
            np.testing.assert_allclose(
                a["context"]["extrinsics"], b["context"]["extrinsics"]
            )

    def test_host_sharding_partitions_chunks(self, tmp_path):
        train_dir = tmp_path / "train"
        train_dir.mkdir()
        for i in range(4):
            make_chunk(train_dir / f"{i:06}.torch", n_scenes=1, seed=i)
        cfg = DatasetCfg(roots=[tmp_path], image_shape=(64, 64),
                         original_image_shape=(72, 128))
        s = AllViewSampler()
        d0 = ChunkDataset(cfg, s, stage="train", host_id=0, num_hosts=2)
        d1 = ChunkDataset(cfg, s, stage="train", host_id=1, num_hosts=2)
        assert len(d0.chunks) == 2 and len(d1.chunks) == 2
        assert set(d0.chunks).isdisjoint(d1.chunks)


class TestOverfitAndWarmstart:
    def test_overfit_to_scene(self, tmp_path):
        train_dir = tmp_path / "train"
        train_dir.mkdir()
        make_chunk(train_dir / "000000.torch", n_scenes=3, seed=0)
        cfg = DatasetCfg(
            roots=[tmp_path], image_shape=(64, 64),
            original_image_shape=(72, 128),
            overfit_to_scene="scene_1_0",
        )
        sampler = BoundedViewSampler(BoundedSamplerCfg(
            num_target_views=2,
            min_distance_between_context_views=10,
            max_distance_between_context_views=20,
        ))
        ds = ChunkDataset(cfg, sampler, stage="train", seed=0)
        scenes = {ex["scene"] for ex in ds.examples(global_step=0)}
        assert scenes == {"scene_1_0"}
