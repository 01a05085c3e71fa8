"""Evaluation harness: the reference's test protocol as a pure function loop.

Mirrors `ModelWrapper.test_step` / `on_test_end`
(`src/model/model_wrapper.py:243-414`):

  * target views are spliced INTO the context stack (context = (ctx_0,
    targets..., ctx_n), `model_wrapper.py:251-256`) — the pose-free model
    must localize them;
  * encoder/decoder wall-clock is benchmarked with warmup skipping;
  * PSNR/SSIM/LPIPS per target view + pose errors (rotation geodesic,
    translation norm/angle) for the first->last context pair;
  * scenes are bucketed by overlap: small < 0.5 <= medium <= 0.75 < large
    (`model_wrapper.py:360-369`);
  * results stream to `metrics.txt`; aggregates to `scores_all_avg.json`,
    `benchmark.json`, `peak_memory.json`.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.transforms import geodesic_distance, translation_angle
from ..training.metrics import compute_psnr, compute_ssim
from ..utils.benchmarker import Benchmarker


@dataclasses.dataclass
class EvalCfg:
    output_path: Path = Path("outputs/test")
    eval_time_skip_steps: int = 5
    save_image: bool = True
    compute_scores: bool = True
    # Render wobble + interpolated-trajectory videos per example
    # (reference `model_wrapper.py:698-778` test-time video rendering).
    save_video: bool = False
    video_frames: int = 30
    # Depth rendering mode for the saved depth panels ("depth", "disparity",
    # "relative_disparity", "log"); None skips the depth render entirely.
    # Mirrors the reference's test-time depth splatting
    # (`model_wrapper.py:269-278`, `cuda_splatting.py:223-269`).
    depth_mode: Optional[str] = "depth"


def overlap_bucket(overlap: Optional[float]) -> str:
    if overlap is None:
        return "all"
    if overlap < 0.5:
        return "small"
    if overlap <= 0.75:
        return "medium"
    return "large"


class Evaluator:
    def __init__(self, cfg: EvalCfg, model, params, lpips_apply=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.lpips_apply = lpips_apply
        self.benchmarker = Benchmarker(skip_first=cfg.eval_time_skip_steps)
        self.records: list[dict] = []
        cfg.output_path.mkdir(parents=True, exist_ok=True)
        self._metrics_file = (cfg.output_path / "metrics.txt").open("a")
        self._video_decode = None  # jitted chunk decoder, built lazily

        self._forward = jax.jit(
            lambda p, images, intr, near, far, rng: model.forward(
                p, images, intr, near, far, jnp.asarray(0), rng,
                depth_mode=cfg.depth_mode if cfg.save_image else None,
            )
        )

    def run_example(self, example: dict, rng, step_idx: int) -> dict:
        """example: batched (b=1) dict with spliced context==target stacks,
        ground-truth extrinsics, and optional 'overlap'."""
        ctx = example["context"]
        images = jnp.asarray(ctx["image"])
        intr = jnp.asarray(ctx["intrinsics"])
        near = jnp.asarray(ctx["near"])
        far = jnp.asarray(ctx["far"])

        with self.benchmarker.time("encoder_decoder") as _:
            enc, out = self._forward(self.params, images, intr, near, far, rng)
            jax.tree_util.tree_leaves(out.color)[0].block_until_ready()
        np.asarray(out.color).ravel()[:1]  # force sync (relay backends)

        record: dict = {"scene": example.get("scene", ["?"])[0]}

        if self.cfg.compute_scores:
            gt = images[:, 1:-1] if images.shape[1] > 2 else images
            pred = out.color[:, 1:-1] if images.shape[1] > 2 else out.color
            b, v, h, w, c = gt.shape
            gt_f = gt.reshape(b * v, h, w, c)
            pr_f = pred.reshape(b * v, h, w, c)
            record["psnr"] = float(compute_psnr(gt_f, pr_f).mean())
            record["ssim"] = float(compute_ssim(gt_f, pr_f).mean())
            if self.lpips_apply is not None:
                record["lpips"] = float(self.lpips_apply(gt_f, pr_f).mean())

            if "extrinsics" in ctx:
                gt_c2w = jnp.asarray(ctx["extrinsics"])
                pred_c2w = jnp.linalg.inv(enc.refined_poses)
                rel_p = jnp.einsum(
                    "bij,bjk->bik",
                    jnp.linalg.inv(pred_c2w[:, -1]), pred_c2w[:, 0],
                )
                rel_g = jnp.einsum(
                    "bij,bjk->bik",
                    jnp.linalg.inv(gt_c2w[:, -1]), gt_c2w[:, 0],
                )
                record["rot_deg"] = float(
                    jnp.degrees(
                        geodesic_distance(rel_p[:, :3, :3], rel_g[:, :3, :3])
                    ).mean()
                )
                record["trans_angle_deg"] = float(
                    jnp.degrees(
                        translation_angle(rel_p[:, :3, 3], rel_g[:, :3, 3])
                    ).mean()
                )
                record["trans_norm"] = float(
                    jnp.linalg.norm(
                        rel_p[:, :3, 3] - rel_g[:, :3, 3], axis=-1
                    ).mean()
                )

        record["bucket"] = overlap_bucket(example.get("overlap"))
        self.records.append(record)
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()

        if self.cfg.save_image:
            from ..visualization.layout import (
                apply_depth_color_map, save_image,
            )

            # Per-method directory layout (matching filenames across gt/pred
            # so `metric_computer.compute_metrics` can re-score offline;
            # reference saves color/gt dirs per scene, model_wrapper.py:287-298).
            tgt_slice = slice(1, -1) if images.shape[1] > 2 else slice(None)
            gt_views = np.asarray(images[0, tgt_slice])
            pred_views = np.asarray(out.color[0, tgt_slice])
            for vi in range(pred_views.shape[0]):
                stem = f"{step_idx:06}_{vi}"
                save_image(
                    pred_views[vi],
                    self.cfg.output_path / "images" / "pred" / f"{stem}.png",
                )
                save_image(
                    gt_views[vi],
                    self.cfg.output_path / "images" / "gt" / f"{stem}.png",
                )
            # Side-by-side panel + rendered depth of the middle target view.
            from ..visualization.layout import hcat, vcat

            panel = vcat(hcat(*gt_views), hcat(*pred_views))
            save_image(
                panel, self.cfg.output_path / "compare" / f"{step_idx:06}.png"
            )
            if out.depth is not None:
                mid = pred_views.shape[0] // 2
                d = np.asarray(out.depth[0, tgt_slice][mid])
                save_image(
                    apply_depth_color_map(d),
                    self.cfg.output_path / "depth" / f"{step_idx:06}.png",
                )

        if self.cfg.save_video:
            self._render_videos(enc, intr, near, far, step_idx)
        return record

    def _render_videos(self, enc, intr, near, far, step_idx: int) -> None:
        """Wobble + interpolated trajectory videos through the decoder
        (reference `render_video_wobble`/`render_video_interpolation`,
        `model_wrapper.py:698-778`)."""
        from ..models.decoder import decode
        from ..visualization.layout import save_video
        from ..visualization.trajectories import (
            generate_wobble, interpolate_extrinsics,
        )

        c2w = jnp.linalg.inv(enc.refined_poses)[0]  # (v, 4, 4)
        t = jnp.linspace(0.0, 1.0, self.cfg.video_frames)
        delta = 0.25 * jnp.linalg.norm(c2w[-1, :3, 3] - c2w[0, :3, 3])
        trajs = {
            "wobble": generate_wobble(c2w[0], delta, t),
            "interpolation": interpolate_extrinsics(c2w[0], c2w[-1], t),
        }
        # One jitted fixed-shape 6-frame chunk decode, reused across chunks,
        # trajectories, and examples (eager decode over a relay backend costs
        # one round-trip per primitive; odd tails are padded to keep the
        # shape cacheable).
        f = 6
        if self._video_decode is None:
            dec_cfg = self.model.cfg.decoder
            shape = tuple(enc.depths.shape[2:4])
            self._video_decode = jax.jit(
                lambda g, traj, k, nr, fr: decode(
                    dec_cfg, g, traj, k, nr, fr, shape
                ).color
            )
        intr_f = jnp.broadcast_to(intr[:, :1], (1, f, 3, 3))
        near_f = jnp.broadcast_to(near[:, :1], (1, f))
        far_f = jnp.broadcast_to(far[:, :1], (1, f))
        for name, traj in trajs.items():
            pad = (-traj.shape[0]) % f
            if pad:
                traj = jnp.concatenate([traj, traj[-1:].repeat(pad, 0)], 0)
            frames = []
            for s in range(0, traj.shape[0], f):
                color = self._video_decode(
                    enc.gaussians, traj[s : s + f][None], intr_f, near_f, far_f
                )
                frames += [np.asarray(img) for img in color[0]]
            save_video(
                frames[: self.cfg.video_frames],
                self.cfg.output_path / "video" / f"{step_idx:06}_{name}.mp4",
            )

    def finalize(self) -> dict:
        buckets: dict[str, list[dict]] = {}
        for r in self.records:
            if r["bucket"] != "all":
                buckets.setdefault(r["bucket"], []).append(r)
            buckets.setdefault("all", []).append(r)
        summary = {}
        for bucket, rs in buckets.items():
            agg = {}
            for key in ("psnr", "ssim", "lpips", "rot_deg", "trans_angle_deg",
                        "trans_norm"):
                vals = [r[key] for r in rs if key in r]
                if vals:
                    agg[key] = float(np.mean(vals))
                    if key == "rot_deg":
                        agg["rot_deg_median"] = float(np.median(vals))
            pose_errs = [
                max(r["rot_deg"], r["trans_angle_deg"])
                for r in rs
                if "rot_deg" in r and "trans_angle_deg" in r
            ]
            if pose_errs:
                from ..training.metrics import pose_auc

                agg.update(pose_auc(pose_errs))
            agg["count"] = len(rs)
            summary[bucket] = agg
        (self.cfg.output_path / "scores_all_avg.json").write_text(
            json.dumps(summary, indent=2)
        )
        self.benchmarker.dump(self.cfg.output_path / "benchmark.json")
        self.benchmarker.dump_memory(self.cfg.output_path / "peak_memory.json")
        self._metrics_file.close()
        return summary
