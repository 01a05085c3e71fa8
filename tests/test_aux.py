"""Aux subsystem tests: trajectories, PLY export, overlap, panels, logging,
benchmarker, metric computer."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pf3plat_tpu.geometry.epipolar import view_overlap
from pf3plat_tpu.models.types import Gaussians
from pf3plat_tpu.utils.benchmarker import Benchmarker
from pf3plat_tpu.utils.logging import LocalLogger
from pf3plat_tpu.utils.ply_export import export_ply
from pf3plat_tpu.visualization.layout import (
    apply_depth_color_map,
    hcat,
    vcat,
)
from pf3plat_tpu.visualization.trajectories import (
    generate_spin,
    generate_wobble,
    interpolate_extrinsics,
    slerp,
)
from pf3plat_tpu.visualization.validation import (
    comparison_panel,
    project_gaussians_topdown,
)


class TestTrajectories:
    def test_interpolation_endpoints(self):
        rng = np.random.default_rng(0)
        a = np.eye(4, dtype=np.float32)
        b = np.eye(4, dtype=np.float32)
        b[:3, 3] = [1, 2, 3]
        c, s = np.cos(0.5), np.sin(0.5)
        b[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        traj = interpolate_extrinsics(jnp.asarray(a), jnp.asarray(b), jnp.linspace(0, 1, 5))
        np.testing.assert_allclose(np.asarray(traj[0]), a, atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj[-1]), b, atol=1e-5)
        # All intermediate matrices are rigid.
        dets = np.linalg.det(np.asarray(traj[:, :3, :3]))
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)

    def test_slerp_halfway(self):
        q0 = jnp.asarray([1.0, 0, 0, 0])
        q1 = jnp.asarray([0.0, 1.0, 0, 0])
        q = slerp(q0, q1, jnp.asarray(0.5))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-6)
        np.testing.assert_allclose(q[0], q[1], atol=1e-6)

    def test_wobble_returns_to_start(self):
        e = jnp.eye(4)
        t = jnp.asarray([0.0, 1.0])
        traj = generate_wobble(e, jnp.asarray(0.5), t)
        # t=0: radius scaled to 0 -> identity-ish translation.
        np.testing.assert_allclose(np.asarray(traj[0, :3, 3]), 0.0, atol=1e-6)

    def test_spin_orbit(self):
        traj = generate_spin(8, elevation=20.0, radius=2.0)
        assert traj.shape == (8, 4, 4)
        centers = np.asarray(traj[:, :3, 3])
        np.testing.assert_allclose(
            np.linalg.norm(centers, axis=-1), 2.0, atol=1e-4
        )


class TestPly:
    def test_export_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        g = 100
        path = tmp_path / "out.ply"
        export_ply(
            np.eye(4, dtype=np.float32),
            rng.standard_normal((g, 3)).astype(np.float32),
            rng.uniform(0.01, 0.1, (g, 3)).astype(np.float32),
            np.tile([0, 0, 0, 1.0], (g, 1)).astype(np.float32),
            rng.standard_normal((g, 3, 25)).astype(np.float32),
            rng.uniform(0, 1, g).astype(np.float32),
            path,
        )
        raw = path.read_bytes()
        header, _, body = raw.partition(b"end_header\n")
        assert b"element vertex 100" in header
        n_props = header.count(b"property float")
        data = np.frombuffer(body, "<f4").reshape(g, n_props)
        assert np.isfinite(data).all()


class TestOverlap:
    def test_identical_views_full_overlap(self):
        e = jnp.eye(4)
        k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
        ov = view_overlap(e, k, e, k)
        assert float(ov) > 0.99

    def test_opposite_views_no_overlap(self):
        e1 = jnp.eye(4)
        e2 = jnp.eye(4).at[:3, :3].set(
            jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
        )
        k = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]])
        ov = view_overlap(e1, k, e2, k)
        assert float(ov) < 0.05


class TestVisualization:
    def test_layout(self):
        a = np.zeros((8, 8, 3))
        b = np.ones((8, 12, 3))
        assert hcat(a, b).shape[1] >= 20
        assert vcat(a, b).shape[0] >= 16
        d = apply_depth_color_map(np.full((4, 4), 2.0))
        assert d.shape == (4, 4, 3)

    def test_comparison_panel(self, tmp_path):
        rng = np.random.default_rng(2)
        panel = comparison_panel(
            rng.uniform(0, 1, (2, 16, 16, 3)),
            rng.uniform(0, 1, (3, 16, 16, 3)),
            rng.uniform(0, 1, (3, 16, 16, 3)),
            depth=rng.uniform(1, 5, (2, 16, 16)),
            path=tmp_path / "panel.png",
        )
        assert (tmp_path / "panel.png").exists()
        assert panel.ndim == 3

    @pytest.mark.slow
    def test_topdown_projection(self):
        rng = np.random.default_rng(3)
        g = 64
        gauss = Gaussians(
            jnp.asarray(rng.standard_normal((1, g, 3)), jnp.float32),
            jnp.broadcast_to(jnp.eye(3) * 1e-3, (1, g, 3, 3)),
            jnp.asarray(rng.standard_normal((1, g, 3, 1)), jnp.float32),
            jnp.full((1, g), 0.8),
        )
        img = project_gaussians_topdown(gauss, resolution=64)
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()


class TestLoggingAndBench:
    def test_local_logger(self, tmp_path):
        log = LocalLogger(tmp_path)
        log.log_scalars(1, {"loss": 0.5})
        log.log_scalars(2, {"loss": jnp.asarray(0.25)})
        log.log_image("pred", 1, np.zeros((4, 4, 3)))
        log.close()
        lines = (tmp_path / "scalars.jsonl").read_text().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[1])["loss"] == 0.25
        assert (tmp_path / "images" / "pred" / "000001.png").exists()

    def test_benchmarker(self, tmp_path):
        b = Benchmarker(skip_first=1)
        for _ in range(3):
            with b.time("op"):
                jnp.ones((8, 8)).sum()
        b.dump(tmp_path / "bench.json")
        b.dump_memory(tmp_path / "mem.json")
        data = json.loads((tmp_path / "bench.json").read_text())
        assert data["op"]["count"] == 2

    def test_metric_computer(self, tmp_path):
        from PIL import Image

        from pf3plat_tpu.evaluation.metric_computer import compute_metrics

        rng = np.random.default_rng(4)
        (tmp_path / "gt").mkdir()
        (tmp_path / "m1").mkdir()
        for i in range(2):
            img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "gt" / f"{i}.png")
            Image.fromarray(img).save(tmp_path / "m1" / f"{i}.png")
        res = compute_metrics(tmp_path / "gt", {"m1": tmp_path / "m1"})
        assert res["m1"]["count"] == 2
        assert res["m1"]["psnr"] > 50  # identical images


class TestProfiling:
    def test_trace_and_breakdown(self, tmp_path):
        from pf3plat_tpu.utils import profiling

        f = jax.jit(lambda x: (x @ x).sum())
        x = jnp.ones((256, 256))
        f(x)  # compile outside the trace
        with profiling.trace(tmp_path):
            r = f(x)
            np.asarray(r)
        rows = profiling.device_op_breakdown(tmp_path)
        assert rows, "trace produced no duration events"
        assert all(r["total_us"] >= 0 for r in rows)
        table = profiling.format_breakdown(rows, top=5)
        assert "name" in table.splitlines()[0]

    def test_raster_traffic_model(self):
        from pf3plat_tpu.ops.rasterizer import RasterizeConfig
        from pf3plat_tpu.utils.profiling import raster_traffic_model

        m = raster_traffic_model(RasterizeConfig(), (256, 256), 2, 2 * 256**2)
        d = m.as_dict()
        assert d["total_bytes"] == sum(
            d[k] for k in ("sort_bytes", "gather_bytes", "kernel_fwd_bytes",
                           "kernel_bwd_bytes", "scatter_bytes")
        )
        assert m.rays == 2 * 256**2
        assert m.roofline_ms() > 0
        # exact 2-key sort moves more bytes than the fused single key
        m2 = raster_traffic_model(
            RasterizeConfig(fused_sort_key=False), (256, 256), 2, 2 * 256**2
        )
        assert m2.sort_bytes > m.sort_bytes


class TestEncoderVis:
    def test_gaussians_panel(self, tmp_path):
        from pf3plat_tpu.visualization.encoder_vis import gaussians_panel

        rng = np.random.default_rng(0)
        v, h, w = 2, 16, 24
        g = v * h * w
        panel = gaussians_panel(
            rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32),
            rng.uniform(0, 1, (g,)).astype(np.float32),
            np.broadcast_to(np.eye(3) * 1e-4, (g, 3, 3)).astype(np.float32),
            rng.uniform(0, 1, (g, 3)).astype(np.float32),
            path=tmp_path / "gauss.png",
        )
        assert panel.ndim == 3 and panel.shape[-1] == 3
        assert (tmp_path / "gauss.png").exists()
        assert np.isfinite(panel).all()

    def test_matches_panel(self, tmp_path):
        from pf3plat_tpu.visualization.encoder_vis import matches_panel

        rng = np.random.default_rng(1)
        v, h, w, m = 3, 20, 30, 8
        pairs = [(0, 1), (1, 2), (0, 2)]
        pi = np.array([p[0] for p in pairs])
        pj = np.array([p[1] for p in pairs])
        panel = matches_panel(
            rng.uniform(0, 1, (v, h, w, 3)).astype(np.float32),
            rng.uniform(0, [w - 1, h - 1], (len(pairs), m, 2)),
            rng.uniform(0, [w - 1, h - 1], (len(pairs), m, 2)),
            rng.uniform(0, 1, (len(pairs), m)).astype(np.float32),
            np.ones((len(pairs), m), bool),
            pi, pj,
            path=tmp_path / "matches.png",
        )
        assert panel.ndim == 3
        assert (tmp_path / "matches.png").exists()


class TestIndexGenerator:
    def _scenes(self, n=60):
        extr = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
        extr[:, 0, 3] = 0.01 * np.arange(n)
        intr = np.broadcast_to(
            np.array([[0.9, 0, 0.5], [0, 1.6, 0.5], [0, 0, 1.0]],
                     np.float32), (n, 3, 3)).copy()
        return extr, intr

    def test_generate_index_valid_and_null(self, tmp_path):
        from pf3plat_tpu.evaluation.index_generator import (
            IndexGeneratorCfg, generate_index,
        )

        extr, intr = self._scenes()
        # accept-anything window -> valid entry with correct shapes
        cfg = IndexGeneratorCfg(
            min_overlap=0.0, max_overlap=1.0,
            output_path=tmp_path / "idx.json",
        )
        idx = generate_index(cfg, {"a": (extr, intr)}, seed=0)
        assert idx["a"] is not None
        assert len(idx["a"]["context"]) == 2
        assert len(idx["a"]["target"]) == cfg.num_target_views
        lo, hi = idx["a"]["context"]
        assert all(lo <= t <= hi for t in idx["a"]["target"])
        # impossible window -> null entry (reference emits null scenes)
        cfg2 = IndexGeneratorCfg(
            min_overlap=1.5, max_overlap=2.0,
            min_distance=55, output_path=tmp_path / "idx2.json",
        )
        idx2 = generate_index(cfg2, {"a": (extr, intr)}, seed=0)
        assert idx2["a"] is None

    def test_cli_roundtrip(self, tmp_path, capsys):
        import sys
        sys.path.insert(0, "tests")
        from test_data import make_chunk

        from pf3plat_tpu.evaluation.index_generator import main as gen_main

        (tmp_path / "test").mkdir()
        make_chunk(tmp_path / "test" / "000000.torch", n_scenes=1,
                   n_frames=30, seed=7)
        gen_main([str(tmp_path), "--out", str(tmp_path / "i.json")])
        data = json.loads((tmp_path / "i.json").read_text())
        assert len(data) == 1


@pytest.mark.slow
class TestBenchScript:
    def test_bench_runs_reduced_scale(self, capsys):
        """bench.py is the driver's round-end metric of record — protect it
        from API drift by running it end-to-end at reduced scale on CPU."""
        import importlib.util
        import os

        os.environ["PF3PLAT_BENCH_SIDE"] = "48"
        try:
            spec = importlib.util.spec_from_file_location(
                "bench", Path(__file__).resolve().parent.parent / "bench.py"
            )
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)
            m.main()
        finally:
            del os.environ["PF3PLAT_BENCH_SIDE"]
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        assert rec["unit"] == "Mrays/s/chip"
        assert rec["value"] > 0
