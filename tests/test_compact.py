"""Pair-compaction tests (ops/rasterizer/compact.py).

Pins the compacted streamed pipeline BIT-EQUAL to the uncompacted one
whenever the budget covers the real pairs (compaction only removes rows
the sorts would have placed after every real row), unit-tests the
log-shift compaction kernel against a numpy oracle, and defines the
budget-overflow behavior (deterministic tail truncation at write-window
granularity, finite gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.ops.rasterizer import RasterizeConfig, render
from pf3plat_tpu.ops.rasterizer.binning import tile_bounds, _INT32_MAX
from pf3plat_tpu.ops.rasterizer.compact import (
    banded_dup_reduce,
    compact_pairs,
    pairs_budget,
)
from pf3plat_tpu.ops.rasterizer.project import make_camera, project_gaussians

from test_rasterizer import make_scene


def _cfg(**kw):
    base = dict(
        tile_size=16, tile_capacity=256, chunk=128,
        pairs_budget_factor=1.0, compact_window=512,
        compact_min_pairs=0,  # tests exercise compaction at any size
        # These tests pin the compaction KERNEL's mechanics against numpy
        # enumerations of the exact AABB candidate rule; the tight cull
        # has its own parity tests (test_rasterizer.py::TestTightCull).
        tight_cull=False,
    )
    base.update(kw)
    return RasterizeConfig(**base)


def _project(scene, shape, cfg):
    cam = make_camera(scene["extrinsics"], scene["intrinsics"], shape)
    return jax.vmap(
        lambda c, m, cv, o, s: project_gaussians(c, m, cv, o, s, 4, cfg)
    )(
        cam, scene["means"], scene["covariances"], scene["opacities"],
        scene["sh"],
    )


class TestCompactKernel:
    def test_compacted_candidates_match_numpy(self):
        """Every surviving row's (tile, dkey, id) must equal the numpy
        enumeration of valid candidates in slot-major order."""
        rng = np.random.default_rng(21)
        scene = make_scene(rng, n=200, b=2)
        shape = (48, 64)
        cfg = _cfg()
        screen = _project(scene, shape, cfg)
        cp = jax.jit(
            lambda s: compact_pairs(s, shape, cfg)
        )(screen)
        written, total = int(cp["written"]), int(cp["total"])
        assert written == total  # factor 1.0 never overflows

        bounds = tile_bounds(screen, shape, cfg)
        tw, th = np.asarray(bounds.tw), np.asarray(bounds.th)
        tx0, ty0 = np.asarray(bounds.tx0), np.asarray(bounds.ty0)
        side, md = cfg.max_tiles_per_gaussian_side, cfg.max_dup
        tiles_x = -(-shape[1] // 16)
        num_tiles = tiles_x * (-(-shape[0] // 16))
        b, n = tw.shape
        exp = []
        for s in range(md):
            dy, dx = s // side, s % side
            for bi in range(b):
                for g in range(n):
                    if dx < tw[bi, g] and dy < th[bi, g]:
                        t = (
                            (ty0[bi, g] + dy) * tiles_x
                            + tx0[bi, g] + dx + bi * num_tiles
                        )
                        exp.append(((bi * n + g) * md + s, t))
        assert len(exp) == total
        ids = np.asarray(cp["ids"])[:written]
        tiles = np.asarray(cp["tile"])[:written]
        np.testing.assert_array_equal(ids, [e[0] for e in exp])
        np.testing.assert_array_equal(tiles, [e[1] for e in exp])
        # Pad rows sort last everywhere.
        assert (np.asarray(cp["ids"])[written:] == _INT32_MAX).all()
        assert (np.asarray(cp["tile"])[written:] == _INT32_MAX).all()

    def test_overflow_truncates_at_window_granularity(self):
        """With a too-small budget the kernel appends whole windows until
        the next no longer fits, then stops — written is the largest
        cursor reachable under that rule, and total still counts all."""
        rng = np.random.default_rng(22)
        scene = make_scene(rng, n=400, b=2)
        shape = (48, 64)
        c0 = 512
        cfg_full = _cfg(compact_window=c0)
        screen = _project(scene, shape, cfg_full)
        full = jax.jit(lambda s: compact_pairs(s, shape, cfg_full))(screen)
        total = int(full["total"])

        # Budget of one window: every step after the first that would
        # overflow is skipped; simulate the cursor walk in numpy.
        cfg_small = _cfg(
            compact_window=c0,
            pairs_budget_factor=c0 / (2 * 400 * cfg_full.max_dup),
        )
        budget = pairs_budget(cfg_small, 2, 400)
        small = jax.jit(lambda s: compact_pairs(s, shape, cfg_small))(screen)
        # Per-window valid counts, from the full run's candidate layout.
        bounds = tile_bounds(screen, shape, cfg_full)
        md = cfg_full.max_dup
        side = cfg_full.max_tiles_per_gaussian_side
        slot = np.arange(md)[:, None, None]
        in_box = (
            (slot // side < np.asarray(bounds.th)[None])
            & (slot % side < np.asarray(bounds.tw)[None])
        ).reshape(-1)
        pad = (-len(in_box)) % c0
        in_box = np.concatenate([in_box, np.zeros(pad, bool)])
        cur = 0
        for wdw in in_box.reshape(-1, c0):
            if cur + c0 <= budget:
                cur += int(wdw.sum())
        assert int(small["written"]) == cur
        assert int(small["total"]) == total
        ids_small = np.asarray(small["ids"])[:cur]
        ids_full = np.asarray(full["ids"])[:cur]
        np.testing.assert_array_equal(ids_small, ids_full)

    def test_banded_dup_reduce_matches_numpy(self):
        rng = np.random.default_rng(23)
        n_gauss, max_dup, budget = 700, 4, 1536
        cnt = rng.integers(0, max_dup + 1, n_gauss)
        rows = int(cnt.sum())
        assert rows <= budget
        # Ascending-pair-id layout: gaussian g owns `cnt[g]` rows.
        ids = np.concatenate(
            [g * max_dup + np.arange(c) for g, c in enumerate(cnt)]
        ).astype(np.int32)
        ids = np.concatenate(
            [ids, np.full(budget - rows, 2**31 - 1, np.int32)]
        )
        grads = np.zeros((16, budget), np.float32)
        grads[1:10, :rows] = rng.standard_normal((9, rows)).astype(np.float32)
        grads[0] = np.asarray(
            jax.lax.bitcast_convert_type(jnp.asarray(ids), jnp.float32)
        )
        out = jax.jit(
            lambda g, i: banded_dup_reduce(g, i, n_gauss, max_dup, g1=128)
        )(jnp.asarray(grads), jnp.asarray(ids))
        out = np.asarray(out)
        want = np.zeros((9, n_gauss), np.float32)
        pos = 0
        for g, c in enumerate(cnt):
            want[:, g] = grads[1:10, pos : pos + c].sum(axis=1)
            pos += c
        np.testing.assert_allclose(out[1:10], want, rtol=1e-6, atol=1e-6)


class TestCompactParity:
    # fast tier keeps the two diagonal combos; the cross terms are
    # the same code paths and run in the slow tier
    @pytest.mark.parametrize(
        "fused,tight",
        [
            (True, True),
            (False, False),
            pytest.param(True, False, marks=pytest.mark.slow),
            pytest.param(False, True, marks=pytest.mark.slow),
        ],
    )
    def test_bit_equal_to_uncompacted(self, fused, tight):
        rng = np.random.default_rng(31)
        scene = make_scene(rng, n=300, b=2)
        shape = (48, 64)
        tgt = jnp.asarray(
            rng.uniform(0, 1, (2,) + shape + (3,)), jnp.float32
        )
        cfg0 = _cfg(fused_sort_key=fused, pairs_budget_factor=0.0)
        if tight:
            # The smallest GUARANTEED-coverage budget: real pairs + one
            # window (a window is appended only while cursor + c0 <=
            # budget, so the worst case needs one window of headroom).
            screen = _project(scene, shape, cfg0)
            probe = jax.jit(
                lambda s: compact_pairs(s, shape, _cfg())["total"]
            )(screen)
            c0 = 512
            full = 2 * 300 * cfg0.max_dup
            factor = (-(-(int(probe) + c0) // c0) * c0) / full
        else:
            factor = 1.0
        cfgC = _cfg(fused_sort_key=fused, pairs_budget_factor=factor)

        def loss(means, cov, sh, opac, cfg):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"],
                means, cov, sh, opac, impl="streamed", config=cfg,
            )
            return jnp.mean((img - tgt) ** 2), img

        args = (
            scene["means"], scene["covariances"], scene["sh"],
            scene["opacities"],
        )
        (l0, img0), g0 = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(*args, cfg0)
        (lC, imgC), gC = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(*args, cfgC)
        np.testing.assert_array_equal(np.asarray(img0), np.asarray(imgC))
        assert float(l0) == float(lC)
        for a, b_, name in zip(g0, gC, ["means", "cov", "sh", "opac"]):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b_), err_msg=f"grad {name}"
            )

    @pytest.mark.slow
    def test_overflow_render_finite_and_truncated(self):
        """Budget overflow: still a valid render (finite image/grads);
        dropping pairs can only REMOVE compositing contributions."""
        rng = np.random.default_rng(33)
        scene = make_scene(rng, n=500, b=1, spread=0.3)
        shape = (32, 32)
        cfg = _cfg(compact_window=512, pairs_budget_factor=0.25)

        def loss(means):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"],
                means, scene["covariances"], scene["sh"],
                scene["opacities"], impl="streamed", config=cfg,
            )
            return jnp.sum(img ** 2), img

        (l, img), g = jax.value_and_grad(loss, has_aux=True)(scene["means"])
        assert bool(jnp.all(jnp.isfinite(img)))
        assert bool(jnp.all(jnp.isfinite(g)))

    @pytest.mark.slow
    def test_chunk_256_matches_chunk_128(self):
        """chunk=256 composites the same prefixes; only the triangular-
        matmul partitioning (f32 reassociation) differs."""
        rng = np.random.default_rng(41)
        scene = make_scene(rng, n=300, b=2)
        shape = (48, 64)

        def loss(m, cfg):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"], m,
                scene["covariances"], scene["sh"], scene["opacities"],
                impl="streamed", config=cfg,
            )
            return jnp.sum(img ** 2), img

        cfgs = [
            _cfg(tile_capacity=512, chunk=c, pairs_budget_factor=f)
            for c, f in [(128, 0.0), (256, 0.0), (256, 1.0)]
        ]
        outs = [
            jax.value_and_grad(lambda m: loss(m, cfg), has_aux=True)(
                scene["means"]
            )
            for cfg in cfgs
        ]
        (_, img0), g0 = outs[0]
        for (_, img), g in outs[1:]:
            np.testing.assert_allclose(
                np.asarray(img), np.asarray(img0), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(g0), rtol=1e-4, atol=1e-4
            )

    def test_depth_one_channel(self):
        """channels == 1 (depth splatting path) through compaction."""
        from pf3plat_tpu.ops.rasterizer import render_depth

        rng = np.random.default_rng(35)
        scene = make_scene(rng, n=64, b=1)
        kw = dict(
            extrinsics=scene["extrinsics"], intrinsics=scene["intrinsics"],
            near=scene["near"], far=scene["far"], image_shape=(32, 32),
            means=scene["means"], covariances=scene["covariances"],
            opacities=scene["opacities"],
        )
        ref = render_depth(**kw, impl="streamed", config=_cfg(
            pairs_budget_factor=0.0))
        out = render_depth(**kw, impl="streamed", config=_cfg())
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
