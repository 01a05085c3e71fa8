"""Streamed-pipeline rasterizer tests: oracle parity (values AND gradients)
against the bruteforce/pallas impls, odd shapes, empty scenes.

The streamed impl (ops/rasterizer/streamed.py) carries features through the
binning sort and composites straight out of the sorted array with in-kernel
DMAs; these tests pin it to the same capacity/order semantics as the default
pipeline (reference behavior: CUDA `diff-gaussian-rasterization`, SURVEY
§2.3 row 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.ops.rasterizer import RasterizeConfig, render, render_depth

from test_rasterizer import make_scene

# streamed requires chunk == 128 (DMA window granularity)
CFG = RasterizeConfig(tile_size=16, tile_capacity=256, chunk=128)


class TestStreamedParity:
    @pytest.mark.parametrize(
        "shape,n,b",
        [
            ((32, 32), 96, 2),
            ((24, 40), 64, 1),
            # biggest shape: slow tier (same code path as the two above)
            pytest.param((64, 64), 160, 2, marks=pytest.mark.slow),
        ],
    )
    def test_matches_bruteforce(self, shape, n, b):
        rng = np.random.default_rng(n + shape[0])
        scene = make_scene(rng, n=n, b=b)
        ref = render(**scene, image_shape=shape, impl="bruteforce", config=CFG)
        img = render(**scene, image_shape=shape, impl="streamed", config=CFG)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref), atol=1e-5, rtol=1e-4
        )

    def test_gradients_match_pallas(self):
        rng = np.random.default_rng(7)
        scene = make_scene(rng, n=80, b=2)
        tgt = jnp.asarray(
            rng.uniform(0, 1, (2, 32, 48, 3)), jnp.float32
        )

        def loss(means, cov, sh, opac, impl):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 48), scene["background"],
                means, cov, sh, opac, impl=impl, config=CFG,
            )
            return jnp.mean((img - tgt) ** 2)

        args = (
            scene["means"], scene["covariances"], scene["sh"],
            scene["opacities"],
        )
        g_p = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "pallas")
        g_s = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "streamed")
        for a, b_, name in zip(g_p, g_s, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-7,
                err_msg=f"grad {name}",
            )

    @pytest.mark.slow
    def test_background_gradient_matches_pallas(self):
        """jax.grad w.r.t. background must work (bg is threaded through the
        custom_vjp explicitly) and match the dense-table path."""
        rng = np.random.default_rng(17)
        scene = make_scene(rng, n=48, b=2)
        tgt = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)

        def loss(bg, impl):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), bg,
                scene["means"], scene["covariances"], scene["sh"],
                scene["opacities"], impl=impl, config=CFG,
            )
            return jnp.mean((img - tgt) ** 2)

        bg = jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32)
        g_p = jax.grad(loss)(bg, "pallas")
        g_s = jax.grad(loss)(bg, "streamed")
        assert bool(jnp.any(g_p != 0.0))
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_p), rtol=1e-4, atol=1e-7
        )

    def test_rejects_unaligned_tile_capacity(self):
        rng = np.random.default_rng(19)
        scene = make_scene(rng, n=16, b=1)
        cfg = RasterizeConfig(tile_size=16, tile_capacity=200, chunk=128)
        with pytest.raises(ValueError, match="multiple"):
            render(**scene, image_shape=(32, 32), impl="streamed", config=cfg)

    def test_exact_two_key_sort_variant(self):
        rng = np.random.default_rng(11)
        scene = make_scene(rng, n=64, b=1)
        cfg = RasterizeConfig(
            tile_size=16, tile_capacity=256, chunk=128, fused_sort_key=False
        )
        ref = render(**scene, image_shape=(32, 32), impl="bruteforce", config=cfg)
        img = render(**scene, image_shape=(32, 32), impl="streamed", config=cfg)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref), atol=1e-5, rtol=1e-4
        )

    @pytest.mark.slow
    def test_fully_culled_scene(self):
        """All gaussians behind the camera: background image, finite zero
        gradients (matches the pallas-path test in test_rasterizer)."""
        rng = np.random.default_rng(3)
        scene = make_scene(rng, n=32, b=1)
        means = np.asarray(scene["means"]).copy()
        means[..., 2] = -5.0
        bg = jnp.full((1, 3), 0.25, jnp.float32)

        def loss(m):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), bg,
                m, scene["covariances"], scene["sh"], scene["opacities"],
                impl="streamed", config=CFG,
            )
            return jnp.sum(img**2), img

        (l, img), g = jax.value_and_grad(loss, has_aux=True)(
            jnp.asarray(means, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(img), 0.25, atol=1e-6)
        assert bool(jnp.all(jnp.isfinite(g)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_depth_rendering(self):
        rng = np.random.default_rng(5)
        scene = make_scene(rng, n=48, b=1)
        kw = dict(
            extrinsics=scene["extrinsics"], intrinsics=scene["intrinsics"],
            near=scene["near"], far=scene["far"], image_shape=(32, 32),
            means=scene["means"], covariances=scene["covariances"],
            opacities=scene["opacities"],
        )
        ref = render_depth(**kw, impl="pallas", config=CFG)
        out = render_depth(**kw, impl="streamed", config=CFG)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4
        )

    @pytest.mark.slow
    def test_capacity_truncation_matches_pallas(self):
        """Tiny capacity forces truncation: streamed must truncate the same
        front-to-back prefix as the dense-table path."""
        rng = np.random.default_rng(13)
        scene = make_scene(rng, n=400, b=1, spread=0.3)  # dense center
        cfg = RasterizeConfig(tile_size=16, tile_capacity=128, chunk=128)
        a = render(**scene, image_shape=(32, 32), impl="pallas", config=cfg)
        s = render(**scene, image_shape=(32, 32), impl="streamed", config=cfg)
        # Same truncated prefix; the chunk-window offset shifts the
        # triangular-matmul partitioning, so f32 reassociation differs.
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(a), atol=1e-4
        )


class TestChunksPerIter:
    """`chunks_per_iter` unrolls E chunks per kernel loop iteration to
    amortize the ~1 us/chunk loop machinery (round-4 trace). Images and
    gradients must be BIT-EQUAL across E: overshoot chunks past the
    early-exit/segment end contribute exactly-masked zeros."""

    @pytest.mark.parametrize(
        "e", [2, pytest.param(4, marks=pytest.mark.slow)]
    )
    def test_bit_equal_across_unroll(self, e):
        rng = np.random.default_rng(23)
        scene = make_scene(rng, n=160, b=2)
        tgt = jnp.asarray(rng.uniform(0, 1, (2, 48, 32, 3)), jnp.float32)

        def run(cfg):
            def loss(means, cov, sh, opac):
                img = render(
                    scene["extrinsics"], scene["intrinsics"],
                    scene["near"], scene["far"], (48, 32),
                    scene["background"], means, cov, sh, opac,
                    impl="streamed", config=cfg,
                )
                return jnp.mean((img - tgt) ** 2), img

            (_, img), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                             has_aux=True)(
                scene["means"], scene["covariances"], scene["sh"],
                scene["opacities"],
            )
            return img, g

        import dataclasses

        # tile_capacity=256, chunk=128 -> n_chunks=3: odd, so every E>1
        # exercises the partial tail group.
        img1, g1 = run(dataclasses.replace(CFG, chunks_per_iter=1))
        imgE, gE = run(dataclasses.replace(CFG, chunks_per_iter=e))
        np.testing.assert_array_equal(np.asarray(imgE), np.asarray(img1))
        for a, b_, name in zip(g1, gE, ["means", "cov", "sh", "opac"]):
            np.testing.assert_array_equal(
                np.asarray(b_), np.asarray(a), err_msg=f"grad {name}"
            )
