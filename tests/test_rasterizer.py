"""Rasterizer tests: analytic single-gaussian renders, bruteforce-vs-tiled
equivalence (values AND gradients), depth modes, early termination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.ops.rasterizer import (
    RasterizeConfig,
    render,
    render_depth,
)

CFG = RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64)


def make_scene(rng, n=64, b=2, d_sh=25, spread=1.0):
    """Random gaussians in front of a canonical camera at the origin."""
    means = np.stack(
        [
            rng.uniform(-spread, spread, (b, n)),
            rng.uniform(-spread, spread, (b, n)),
            rng.uniform(3.0, 6.0, (b, n)),
        ],
        axis=-1,
    )
    scales = rng.uniform(0.02, 0.12, (b, n, 3))
    q = rng.standard_normal((b, n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rot = np.zeros((b, n, 3, 3))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rot[..., 0, 0] = 1 - 2 * (y * y + z * z)
    rot[..., 0, 1] = 2 * (x * y - w * z)
    rot[..., 0, 2] = 2 * (x * z + w * y)
    rot[..., 1, 0] = 2 * (x * y + w * z)
    rot[..., 1, 1] = 1 - 2 * (x * x + z * z)
    rot[..., 1, 2] = 2 * (y * z - w * x)
    rot[..., 2, 0] = 2 * (x * z - w * y)
    rot[..., 2, 1] = 2 * (y * z + w * x)
    rot[..., 2, 2] = 1 - 2 * (x * x + y * y)
    cov = np.einsum("bnij,bnj,bnkj->bnik", rot, scales**2, rot)
    sh = rng.standard_normal((b, n, 3, d_sh)) * 0.3
    sh[..., 0] += 0.5  # bias toward visible colors
    opac = rng.uniform(0.3, 0.95, (b, n))
    extr = np.broadcast_to(np.eye(4), (b, 4, 4)).copy()
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, 3, 3)
    ).copy()
    near = np.full((b,), 1.0)
    far = np.full((b,), 100.0)
    bg = np.zeros((b, 3))
    to = lambda a: jnp.asarray(a, jnp.float32)
    return dict(
        extrinsics=to(extr), intrinsics=to(intr), near=to(near), far=to(far),
        background=to(bg), means=to(means), covariances=to(cov), sh=to(sh),
        opacities=to(opac),
    )


class TestAnalytic:
    def test_single_gaussian_center_profile(self):
        """One isotropic gaussian dead-center: check the analytic alpha falloff."""
        h = w = 32
        sigma_world = 0.05
        depth = 4.0
        fx_pix = 1.0 * w  # normalized fx=1.0
        extr = jnp.eye(4)[None]
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        means = jnp.asarray([[[0.0, 0.0, depth]]])
        cov = (jnp.eye(3) * sigma_world**2)[None, None]
        sh = jnp.zeros((1, 1, 3, 1)).at[..., 0].set((1.0 - 0.5) / 0.28209479)
        opac = jnp.asarray([[0.8]])
        img = render(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w),
            jnp.zeros((1, 3)), means, cov, sh, opac,
            scale_invariant=False, impl="bruteforce", config=CFG,
        )
        img = np.asarray(img)[0]
        # Expected: sigma_pix = fx * sigma / z; 2D cov dilated by 0.3.
        sigma_pix2 = (fx_pix * sigma_world / depth) ** 2 + 0.3
        # Gaussian center is at pixel coordinate 16.0; pixel index i has its
        # center at i + 0.5, so index 16+k is at distance (k + 0.5, 0.5).
        for px_off in [0, 1]:
            d2 = (px_off + 0.5) ** 2 + 0.5**2
            alpha = 0.8 * np.exp(-0.5 * d2 / sigma_pix2)
            expected = alpha * 1.0
            got = img[h // 2, w // 2 + px_off, 0]
            np.testing.assert_allclose(got, expected, rtol=2e-2, atol=5e-3)
        # Far from center the alpha falls below the 1/255 cutoff -> exact 0.
        assert img[h // 2, w // 2 + 3, 0] == 0.0

    def test_background_shows_through(self):
        h = w = 16
        extr = jnp.eye(4)[None]
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        means = jnp.asarray([[[10.0, 10.0, 4.0]]])  # far off screen
        cov = (jnp.eye(3) * 1e-4)[None, None]
        sh = jnp.ones((1, 1, 3, 1))
        img = render(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w),
            jnp.full((1, 3), 0.25), means, cov, sh, jnp.asarray([[0.9]]),
            scale_invariant=False, impl="bruteforce", config=CFG,
        )
        np.testing.assert_allclose(np.asarray(img), 0.25, atol=1e-5)

    def test_occlusion_order(self):
        """A fully opaque near gaussian should hide a far one."""
        h = w = 32
        extr = jnp.eye(4)[None]
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        means = jnp.asarray([[[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]]])
        cov = jnp.broadcast_to(jnp.eye(3) * 0.3**2, (1, 2, 3, 3))
        # Near gaussian red-ish, far gaussian green-ish (constant sh term).
        sh = jnp.zeros((1, 2, 3, 1))
        sh = sh.at[0, 0, 0, 0].set(1.0)
        sh = sh.at[0, 1, 1, 0].set(1.0)

        def render_with(opacities):
            return np.asarray(
                render(
                    extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w),
                    jnp.zeros((1, 3)), means, cov, sh, jnp.asarray(opacities),
                    scale_invariant=False, impl="bruteforce", config=CFG,
                )
            )[0]

        both = render_with([[1.0, 1.0]])
        near_only = render_with([[1.0, 0.0]])
        # The opaque near gaussian (alpha clamped at 0.99) leaves only 1%
        # transmittance for the far one.
        c = both[h // 2, w // 2]
        c_near = near_only[h // 2, w // 2]
        assert np.abs(c - c_near).max() < 0.02, f"{c} vs near-only {c_near}"
        # Swap depth order: far gaussian in front -> image changes materially.
        means_swapped = jnp.asarray([[[0.0, 0.0, 6.0], [0.0, 0.0, 2.0]]])
        img_sw = np.asarray(
            render(
                extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w),
                jnp.zeros((1, 3)), means_swapped, cov, sh, jnp.asarray([[1.0, 1.0]]),
                scale_invariant=False, impl="bruteforce", config=CFG,
            )
        )[0]
        c_sw = img_sw[h // 2, w // 2]
        assert c_sw[1] > c_sw[0], f"green (now near) should dominate, got {c_sw}"


class TestTiledVsBruteforce:
    def test_images_match(self):
        rng = np.random.default_rng(0)
        scene = make_scene(rng, n=96, b=2)
        img_bf = render(**scene, image_shape=(32, 32), impl="bruteforce", config=CFG)
        img_t = render(**scene, image_shape=(32, 32), impl="tiled", config=CFG)
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_bf), atol=1e-5, rtol=1e-4
        )

    def test_fused_sort_key_matches_exact(self):
        rng = np.random.default_rng(7)
        scene = make_scene(rng, n=96, b=2)
        exact = RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64)
        fused = RasterizeConfig(
            tile_size=16, tile_capacity=256, chunk=64, fused_sort_key=True
        )
        a = render(**scene, image_shape=(32, 32), impl="tiled", config=exact)
        b = render(**scene, image_shape=(32, 32), impl="tiled", config=fused)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    @pytest.mark.slow
    def test_all_culled_scene_is_background_with_finite_grads(self):
        """Every gaussian behind the near plane: image == background and
        gradients are finite zeros (no NaN from empty tiles)."""
        rng = np.random.default_rng(4)
        scene = make_scene(rng, n=32, b=1)
        means = np.asarray(scene["means"]).copy()
        means[..., 2] = -5.0  # all behind the camera
        scene["background"] = jnp.ones_like(scene["background"]) * 0.25
        for impl in ("tiled", "pallas"):
            def loss(m):
                img = render(
                    scene["extrinsics"], scene["intrinsics"], scene["near"],
                    scene["far"], (32, 32), scene["background"],
                    m, scene["covariances"], scene["sh"],
                    scene["opacities"], impl=impl, config=CFG,
                )
                return jnp.sum(img**2), img

            (l, img), g = jax.value_and_grad(
                loss, has_aux=True
            )(jnp.asarray(means, jnp.float32))
            np.testing.assert_allclose(np.asarray(img), 0.25, atol=1e-6)
            assert bool(jnp.all(jnp.isfinite(g))), impl
            np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    @pytest.mark.parametrize(
        "ts,cap,shape",
        [
            # one fast representative; the other corners move to the
            # slow tier (identical code path, bigger scenes)
            (32, 256, (40, 64)),
            pytest.param(16, 128, (32, 48), marks=pytest.mark.slow),
            pytest.param(16, 512, (64, 64), marks=pytest.mark.slow),
        ],
    )
    def test_config_space_matches_bruteforce(self, ts, cap, shape):
        """Oracle parity across tile sizes, capacities, and nonsquare,
        non-tile-multiple image shapes (BASELINE config 1 robustness)."""
        rng = np.random.default_rng(ts + cap)
        scene = make_scene(rng, n=80, b=2)
        cfg = RasterizeConfig(
            tile_size=ts, tile_capacity=cap, chunk=min(cap, 64)
        )
        ref = render(**scene, image_shape=shape, impl="bruteforce", config=cfg)
        for impl in ("tiled", "pallas"):
            img = render(**scene, image_shape=shape, impl=impl, config=cfg)
            np.testing.assert_allclose(
                np.asarray(img), np.asarray(ref), atol=1e-5, rtol=1e-4,
                err_msg=f"{impl} ts={ts} cap={cap} shape={shape}",
            )

    def test_slot_major_table_layout_matches(self):
        """The relayout-free slot_major table feeds the identical math —
        images AND gradients must match the f_major default bit-closely."""
        rng = np.random.default_rng(9)
        scene = make_scene(rng, n=96, b=2)
        cfg_f = RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64)
        cfg_s = RasterizeConfig(
            tile_size=16, tile_capacity=256, chunk=64,
            table_layout="slot_major",
        )

        def loss(means, cfg):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), scene["background"], means,
                scene["covariances"], scene["sh"], scene["opacities"],
                impl="pallas", config=cfg,
            )
            return jnp.sum(img**2), img

        (lf, img_f), g_f = jax.value_and_grad(
            lambda m: loss(m, cfg_f), has_aux=True
        )(scene["means"])
        (ls, img_s), g_s = jax.value_and_grad(
            lambda m: loss(m, cfg_s), has_aux=True
        )(scene["means"])
        np.testing.assert_allclose(
            np.asarray(img_s), np.asarray(img_f), atol=1e-6
        )
        # dot orientations differ ((C,ch)x(ch,P) vs (ch,C)x(ch,P)), so grad
        # accumulation order reassociates — identical math, f32 tolerance.
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_f), rtol=1e-4, atol=1e-7
        )

    @pytest.mark.slow
    def test_images_match_nonsquare(self):
        rng = np.random.default_rng(1)
        scene = make_scene(rng, n=64, b=1)
        img_bf = render(**scene, image_shape=(24, 40), impl="bruteforce", config=CFG)
        img_t = render(**scene, image_shape=(24, 40), impl="tiled", config=CFG)
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_bf), atol=1e-5, rtol=1e-4
        )

    @pytest.mark.slow
    def test_gradients_match(self):
        rng = np.random.default_rng(2)
        scene = make_scene(rng, n=48, b=1)
        target = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

        def loss(means, cov, sh, opac, impl):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), scene["background"], means, cov, sh,
                opac, impl=impl, config=CFG,
            )
            return jnp.mean((img - target) ** 2)

        args = (scene["means"], scene["covariances"], scene["sh"], scene["opacities"])
        g_bf = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "bruteforce")
        g_t = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "tiled")
        for a, b, name in zip(g_bf, g_t, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-3,
                err_msg=f"gradient mismatch for {name}",
            )
        # Gradients must be finite and nonzero.
        assert float(jnp.abs(g_t[0]).max()) > 0

class TestTightCullBound:
    def test_bound_is_conservative_on_random_conics(self):
        """Property test of the cull predicate itself: whenever
        tile_alpha_cull drops a (gaussian, tile) pair, EVERY pixel
        center of that tile must evaluate below alpha_min under the
        kernels' own alpha formula — over random PD conics, means both
        inside and far outside the tile, and opacities spanning the
        cutoff."""
        from pf3plat_tpu.ops.rasterizer.binning import tile_alpha_cull

        cfg = RasterizeConfig(tile_size=16)
        rng = np.random.default_rng(7)
        n = 4096
        # Random PD conics: C = R diag(1/sx^2, 1/sy^2) R^T.
        th = rng.uniform(0, np.pi, n)
        sx = rng.uniform(0.3, 20.0, n)
        sy = rng.uniform(0.3, 20.0, n)
        c, s = np.cos(th), np.sin(th)
        ca = (c * c) / sx**2 + (s * s) / sy**2
        cc = (s * s) / sx**2 + (c * c) / sy**2
        cb = c * s * (1.0 / sx**2 - 1.0 / sy**2)
        mu_x = rng.uniform(-40.0, 56.0, n).astype(np.float32)
        mu_y = rng.uniform(-40.0, 56.0, n).astype(np.float32)
        op = rng.uniform(1e-4, 1.0, n).astype(np.float32)
        tx = np.zeros(n, np.int32)  # tile [0,16) x [0,16)
        ty = np.zeros(n, np.int32)

        keep = np.asarray(
            tile_alpha_cull(
                jnp.asarray(mu_x), jnp.asarray(mu_y),
                jnp.asarray(ca, dtype=jnp.float32),
                jnp.asarray(cb, dtype=jnp.float32),
                jnp.asarray(cc, dtype=jnp.float32),
                jnp.asarray(op), jnp.asarray(tx), jnp.asarray(ty), cfg,
            )
        )
        # Kernel-formula alpha at every pixel center of the tile.
        px = np.arange(16, dtype=np.float32) + 0.5
        gx, gy = np.meshgrid(px, px)
        dx = gx.reshape(-1)[None, :] - mu_x[:, None].astype(np.float32)
        dy = gy.reshape(-1)[None, :] - mu_y[:, None].astype(np.float32)
        power = (
            -0.5 * (ca[:, None].astype(np.float32) * dx * dx
                    + cc[:, None].astype(np.float32) * dy * dy)
            - cb[:, None].astype(np.float32) * dx * dy
        ).astype(np.float32)
        alpha = op[:, None] * np.exp(np.minimum(power, 0.0),
                                     dtype=np.float32)
        hits = (alpha >= cfg.alpha_min).any(axis=1)
        # Conservative: a dropped pair may never contain a contributing
        # pixel. (Kept pairs with no hits are allowed — that is the
        # bound's slack.)
        bad = hits & ~keep
        assert not bad.any(), (
            f"{bad.sum()} culled pairs actually contribute; first idx "
            f"{np.argmax(bad)}"
        )
        # And the cull must actually bite on this distribution.
        assert (~keep).sum() > n // 10


class TestTightCull:
    """Opacity-aware tile culling (binning.tile_alpha_cull) drops only
    exactly-zero pairs. Removing a zero pair shifts later pairs across
    chunk boundaries, reassociating the transmittance product, so images
    and gradients match to f32 reassociation (~1e-7, measured) rather
    than bit-for-bit; the candidate-pair count must measurably shrink."""

    def _loss_grads(self, scene, shape, impl, cfg):
        target = jnp.zeros((*scene["near"].shape, *shape, 3))

        def loss(means, cov, sh, opac):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], shape, scene["background"], means, cov, sh,
                opac, impl=impl, config=cfg,
            )
            return jnp.mean((img - target) ** 2), img

        (l, img), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True
        )(
            scene["means"], scene["covariances"], scene["sh"],
            scene["opacities"],
        )
        return img, grads

    @pytest.mark.parametrize("impl", ["streamed", "pallas"])
    def test_cull_bit_equal(self, impl):
        rng = np.random.default_rng(31)
        scene = make_scene(rng, n=192, b=2)
        shape = (48, 64)
        base = dict(tile_size=16, tile_capacity=256, chunk=128)
        img_on, g_on = self._loss_grads(
            scene, shape, impl, RasterizeConfig(**base, tight_cull=True)
        )
        img_off, g_off = self._loss_grads(
            scene, shape, impl, RasterizeConfig(**base, tight_cull=False)
        )
        np.testing.assert_allclose(
            np.asarray(img_on), np.asarray(img_off), atol=3e-6, rtol=0
        )
        for a, b, name in zip(g_on, g_off, ["means", "cov", "sh", "opac"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-7, rtol=1e-4,
                err_msg=f"cull changed gradient for {name}",
            )

    def test_cull_bit_equal_compacted(self):
        rng = np.random.default_rng(32)
        scene = make_scene(rng, n=192, b=2)
        shape = (48, 64)
        base = dict(
            tile_size=16, tile_capacity=256, chunk=128,
            pairs_budget_factor=1.0, compact_min_pairs=0,
        )
        img_on, g_on = self._loss_grads(
            scene, shape, "streamed", RasterizeConfig(**base, tight_cull=True)
        )
        img_off, g_off = self._loss_grads(
            scene, shape, "streamed",
            RasterizeConfig(**base, tight_cull=False),
        )
        np.testing.assert_allclose(
            np.asarray(img_on), np.asarray(img_off), atol=3e-6, rtol=0
        )
        for a, b in zip(g_on, g_off):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-7, rtol=1e-4
            )

    def test_cull_reduces_candidates(self):
        from pf3plat_tpu.ops.rasterizer.compact import compact_pairs
        from pf3plat_tpu.ops.rasterizer.project import project_gaussians
        from pf3plat_tpu.ops.rasterizer.api import make_camera

        rng = np.random.default_rng(33)
        scene = make_scene(rng, n=256, b=2)
        shape = (48, 64)
        totals = {}
        for cull in (True, False):
            cfg = RasterizeConfig(
                tile_size=16, tile_capacity=256, chunk=128,
                pairs_budget_factor=1.0, compact_min_pairs=0,
                tight_cull=cull,
            )
            cam = make_camera(scene["extrinsics"], scene["intrinsics"], shape)
            screen = jax.vmap(
                lambda c, m, cv, o, s: project_gaussians(
                    c, m, cv, o, s, 4, cfg
                )
            )(
                cam, scene["means"], scene["covariances"],
                scene["opacities"], scene["sh"],
            )
            cp = jax.jit(lambda s: compact_pairs(s, shape, cfg))(screen)
            totals[cull] = int(cp["total"])
        assert totals[True] < totals[False]


class TestTiledVsBruteforceSlow:
    @pytest.mark.slow
    def test_numerical_gradient_opacity(self):
        """Finite-difference check of d(loss)/d(opacity) on a tiny scene."""
        rng = np.random.default_rng(3)
        scene = make_scene(rng, n=8, b=1)

        def loss(opac):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (16, 16), scene["background"], scene["means"],
                scene["covariances"], scene["sh"], opac,
                impl="tiled", config=CFG,
            )
            return jnp.sum(img**2)

        opac = scene["opacities"]
        g = np.asarray(jax.grad(loss)(opac))[0]
        eps = 1e-3
        for i in range(4):
            op_p = opac.at[0, i].add(eps)
            op_m = opac.at[0, i].add(-eps)
            fd = (float(loss(op_p)) - float(loss(op_m))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-4)


class TestSemantics:
    def test_scale_invariance(self):
        """Scaling the world and near/far together must not change the image."""
        rng = np.random.default_rng(4)
        scene = make_scene(rng, n=32, b=1)
        img1 = render(**scene, image_shape=(32, 32), impl="tiled", config=CFG)
        s = 7.0
        scene2 = dict(scene)
        scene2["means"] = scene["means"] * s
        scene2["covariances"] = scene["covariances"] * s * s
        scene2["extrinsics"] = scene["extrinsics"].at[..., :3, 3].mul(s)
        scene2["near"] = scene["near"] * s
        scene2["far"] = scene["far"] * s
        img2 = render(**scene2, image_shape=(32, 32), impl="tiled", config=CFG)
        np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=1e-4)

    @pytest.mark.slow
    def test_early_termination_matches(self):
        """Stacked opaque gaussians exercise the T<1e-4 stop in both paths."""
        h = w = 16
        n = 300
        rng = np.random.default_rng(5)
        extr = jnp.eye(4)[None]
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        means = np.zeros((1, n, 3))
        means[0, :, 2] = np.linspace(2, 8, n)
        means[0, :, :2] = rng.uniform(-0.05, 0.05, (n, 2))
        cov = np.broadcast_to(np.eye(3) * 0.2**2, (1, n, 3, 3))
        sh = rng.uniform(0, 1, (1, n, 3, 1))
        opac = np.full((1, n), 0.95)
        big_cfg = RasterizeConfig(tile_size=16, tile_capacity=512, chunk=64)
        kw = dict(
            extrinsics=extr, intrinsics=intr, near=jnp.ones(1),
            far=jnp.full((1,), 100.0), image_shape=(h, w),
            background=jnp.zeros((1, 3)), means=jnp.asarray(means, jnp.float32),
            covariances=jnp.asarray(cov, jnp.float32),
            sh=jnp.asarray(sh, jnp.float32), opacities=jnp.asarray(opac, jnp.float32),
        )
        img_bf = render(**kw, impl="bruteforce", config=big_cfg)
        img_t = render(**kw, impl="tiled", config=big_cfg)
        # fp regrouping between one-block cumsum and chunked scan accumulates
        # to ~3e-4 on this 300-deep near-opaque stack; that's expected.
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_bf), atol=1e-3)

    def test_depth_render(self):
        """Depth of an opaque wall of gaussians should read back its distance."""
        h = w = 16
        n = 256
        rng = np.random.default_rng(6)
        depth_true = 5.0
        xs, ys = np.meshgrid(np.linspace(-3, 3, 16), np.linspace(-3, 3, 16))
        means = np.stack(
            [xs.ravel(), ys.ravel(), np.full(n, depth_true)], axis=-1
        )[None]
        cov = np.broadcast_to(np.eye(3) * 0.3**2, (1, n, 3, 3))
        opac = np.full((1, n), 1.0)
        extr = jnp.eye(4)[None]
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        d = render_depth(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w),
            jnp.asarray(means, jnp.float32), jnp.asarray(cov, jnp.float32),
            jnp.asarray(opac, jnp.float32), impl="tiled", config=CFG,
        )
        center = np.asarray(d)[0, 6:10, 6:10]
        np.testing.assert_allclose(center, depth_true, rtol=2e-2)


