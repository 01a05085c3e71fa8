"""Gaussian adapter + decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pf3plat_tpu.models.decoder import DecoderCfg, decode
from pf3plat_tpu.models.gaussian_adapter import (
    GaussianAdapterCfg,
    adapt_gaussians,
    build_covariance,
    quaternion_xyzw_to_matrix,
)
from pf3plat_tpu.models.types import Gaussians
from pf3plat_tpu.ops.rasterizer import RasterizeConfig

CFG = GaussianAdapterCfg(sh_degree=2)


class TestAdapter:
    def _run(self, h=8, w=8, v=2, b=1):
        rng = np.random.default_rng(0)
        extr = jnp.broadcast_to(jnp.eye(4), (b, v, 1, 4, 4))
        intr = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]),
            (b, v, 1, 3, 3),
        )
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        coords = jnp.asarray(
            np.stack([xs, ys], -1).reshape(1, 1, h * w, 2), jnp.float32
        )
        coords = jnp.broadcast_to(coords, (b, v, h * w, 2))
        depths = jnp.asarray(rng.uniform(2, 5, (b, v, h * w)), jnp.float32)
        opac = jnp.asarray(rng.uniform(0, 1, (b, v, h * w)), jnp.float32)
        raw = jnp.asarray(
            rng.standard_normal((b, v, h * w, CFG.d_in)), jnp.float32
        )
        return adapt_gaussians(
            CFG, extr, intr, coords, depths, opac, raw, (h, w)
        ), depths

    def test_shapes_and_validity(self):
        (means, cov, sh, opac, scales, rots), depths = self._run()
        assert means.shape == (1, 2, 64, 3)
        assert cov.shape == (1, 2, 64, 3, 3)
        assert sh.shape == (1, 2, 64, 3, CFG.d_sh)
        # Covariances must be symmetric PSD.
        np.testing.assert_allclose(
            np.asarray(cov), np.asarray(jnp.swapaxes(cov, -1, -2)), atol=1e-6
        )
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert (eig > -1e-9).all()
        # Quaternions normalized.
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rots), axis=-1), 1.0, atol=1e-4
        )

    def test_means_lie_at_ray_depth(self):
        (means, *_), depths = self._run()
        # Identity camera at origin: mean z / direction... depth along the ray
        # with unit direction, so |mean| == depth.
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(means), axis=-1),
            np.asarray(depths),
            rtol=1e-5,
        )

    def test_quaternion_xyzw_identity(self):
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(quaternion_xyzw_to_matrix(q)), np.eye(3), atol=1e-6
        )

    def test_build_covariance_isotropic(self):
        s = jnp.asarray([2.0, 2.0, 2.0])
        q = jnp.asarray([0.3, -0.1, 0.8, 0.5])
        cov = build_covariance(s, q)
        np.testing.assert_allclose(np.asarray(cov), 4 * np.eye(3), atol=1e-4)


class TestDecoder:
    def test_decode_shapes_and_depth(self):
        rng = np.random.default_rng(1)
        b, v, g = 1, 2, 128
        means = np.stack(
            [rng.uniform(-1, 1, (b, g)), rng.uniform(-1, 1, (b, g)),
             rng.uniform(3, 5, (b, g))], -1)
        cov = np.broadcast_to(np.eye(3) * 0.01, (b, g, 3, 3))
        sh = rng.standard_normal((b, g, 3, 9)) * 0.3
        opac = rng.uniform(0.3, 1, (b, g))
        gauss = Gaussians(
            jnp.asarray(means, jnp.float32), jnp.asarray(cov, jnp.float32),
            jnp.asarray(sh, jnp.float32), jnp.asarray(opac, jnp.float32),
        )
        extr = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
        intr = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
        )
        near = jnp.ones((b, v))
        far = jnp.full((b, v), 50.0)
        cfg = DecoderCfg(
            impl="tiled",
            raster=RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64),
        )
        out = decode(cfg, gauss, extr, intr, near, far, (32, 32), depth_mode="depth")
        assert out.color.shape == (b, v, 32, 32, 3)
        assert out.depth.shape == (b, v, 32, 32)
        assert bool(jnp.all(jnp.isfinite(out.color)))
        # Both views identical cameras -> identical renders.
        np.testing.assert_allclose(
            np.asarray(out.color[:, 0]), np.asarray(out.color[:, 1]), atol=1e-6
        )
        # Depth in the gaussian depth range where opacity accumulated.
        d = np.asarray(out.depth)
        assert d.max() < 5.5
