"""Unit tests for the geometry core vs closed-form / float64 numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf3plat_tpu.geometry import projection as proj
from pf3plat_tpu.geometry import transforms as tfm
from pf3plat_tpu.geometry import procrustes, camera_sync, sh


def random_rotation(rng, shape=()):
    """Uniform-ish random rotations via QR of Gaussian matrices (float64)."""
    a = rng.standard_normal(shape + (3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[..., None]
    return q


def random_se3(rng, shape=()):
    r = random_rotation(rng, shape)
    t = rng.standard_normal(shape + (3,))
    m = np.zeros(shape + (4, 4))
    m[..., :3, :3] = r
    m[..., :3, 3] = t
    m[..., 3, 3] = 1.0
    return m


class TestProjection:
    def test_se3_inverse(self):
        rng = np.random.default_rng(0)
        m = random_se3(rng, (5,))
        inv = proj.se3_inverse(jnp.asarray(m, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(inv @ jnp.asarray(m, jnp.float32)),
            np.broadcast_to(np.eye(4), (5, 4, 4)),
            atol=1e-5,
        )

    def test_intrinsics_inverse(self):
        k = jnp.asarray([[0.8, 0.0, 0.5], [0.0, 1.2, 0.45], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(proj.intrinsics_inverse(k)), np.linalg.inv(np.asarray(k)),
            atol=1e-6,
        )

    def test_project_unproject_roundtrip(self):
        rng = np.random.default_rng(1)
        extr = jnp.asarray(random_se3(rng, (4,)), jnp.float32)
        intr = jnp.asarray(
            np.broadcast_to(
                np.array([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1.0]]), (4, 3, 3)
            ),
            jnp.float32,
        )
        xy = jnp.asarray(rng.uniform(0.1, 0.9, (4, 7, 2)), jnp.float32)
        z = jnp.asarray(rng.uniform(1.0, 5.0, (4, 7)), jnp.float32)
        cam_pts = proj.unproject(xy, z, intr[:, None])
        world = proj.transform_cam2world(
            proj.homogenize_points(cam_pts), extr[:, None]
        )[..., :3]
        xy2, in_front = proj.project(world, extr[:, None], intr[:, None])
        assert bool(jnp.all(in_front))
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)

    def test_world_rays_consistent_with_unproject(self):
        rng = np.random.default_rng(2)
        extr = jnp.asarray(random_se3(rng, ()), jnp.float32)
        intr = jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32)
        xy = jnp.asarray([[0.3, 0.7]], jnp.float32)
        origins, dirs = proj.get_world_rays(xy, extr, intr)
        np.testing.assert_allclose(
            np.asarray(origins[0]), np.asarray(extr[:3, 3]), atol=1e-6
        )
        np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs[0])), 1.0, atol=1e-5)
        # A point along the ray should project back to xy.
        world_pt = origins + dirs * 3.0
        xy2, _ = proj.project(world_pt, extr, intr)
        np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-4)

    def test_sample_image_grid(self):
        coords, idx = proj.sample_image_grid((4, 8))
        assert coords.shape == (4, 8, 2)
        assert idx.shape == (4, 8, 2)
        # xy ordering: coords[..., 0] is x (varies along width).
        np.testing.assert_allclose(np.asarray(coords[0, :, 0]), (np.arange(8) + 0.5) / 8)
        np.testing.assert_allclose(np.asarray(coords[:, 0, 1]), (np.arange(4) + 0.5) / 4)

    def test_get_fov(self):
        intr = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]])
        fov = proj.get_fov(intr)
        expected = 2 * np.arctan(0.5)
        np.testing.assert_allclose(np.asarray(fov[0]), [expected, expected], atol=1e-5)

    def test_intersect_rays(self):
        o1 = jnp.asarray([0.0, 0.0, 0.0])
        d1 = jnp.asarray([1.0, 0.0, 0.0])
        o2 = jnp.asarray([0.0, 1.0, 0.0])
        d2 = jnp.asarray([0.0, -1.0, 0.0])
        p = proj.intersect_rays(o1, d1, o2, d2)
        np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, 0.0], atol=1e-5)
        # Parallel rays -> inf sentinel.
        p2 = proj.intersect_rays(o1, d1, o2, d1)
        assert float(p2[0]) >= 1e9


class TestTransforms:
    def test_geodesic_distance(self):
        rng = np.random.default_rng(3)
        axis = np.array([0.0, 0.0, 1.0])
        angle = 0.7
        c, s = np.cos(angle), np.sin(angle)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        d = tfm.geodesic_distance(jnp.asarray(r, jnp.float32), jnp.eye(3))
        np.testing.assert_allclose(float(d), angle, atol=1e-5)

    def test_rotation_6d_roundtrip(self):
        rng = np.random.default_rng(4)
        r = random_rotation(rng, (10,))
        d6 = tfm.matrix_to_rotation_6d(jnp.asarray(r, jnp.float32))
        r2 = tfm.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)

    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(5)
        r = random_rotation(rng, (16,))
        q = tfm.matrix_to_quaternion(jnp.asarray(r, jnp.float32))
        r2 = tfm.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)

    def test_so3_project(self):
        rng = np.random.default_rng(6)
        r = random_rotation(rng, (4,))
        noisy = jnp.asarray(r + 0.05 * rng.standard_normal((4, 3, 3)), jnp.float32)
        p = tfm.so3_project(noisy)
        eye = jnp.matmul(p, jnp.swapaxes(p, -1, -2))
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(p)), np.ones(4), atol=1e-5)

    def test_make_rt(self):
        rng = np.random.default_rng(7)
        r = jnp.asarray(random_rotation(rng), jnp.float32)
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        m = tfm.make_rt(r, t)
        x = jnp.asarray(rng.standard_normal(3), jnp.float32)
        lhs = m @ jnp.concatenate([x, jnp.ones(1)])
        rhs = x @ r + t
        np.testing.assert_allclose(np.asarray(lhs[:3]), np.asarray(rhs), atol=1e-5)


class TestProcrustes:
    def test_exact_recovery(self):
        rng = np.random.default_rng(8)
        r = random_rotation(rng)
        t = rng.standard_normal(3)
        p = rng.standard_normal((50, 3))
        q = p @ r + t
        fit = procrustes.weighted_kabsch(
            jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.ones(50, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(fit.r), r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fit.t), t, atol=1e-4)

    def test_weighted_ignores_zero_weight_outliers(self):
        rng = np.random.default_rng(9)
        r = random_rotation(rng)
        t = rng.standard_normal(3)
        p = rng.standard_normal((60, 3))
        q = p @ r + t
        q_corrupt = q.copy()
        q_corrupt[:10] += rng.standard_normal((10, 3)) * 5.0
        w = np.ones(60)
        w[:10] = 1e-12
        fit = procrustes.weighted_kabsch(
            jnp.asarray(p, jnp.float32), jnp.asarray(q_corrupt, jnp.float32),
            jnp.asarray(w, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(fit.r), r, atol=1e-3)

    def test_ransac_rejects_outliers(self):
        rng = np.random.default_rng(10)
        r = random_rotation(rng)
        t = rng.standard_normal(3)
        p = rng.standard_normal((100, 3))
        q = p @ r + t
        q_corrupt = q.copy()
        q_corrupt[:30] = rng.standard_normal((30, 3)) * 3.0  # 30% gross outliers
        fit = procrustes.align_ransac(
            jax.random.PRNGKey(0),
            jnp.asarray(p, jnp.float32),
            jnp.asarray(q_corrupt, jnp.float32),
            jnp.ones(100, jnp.float32),
        )
        err = tfm.geodesic_distance(fit.r, jnp.asarray(r, jnp.float32))
        assert float(err) < 0.02
        np.testing.assert_allclose(np.asarray(fit.t), t, atol=0.05)

    def test_batched_via_vmap(self):
        rng = np.random.default_rng(11)
        r = random_rotation(rng, (6,))
        t = rng.standard_normal((6, 3))
        p = rng.standard_normal((6, 40, 3))
        q = np.einsum("bni,bij->bnj", p, r) + t[:, None]
        fit = procrustes.weighted_kabsch(
            jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.ones((6, 40), jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(fit.r), r, atol=1e-4)


class TestCameraSync:
    def _make_views(self, rng, n, batch=2):
        return random_se3(rng, (batch, n))

    def test_chaining_recovers_relatives(self):
        rng = np.random.default_rng(12)
        n = 5
        # absolute poses P_k maps view-k coords to world; relative i->j = inv(P_j) P_i
        abs_poses = self._make_views(rng, n)
        rel = np.einsum(
            "bnij,bnjk->bnik",
            np.linalg.inv(abs_poses[:, 1:]),
            abs_poses[:, :-1],
        )
        chained = camera_sync.camera_chaining(jnp.asarray(rel, jnp.float32))
        expected = np.einsum(
            "bnij,bjk->bnik", np.linalg.inv(abs_poses), abs_poses[:, 0]
        )
        np.testing.assert_allclose(np.asarray(chained), expected, atol=1e-4)

    def test_synchronization_consistent_inputs(self):
        rng = np.random.default_rng(13)
        n = 4
        abs_poses = self._make_views(rng, n, batch=2)
        w2c = np.linalg.inv(abs_poses)
        pair_i, pair_j = [], []
        rels = []
        for i in range(n):
            for j in range(i + 1, n):
                pair_i.append(i)
                pair_j.append(j)
                rels.append(np.einsum("bij,bjk->bik", w2c[:, j], abs_poses[:, i]))
        rel = jnp.asarray(np.stack(rels, 1), jnp.float32)
        conf = jnp.ones(rel.shape[:2], jnp.float32)
        sync = camera_sync.camera_synchronization(
            rel, conf, tuple(pair_i), tuple(pair_j), n
        )
        expected = np.einsum("bnij,bjk->bnik", w2c, abs_poses[:, 0])
        np.testing.assert_allclose(np.asarray(sync), expected, atol=1e-3)

    def test_synchronization_downweights_bad_edge(self):
        rng = np.random.default_rng(14)
        n = 4
        abs_poses = self._make_views(rng, n, batch=1)
        w2c = np.linalg.inv(abs_poses)
        pair_i, pair_j, rels, confs = [], [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                pair_i.append(i)
                pair_j.append(j)
                true_rel = np.einsum("bij,bjk->bik", w2c[:, j], abs_poses[:, i])
                if (i, j) == (0, 3):
                    rels.append(random_se3(rng, (1,)))  # corrupted edge
                    confs.append(np.full((1,), 1e-4))
                else:
                    rels.append(true_rel)
                    confs.append(np.ones((1,)))
        rel = jnp.asarray(np.stack(rels, 1), jnp.float32)
        conf = jnp.asarray(np.stack(confs, 1), jnp.float32)
        sync = camera_sync.camera_synchronization(
            rel, conf, tuple(pair_i), tuple(pair_j), n
        )
        expected = np.einsum("bnij,bjk->bnik", w2c, abs_poses[:, 0])
        rot_err = tfm.geodesic_distance(
            sync[0, :, :3, :3], jnp.asarray(expected[0, :, :3, :3], jnp.float32)
        )
        assert float(jnp.max(rot_err)) < 0.05


class TestSphericalHarmonics:
    def test_basis_orthonormal(self):
        # Monte-Carlo orthonormality check over the sphere.
        rng = np.random.default_rng(15)
        d = rng.standard_normal((200_000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        basis = np.asarray(sh.sh_basis(jnp.asarray(d, jnp.float32), 4))
        gram = 4 * np.pi * basis.T @ basis / d.shape[0]
        np.testing.assert_allclose(gram, np.eye(25), atol=0.05)

    def test_rotation_equivariance(self):
        rng = np.random.default_rng(16)
        r = random_rotation(rng, (3,))
        coeffs = rng.standard_normal((3, 25))
        d = rng.standard_normal((3, 50, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # f_rot(d) with rotated coeffs must equal f(R^-1 d) with original coeffs.
        rotated = sh.rotate_sh(jnp.asarray(coeffs, jnp.float32), jnp.asarray(r, jnp.float32), 4)
        basis_d = sh.sh_basis(jnp.asarray(d, jnp.float32), 4)
        lhs = jnp.einsum("bn,bkn->bk", rotated, basis_d)
        d_back = np.einsum("bji,bkj->bki", r, d)  # R^T d
        basis_back = sh.sh_basis(jnp.asarray(d_back, jnp.float32), 4)
        rhs = jnp.einsum("bn,bkn->bk", jnp.asarray(coeffs, jnp.float32), basis_back)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-3)

    def test_identity_rotation_is_noop(self):
        rng = np.random.default_rng(17)
        coeffs = jnp.asarray(rng.standard_normal((5, 25)), jnp.float32)
        out = sh.rotate_sh(coeffs, jnp.broadcast_to(jnp.eye(3), (5, 3, 3)), 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(coeffs), atol=1e-4)
