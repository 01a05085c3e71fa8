"""Multi-chip SPMD tests on the 8-virtual-device CPU mesh.

Validates the driver's `dryrun_multichip` path as a pytest: sharded train
step compiles + runs, gradients are synchronized across the data axis
(every replica applies the same update), and per-host data sharding
composes with the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pf3plat_tpu.parallel import (
    MeshCfg,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_step,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(MeshCfg())
        assert mesh.devices.shape == (8, 1)
        assert mesh.axis_names == ("data", "tile")

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(MeshCfg())
        batch = {"x": jnp.ones((8, 4, 4)), "y": jnp.ones((8,))}
        sharded = shard_batch(mesh, batch)
        assert len(sharded["x"].sharding.device_set) == 8

    def test_sharded_step_equals_single_device(self):
        """Gradient psum over the mesh must equal the full-batch gradient."""
        import optax

        rng = np.random.default_rng(0)
        w0 = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
        opt = optax.sgd(0.1)

        def train_step(state, batch, _rng):
            w, opt_state = state

            def loss_fn(w):
                return jnp.mean((batch["x"] @ w - batch["y"]) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(w)
            up, opt_state = opt.update(g, opt_state, w)
            return (optax.apply_updates(w, up), opt_state), loss

        # Single-device reference.
        ref_state, ref_loss = train_step((w0, opt.init(w0)), {"x": x, "y": y}, None)

        mesh = make_mesh(MeshCfg())
        with mesh:
            state = replicate(mesh, (w0, opt.init(w0)))
            batch = shard_batch(mesh, {"x": x, "y": y})
            step = shard_train_step(train_step, mesh)
            (w1, _), loss = step(state, batch, None)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(w1), np.asarray(ref_state[0]), atol=1e-6
        )

    @pytest.mark.slow
    def test_graft_dryrun_multichip(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "graft", "__graft_entry__.py"
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        m.dryrun_multichip(8)  # asserts finiteness internally


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestTileShardedRender:
    @pytest.mark.slow
    def test_pallas_mesh_path_matches_unsharded(self):
        """The production tile-sharded path (render(impl='pallas', mesh=...))
        on a (data=2, tile=4) mesh reproduces the unsharded pallas render
        and its gradients."""
        import sys
        sys.path.insert(0, "tests")
        from test_rasterizer import make_scene

        from pf3plat_tpu.ops.rasterizer import RasterizeConfig, render

        cfg = RasterizeConfig(tile_size=16, tile_capacity=256, chunk=64)
        rng = np.random.default_rng(2)
        scene = make_scene(rng, n=96, b=2)
        mesh = make_mesh(MeshCfg(data_axis=2, tile_axis=4))

        def loss(means, mesh_arg):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), scene["background"], means,
                scene["covariances"], scene["sh"], scene["opacities"],
                impl="pallas", config=cfg, mesh=mesh_arg,
            )
            return jnp.sum(img**2), img

        (ref_l, ref_img), ref_g = jax.value_and_grad(
            lambda m: loss(m, None), has_aux=True
        )(scene["means"])
        (sh_l, sh_img), sh_g = jax.value_and_grad(
            lambda m: loss(m, mesh), has_aux=True
        )(scene["means"])
        np.testing.assert_allclose(
            np.asarray(sh_img), np.asarray(ref_img), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sh_g), np.asarray(ref_g), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("budget_factor", [0.0, 1.0])
    def test_streamed_mesh_path_matches_unsharded(self, budget_factor):
        """The fast streamed pipeline under a (data=2, tile=4) mesh
        reproduces the unsharded streamed render and its gradients.
        budget_factor=0 exercises the replicated-sort fallback (only the
        compositing rows shard); budget_factor=1 exercises the
        SHARD-LOCAL pipeline (shard_local.py: per-shard compaction,
        sort, RMW backward, unsort, banded reduce, psum)."""
        import sys
        sys.path.insert(0, "tests")
        from test_rasterizer import make_scene

        from pf3plat_tpu.ops.rasterizer import RasterizeConfig, render

        cfg = RasterizeConfig(
            tile_size=16, tile_capacity=256, chunk=128,
            pairs_budget_factor=budget_factor, compact_window=512,
            compact_min_pairs=0,
        )
        rng = np.random.default_rng(4)
        # (2, 2) mesh / n=64: interpret-mode pallas compiles per shard
        # dominate this test's runtime; 4 shards already exercise the
        # multi-axis flat-index + ownership-mask + psum machinery.
        scene = make_scene(rng, n=64, b=2)
        mesh = make_mesh(
            MeshCfg(data_axis=2, tile_axis=2), devices=jax.devices()[:4]
        )

        def loss(means, mesh_arg):
            img = render(
                scene["extrinsics"], scene["intrinsics"], scene["near"],
                scene["far"], (32, 32), scene["background"], means,
                scene["covariances"], scene["sh"], scene["opacities"],
                impl="streamed", config=cfg, mesh=mesh_arg,
            )
            return jnp.sum(img**2), img

        (ref_l, ref_img), ref_g = jax.value_and_grad(
            lambda m: loss(m, None), has_aux=True
        )(scene["means"])
        (sh_l, sh_img), sh_g = jax.value_and_grad(
            lambda m: loss(m, mesh), has_aux=True
        )(scene["means"])
        np.testing.assert_allclose(
            np.asarray(sh_img), np.asarray(ref_img), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sh_g), np.asarray(ref_g), rtol=1e-4, atol=1e-5
        )



class TestShardBudget:
    def test_shard_budget_invariants(self):
        """shard_pairs_budget must always return a chunk-multiple budget
        that covers at least one full tile window plus the compaction
        kernel's staged-block slack, never exceeds the always-exact
        bound, and splits the global fraction with slack headroom."""
        from pf3plat_tpu.ops.rasterizer import RasterizeConfig
        from pf3plat_tpu.ops.rasterizer.shard_local import (
            shard_pairs_budget,
        )

        for factor in (0.3, 0.48, 1.0):
            for b, n in ((2, 4096), (6, 65536), (1, 512)):
                for s in (2, 4, 8):
                    cfg = RasterizeConfig(
                        pairs_budget_factor=factor, compact_min_pairs=0
                    )
                    bud = shard_pairs_budget(cfg, b, n, s)
                    total = b * n * cfg.max_dup
                    ck = cfg.chunk
                    n_chunks = cfg.tile_capacity // ck + 1
                    cx = cfg.compact_window + 128
                    assert bud % ck == 0
                    # One full tile window + the append slack always fit.
                    assert bud >= n_chunks * ck + cx
                    # Never beyond the exact bound (rounded to chunk).
                    assert bud <= -(-(total + cx) // ck) * ck
                    # Big scenes: per-shard slack headroom is applied.
                    if total * factor / s > 4 * cx:
                        want = total * factor * cfg.shard_budget_slack / s
                        assert bud >= want * 0.99
