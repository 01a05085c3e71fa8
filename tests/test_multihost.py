"""Two-process multi-host smoke on CPU (SURVEY §4 multi-host test plan).

Spawns two python processes, each with 4 virtual CPU devices, joined into
one 8-device jax cluster via `parallel.initialize_multihost`; each process
holds only its host-local batch shard and the cluster computes a global
data-parallel gradient step. Validates the real multi-host code path
(jax.distributed + global mesh + host-local-to-global arrays + psum over
DCN) that `main.run_train` uses on pods — not just the single-process
8-device simulation the other tests run.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    pid = int(sys.argv[1]); coord = sys.argv[2]
    sys.path.insert(0, sys.argv[3])

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pf3plat_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pf3plat_tpu.parallel import MeshCfg, make_mesh

    mesh = make_mesh(MeshCfg())  # (8, 1) global mesh across both processes
    # Host-local batch shard (4 rows per host) -> global (8, 16) array.
    rng = np.random.default_rng(100 + pid)
    local = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    with mesh:
        batch = multihost_utils.host_local_array_to_global_array(
            local, mesh, P("data")
        )
        w = jnp.asarray(
            np.random.default_rng(7).standard_normal((16, 4)), jnp.float32
        )

        @jax.jit
        def grad_step(w, x):
            return jax.grad(lambda w: jnp.mean((x @ w) ** 2))(w)

        g = grad_step(w, batch)
        # bring the replicated global gradient down to a host-local array
        g_local = multihost_utils.global_array_to_host_local_array(
            g, mesh, P()
        )
    checksum = float(np.asarray(g_local).sum())
    print(f"CHECKSUM {checksum:.6f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    root = str(Path(__file__).resolve().parent.parent)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, root],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)
    finally:
        for p in procs:  # don't leak workers if a communicate times out
            if p.poll() is None:
                p.kill()

    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("CHECKSUM")][0]
        sums.append(float(line.split()[1]))
    # both hosts computed the same global gradient over the 8-row batch
    np.testing.assert_allclose(sums[0], sums[1], rtol=1e-6)

    # and the result matches a single-process recomputation of the same
    # global batch (host 0 rows then host 1 rows)
    rngs = [np.random.default_rng(100 + i) for i in range(2)]
    x = np.concatenate([r.standard_normal((4, 16)) for r in rngs]).astype(
        np.float32
    )
    w = np.random.default_rng(7).standard_normal((16, 4)).astype(np.float32)
    import jax
    import jax.numpy as jnp

    g = jax.grad(lambda w: jnp.mean((jnp.asarray(x) @ w) ** 2))(jnp.asarray(w))
    np.testing.assert_allclose(sums[0], float(np.asarray(g).sum()), rtol=1e-4)
