"""Device mesh + sharding for multi-chip / multi-host training.

Replaces the reference's Lightning DDP (`src/main.py:104-118`, NCCL
all-reduce per backward) with the JAX SPMD recipe (SURVEY.md §5.8):

  * one global `Mesh` with a `data` axis (DP over chips/hosts) — gradients
    are all-reduced by XLA-inserted psum over ICI, overlapped with the
    rasterizer backward by the scheduler, not by hand;
  * parameters replicated, batch sharded on `data`;
  * multi-host startup via `jax.distributed.initialize` (one process per
    host, same program), host-local data loading sharded by
    `ChunkDataset(host_id, num_hosts)`.

A second `tile` mesh axis is reserved for rasterizer pixel/tile sharding
(Gaussians replicated per tile-shard); with PF3plat-scale scenes a single
v5e chip fits the whole render, so the default layout is pure DP and `tile`
is 1 — the axis exists so larger renders can shard without API changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MeshCfg:
    data_axis: int = -1   # -1: all devices
    tile_axis: int = 1


def make_mesh(cfg: MeshCfg = MeshCfg(), devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    data = n // cfg.tile_axis if cfg.data_axis == -1 else cfg.data_axis
    assert data * cfg.tile_axis == n, (
        f"{n} devices cannot form mesh ({data}, {cfg.tile_axis})"
    )
    return Mesh(devices.reshape(data, cfg.tile_axis), ("data", "tile"))


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host setup (call once per process before device use).

    On TPU pods the cluster is auto-detected (all args None); for explicit
    clusters (or the 2-process CPU smoke test in tests/test_multihost.py)
    pass coordinator "host:port" + num_processes + process_id.
    """
    if coordinator is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif jax.process_count() > 1:
        jax.distributed.initialize()


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Put a host-local batch on device, batch axis sharded over `data`."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """jit the train step for SPMD execution on the mesh.

    Inputs carry their shardings (state replicated via `replicate`, batch
    data-sharded via `shard_batch`); jit propagates them and XLA inserts the
    gradient all-reduce (psum over `data`) automatically — no explicit
    pmean, mirroring what DDP's hook does but fused/overlapped by the
    compiler.
    """
    return jax.jit(train_step, donate_argnums=(0,))
