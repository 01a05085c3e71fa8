"""Wall-clock + device benchmarking utilities.

Mirrors the reference `Benchmarker` (`src/misc/benchmarker.py:15-41`):
tagged context-manager timing with warmup skipping, JSON dumps, and peak
device memory. TPU specifics: `jax.block_until_ready` is unreliable on
relayed backends, so `sync()` forces a tiny device->host transfer; memory
comes from `jax.local_devices()[0].memory_stats()` (the TPU analogue of the
reference's `torch.cuda.memory_stats`, `benchmarker.py:30-33`).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import numpy as np

import jax


def sync(tree=None) -> None:
    """Force completion of pending device work (see .claude verify notes)."""
    if tree is not None:
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]
            return
    x = jax.device_put(jnp_one())
    np.asarray(x)


def jnp_one():
    import jax.numpy as jnp

    return jnp.ones(())


class Benchmarker:
    def __init__(self, skip_first: int = 0):
        self.execution_times: dict[str, list[float]] = defaultdict(list)
        self.skip_first = skip_first

    @contextmanager
    def time(self, tag: str, num_calls: int = 1, result=None):
        start = time.time()
        try:
            yield
        finally:
            sync(result)
            elapsed = time.time() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def summarize(self) -> dict:
        out = {}
        for tag, times in self.execution_times.items():
            kept = times[self.skip_first:] or times
            out[tag] = {
                "mean_s": float(np.mean(kept)),
                "median_s": float(np.median(kept)),
                "count": len(kept),
            }
        return out

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        path.write_text(json.dumps(self.summarize(), indent=2))

    def dump_memory(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        try:
            dev_stats = jax.local_devices()[0].memory_stats() or {}
            stats = {
                "bytes_in_use": dev_stats.get("bytes_in_use"),
                "peak_bytes_in_use": dev_stats.get("peak_bytes_in_use"),
                "bytes_limit": dev_stats.get("bytes_limit"),
            }
        except Exception as e:  # some backends expose no memory stats
            stats = {"error": str(e)}
        path.write_text(json.dumps(stats, indent=2))

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
