"""On-device profiling: jax.profiler traces + per-op breakdown + HBM model.

Closes SURVEY §5.1's TPU-equivalent of the reference's benchmarking hooks
(`src/misc/benchmarker.py` plus the CUDA profiler the reference leans on):

  * `trace(dir)` — context manager around `jax.profiler` (works through the
    axon relay; device TensorCore events are captured);
  * `device_op_breakdown(dir)` — parse the newest `*.trace.json.gz` in a
    trace directory into per-op device-time totals, the replacement for
    eyeballing ablation timings;
  * `raster_traffic_model(...)` — analytic HBM bytes/ray accounting for the
    rasterizer pipeline, the roofline sanity check for kernel work.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Optional


@contextmanager
def trace(log_dir: Path | str):
    """Capture a jax.profiler trace into `log_dir` (TensorBoard layout)."""
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def _newest_trace_file(log_dir: Path) -> Optional[Path]:
    files = sorted(
        Path(log_dir).rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime
    )
    return files[-1] if files else None


def device_op_breakdown(
    log_dir: Path | str, top: int = 0, device_only: bool = True
) -> list[dict]:
    """Aggregate trace events into per-op totals, longest first.

    Returns [{"name", "total_us", "count", "pid_name"}]. `device_only`
    keeps events on device compute tracks (TensorCore / XLA ops / the CPU
    backend's thread pool), dropping python/runtime host rows.
    """
    path = _newest_trace_file(Path(log_dir))
    if path is None:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pid_names: dict = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")

    def is_device(pid) -> bool:
        name = pid_names.get(pid, "")
        return any(
            k in name
            for k in ("TPU", "/device:", "XLA Ops", "TensorFlow Ops", "GPU")
        )

    def collect(filtered: bool) -> list[dict]:
        totals: dict = defaultdict(lambda: [0.0, 0, ""])
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if filtered and not is_device(ev.get("pid")):
                continue
            t = totals[ev["name"]]
            t[0] += float(ev["dur"])
            t[1] += 1
            t[2] = pid_names.get(ev.get("pid"), "")
        return [
            {"name": k, "total_us": v[0], "count": v[1], "pid_name": v[2]}
            for k, v in totals.items()
        ]

    rows = collect(device_only)
    if not rows and device_only:
        # No device tracks (pure-CPU backend traces label everything
        # /host:CPU) — fall back to every duration event.
        rows = collect(False)
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:top] if top else rows


def format_breakdown(rows: list[dict], top: int = 25) -> str:
    total = sum(r["total_us"] for r in rows) or 1.0
    lines = [f"{'us':>12} {'%':>6} {'n':>6}  name"]
    for r in rows[:top]:
        lines.append(
            f"{r['total_us']:12.1f} {100 * r['total_us'] / total:6.2f} "
            f"{r['count']:6d}  {r['name'][:90]}"
        )
    return "\n".join(lines)


@dataclasses.dataclass(frozen=True)
class RasterTraffic:
    """Per-stage HBM byte estimates for one fwd+bwd rasterizer step."""

    sort_bytes: int
    gather_bytes: int
    kernel_fwd_bytes: int
    kernel_bwd_bytes: int
    scatter_bytes: int
    rays: int

    @property
    def total_bytes(self) -> int:
        return (
            self.sort_bytes + self.gather_bytes + self.kernel_fwd_bytes
            + self.kernel_bwd_bytes + self.scatter_bytes
        )

    @property
    def bytes_per_ray(self) -> float:
        return self.total_bytes / max(self.rays, 1)

    def roofline_ms(self, hbm_gbps: float = 800.0) -> float:
        """Bandwidth-bound lower bound for the step (v5e ~819 GB/s)."""
        return self.total_bytes / (hbm_gbps * 1e9) * 1e3

    def as_dict(self) -> dict:
        return {
            "sort_bytes": self.sort_bytes,
            "gather_bytes": self.gather_bytes,
            "kernel_fwd_bytes": self.kernel_fwd_bytes,
            "kernel_bwd_bytes": self.kernel_bwd_bytes,
            "scatter_bytes": self.scatter_bytes,
            "total_bytes": self.total_bytes,
            "bytes_per_ray": self.bytes_per_ray,
            "roofline_ms_at_800GBps": self.roofline_ms(),
        }


def raster_traffic_model(
    config,
    image_shape: tuple[int, int],
    cameras: int,
    gaussians_per_camera: int,
    channels: int = 3,
    sort_passes: int = 10,
) -> RasterTraffic:
    """Analytic HBM traffic of the binned pallas pipeline (fwd+bwd).

    `sort_passes`: HBM round trips XLA's bitonic-ish comparison sort makes
    over the (key, value) pairs — log2(n)-ish; 10 matches the measured ~5 ms
    at 2M pairs on v5e. Use this model to sanity-check measured stage times
    against the bandwidth bound, not as a precise simulator.
    """
    h, w = image_shape
    ts = config.tile_size
    tiles = -(-h // ts) * (-(-w // ts))
    rows = cameras * tiles
    cap = config.tile_capacity
    p = ts * ts
    f_dim = 6 + channels
    pairs = cameras * gaussians_per_camera * config.max_dup
    keys = 1 if config.fused_sort_key else 2

    sort_bytes = pairs * 4 * (keys + 1) * 2 * sort_passes  # rd+wr per pass
    gather_bytes = rows * cap * f_dim * 4 * 2  # read src + write table
    # fwd: table in, image + t_final + per-chunk T checkpoints out
    n_chunks = cap // config.chunk
    kernel_fwd = rows * (f_dim * cap + (channels + 1 + n_chunks) * p) * 4
    # bwd: table + checkpoints + cotangents in, dtable out
    kernel_bwd = rows * (
        f_dim * cap + (n_chunks + channels + 2) * p + f_dim * cap
    ) * 4
    scatter_bytes = rows * cap * f_dim * 4 * 3  # read grads, rd+wr dest
    return RasterTraffic(
        sort_bytes=sort_bytes,
        gather_bytes=gather_bytes,
        kernel_fwd_bytes=kernel_fwd,
        kernel_bwd_bytes=kernel_bwd,
        scatter_bytes=scatter_bytes,
        rays=cameras * h * w,
    )
