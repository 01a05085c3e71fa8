"""Turnkey TPU measurement session: run everything, dump one report.

Chains, on the real chip (sequentially, one process at a time):
  1. bench.py auto-tuned (the metric of record; probe matrix on stderr)
  2. bench.py forced f_major vs forced slot_major (clean layout A/B)
  3. jax.profiler trace of the bench step -> per-op device-time breakdown
  4. stage microbenches (sort / gather / scatter at bench sizes)
  5. rasterizer stage profile
  6. flash-attention parity + perf at pose-stack shapes

The report is written incrementally after every step, so a hung or
timed-out step loses only itself. Run when the TPU tunnel is back:

    timeout 3600 python tools/hw_session.py
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

REPORT_PATH = Path("/tmp/pf3plat_hw_report.json")
REPORT: dict = {}


def save_report() -> None:
    REPORT_PATH.write_text(json.dumps(REPORT, indent=2))


def run(name, args, timeout=600, env=None):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.time()
    full_env = dict(os.environ, **(env or {}))
    try:
        p = subprocess.run(
            [sys.executable, *args], cwd=ROOT, timeout=timeout,
            capture_output=True, text=True, env=full_env,
        )
        out, err, rc = p.stdout, p.stderr, p.returncode
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = f"TIMEOUT after {timeout}s"
        rc = -1
    print(out[-8000:], flush=True)
    if rc != 0:
        print(err[-4000:], flush=True)
    REPORT[name] = {
        "rc": rc, "seconds": round(time.time() - t0, 1),
        "stdout_tail": out[-8000:].splitlines()[-40:],
        "stderr_tail": err[-4000:].splitlines()[-20:],
    }
    save_report()
    return out


def bench_json(name, out) -> None:
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                REPORT[f"{name}_json"] = json.loads(line)
                save_report()
            except json.JSONDecodeError:
                pass


def main() -> None:
    out = run("bench_auto", ["bench.py"], timeout=900)
    bench_json("bench_auto", out)

    for layout in ("f_major", "slot_major"):
        out = run(
            f"bench_{layout}", ["bench.py"], timeout=600,
            env={"PF3PLAT_BENCH_TABLE_LAYOUT": layout,
                 "PF3PLAT_BENCH_TILE_SIZE": "16"},
        )
        bench_json(f"bench_{layout}", out)

    run("trace_fwdbwd", ["tools/profile_trace.py", "fwdbwd", "10"], timeout=600)
    run("microbench", ["tools/microbench.py"], timeout=600)
    run("profile_raster", ["tools/profile_raster.py"], timeout=600)
    run("flash_check", ["tools/flash_check.py", "4097", "10"], timeout=600)

    save_report()
    print(f"\nreport -> {REPORT_PATH}", flush=True)


if __name__ == "__main__":
    main()
