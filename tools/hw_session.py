"""Turnkey TPU measurement session: run everything, dump one report.

Chains, on the real chip (sequentially, one process):
  1. bench.py headline number (Mrays/s fwd+bwd)
  2. jax.profiler trace of the bench step -> per-op device-time breakdown
  3. stage microbenches (sort / gather / scatter at bench sizes)
  4. encoder forward profile (trace + wall-clock)

Writes machine-readable results to /tmp/pf3plat_hw_report.json and the
human table to stdout. Run when the TPU tunnel is back:

    timeout 900 python tools/hw_session.py
"""

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

REPORT = {}


def run(name, args, timeout=600):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, *args], cwd=ROOT, timeout=timeout,
        capture_output=True, text=True,
    )
    out = p.stdout[-8000:]
    print(out, flush=True)
    if p.returncode != 0:
        print(p.stderr[-4000:], flush=True)
    REPORT[name] = {
        "rc": p.returncode, "seconds": round(time.time() - t0, 1),
        "stdout_tail": out.splitlines()[-40:],
    }
    return p


def main() -> None:
    # 1. headline bench (also records the number the driver will see)
    p = run("bench", ["bench.py"], timeout=600)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            try:
                REPORT["bench_json"] = json.loads(line)
            except json.JSONDecodeError:
                pass

    # 1b. A/B the relayout-free table layout against the default
    import os

    os.environ["PF3PLAT_BENCH_TABLE_LAYOUT"] = "slot_major"
    p = run("bench_slot_major", ["bench.py"], timeout=600)
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            try:
                REPORT["bench_slot_major_json"] = json.loads(line)
            except json.JSONDecodeError:
                pass
    del os.environ["PF3PLAT_BENCH_TABLE_LAYOUT"]

    # 2. per-op trace of the bench step
    run("trace_fwdbwd", ["tools/profile_trace.py", "fwdbwd", "10"], timeout=600)

    # 3. stage microbenches
    run("microbench", ["tools/microbench.py"], timeout=600)

    # 4. rasterizer stage profile
    run("profile_raster", ["tools/profile_raster.py"], timeout=600)

    # 5. flash-attention parity + perf at pose-stack shapes
    run("flash_check", ["tools/flash_check.py", "4097", "10"], timeout=600)

    Path("/tmp/pf3plat_hw_report.json").write_text(json.dumps(REPORT, indent=2))
    print("\nreport -> /tmp/pf3plat_hw_report.json", flush=True)


if __name__ == "__main__":
    main()
