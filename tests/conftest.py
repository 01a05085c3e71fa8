"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The container's sitecustomize registers the axon TPU PJRT plugin in every
interpreter and sets JAX_PLATFORMS=axon; backend *selection* is lazy, so
overriding jax_platforms here (before any backend use) pins the whole test
suite to the 8-virtual-device CPU backend. This matches the driver's
`dryrun_multichip` harness and SURVEY.md §4's multi-host test plan.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU-pinned test processes: most of the
# suite's wall time is XLA compiles of interpret-mode pallas pipelines,
# which repeat identically across runs and xdist workers. SAFE here
# because this process never touches the axon backend (whose
# remote-compile path hangs with a persistent cache — see
# .claude/skills/verify: never set JAX_COMPILATION_CACHE_DIR globally).
_cache = os.environ.get(
    "PF3PLAT_TEST_COMPILE_CACHE", "/tmp/pf3plat_test_xla_cache"
)
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
