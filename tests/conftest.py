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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
