"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the driver validates the real multi-chip path via
__graft_entry__.dryrun_multichip).

The axon TPU plugin in this environment overrides the JAX_PLATFORMS env
var at import time, so the platform must be forced via jax.config too.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: identical test graphs compile once across
# runs/sessions (CPU-backend compiles dominate suite wall time)
from dvd_tpu.utils import runtime  # noqa: E402

runtime.enable_compilation_cache(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_test_cache"))
