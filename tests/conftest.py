"""Test config: run on a virtual 8-device CPU mesh (no TPU required).

Mirrors SURVEY.md §4's distributed-test strategy: multi-device semantics are
validated with xla_force_host_platform_device_count; bit-level determinism
replaces sanitizers.

Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
platform must be overridden through jax.config *after* importing jax but
*before* backend initialization.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Default: virtual 8-device CPU mesh.  TUNGSTEN_TPU_TEST_PLATFORM=axon runs
# the single-device tiers (golden parity, gradient FD) on the real chip —
# the heavy tier's render workloads are ~50x faster there, which is what
# makes the whole tier finishable in-round (VERDICT r4 next #1).  Tests
# that REQUIRE virtual CPU devices (multihost, dryrun, parallel) spawn
# subprocesses with their own platform pins or must be run without this
# override.
jax.config.update("jax_platforms",
                  os.environ.get("TUNGSTEN_TPU_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
