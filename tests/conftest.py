"""Test env: 8 virtual CPU devices so multi-chip sharding paths compile+run
without TPU hardware (mirrors how the reference simulates multi-node with
local Ray actors, train/verl/tests/ray/).

Note: the session sitecustomize pre-imports jax with JAX_PLATFORMS=axon (one
real TPU chip), so we must switch the platform via jax.config.update — env
vars alone are read too early.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
