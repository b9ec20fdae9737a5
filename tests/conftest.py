"""Test env: 8 virtual CPU devices so multi-chip sharding paths compile+run
without TPU hardware (mirrors how the reference simulates multi-node with
local Ray actors, train/verl/tests/ray/)."""
import os

# Force CPU for tests even when the session default is the TPU platform
# (JAX_PLATFORMS=axon); sharding correctness is validated on 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
