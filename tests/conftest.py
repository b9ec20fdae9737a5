"""Test env: 8 virtual CPU devices so multi-chip sharding paths compile+run
without TPU hardware (mirrors how the reference simulates multi-node with
local Ray actors, train/verl/tests/ray/).

Hardware gate mode: VLA_RFT_TEST_TPU=1 keeps the real TPU platform and flips
kernel tests from interpret mode to compiled Mosaic kernels (tests import
INTERPRET from tests/kernel_mode.py).  tools/tpu_validate.sh phase 1 uses
this so the "Mosaic lowering check" actually lowers through Mosaic — the
round-2 bench blocker (decode_attention_hd shape-cast) was invisible to
interpret-mode tests by construction.

Note: the session sitecustomize pre-imports jax with JAX_PLATFORMS=axon (one
real TPU chip), so we must switch the platform via jax.config.update — env
vars alone are read too early.
"""
import os

from kernel_mode import ON_TPU

flags = os.environ.get("XLA_FLAGS", "")
if not ON_TPU and "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if not ON_TPU and "xla_cpu_enable_fast_math" not in flags:
    # XLA:CPU fast-math miscompiles expf at huge-magnitude inputs for some
    # (batch, seqlen) vectorization shapes — deterministic all-NaN logits
    # in jitted programs while eager mode is clean (see ops/attention.py
    # _attention_xla).  The kernels now use bounded exp inputs, but the
    # flag off is the backstop for any remaining fast-math-unsafe op.
    # CPU-only: TPU compiles (and the axon remote-compile cache keys)
    # never see this flag because tests pin jax_platforms=cpu.
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")


# ---- fast/slow tiers -------------------------------------------------------
# tests/slow_tests.txt lists every test >=6s on the CPU suite (measured
# 2026-08-19: full suite 44m28s).  The fast tier `pytest -m "not slow"`
# stays under ~3.5 min so it can gate every snapshot; run the full suite
# (or `-m slow`) before perf claims / releases.  Unlisted tests default to
# fast — regenerate the manifest from a `--durations=0` run when it drifts.
import pathlib  # noqa: E402

import pytest  # noqa: E402

_SLOW_IDS = frozenset(
    line.strip()
    for line in (pathlib.Path(__file__).parent / "slow_tests.txt").read_text().splitlines()
    if line.strip() and not line.startswith("#")
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
