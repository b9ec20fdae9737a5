"""Kernel-test execution mode.

Default (CPU CI): Pallas kernels run in interpret mode — fast, hardware-free
numerics checks, but structurally blind to Mosaic lowering failures (the
round-2 `tpu.reshape vector<112x1024> -> vector<112x16x64>` bench blocker
passed every interpret test).

VLA_RFT_TEST_TPU=1 (the hardware gate, tools/tpu_validate.sh phase 1): the
same tests compile the kernels for the real chip, so every parity test is
also a Mosaic lowering + on-chip numerics check at the exact shapes.
"""
import os

ON_TPU = os.environ.get("VLA_RFT_TEST_TPU") == "1"
INTERPRET = not ON_TPU
