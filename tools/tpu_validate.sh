#!/bin/bash
# One-shot TPU validation for the round-3 decode rework (hd KV layout,
# fused decode step, prefix-run blocks).  Run from the repo root on a box
# with the axon TPU tunnel up.  Each phase appends to /tmp/tpuval/*.log and
# keeps going on failure so one broken piece doesn't hide the rest.
#
#   bash tools/tpu_validate.sh
#
# Phase order is cheapest-first so a Mosaic lowering rejection in the new
# kernels surfaces in minutes, not after a 15-minute trainer compile.
set -u
mkdir -p /tmp/tpuval
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  if timeout "$to" "$@" > "/tmp/tpuval/$name.log" 2>&1; then
    echo "    OK  — tail:"; tail -3 "/tmp/tpuval/$name.log" | sed 's/^/    /'
  else
    echo "    FAIL (exit $?) — tail:"; tail -6 "/tmp/tpuval/$name.log" | sed 's/^/    /'
  fi
}

# 0. device sanity
run devices 300 python -c "import jax; print(jax.devices())"

# 1. new kernels compile+run on real hardware at test shapes (Mosaic
#    lowering check).  VLA_RFT_TEST_TPU=1 flips tests/kernel_mode.py from
#    interpret mode to compiled kernels — without it this phase cannot see
#    lowering failures (the round-2 blocker).  production_shape = the exact
#    WM shapes (Hkv=16, D=64, Sq 1/7/8, int8+bf16, shared+plain).
run kernels_hd 1200 env VLA_RFT_TEST_TPU=1 \
    python -m pytest tests/test_ops_hd.py -x -q -k production_shape
run kernels_flash 1800 env VLA_RFT_TEST_TPU=1 \
    python -m pytest tests/test_ops.py -x -q -k "flash or decode"

# 2. decode microbench A/B: layouts, block sizes, fused step
run wm_hd_bb17 1800 python tools/wm_decode_bench.py --segs 4 --batch 68 \
    --uniques 4 --weights-int8 --kv-layout hd --block-b 32
run wm_heads_bb2 1800 python tools/wm_decode_bench.py --segs 4 --batch 68 \
    --uniques 4 --weights-int8 --kv-layout heads --block-b 2
run wm_hd_profile 1800 python tools/wm_decode_bench.py --segs 4 --batch 68 \
    --uniques 4 --weights-int8 --kv-layout hd --block-b 32 \
    --profile /tmp/tpuval/wm_trace

# 3. int8-conv probe (gates the int8-detokenizer project)
run int8_conv 1200 python tools/int8_conv_probe.py

# 4. reward + full-step benches
run reward 1800 python tools/reward_bench.py
run bench 3600 python bench.py

# 5. spec decode: TPU re-probe with the bounded-exp kernels + acceptance
#    on a fresh-data-trained WM (fast on the chip)
run spec_probe 1800 python tools/spec_probe.py
run spec_accept 3600 python tools/spec_accept_bench.py --layers 6 --hidden 512 \
    --train-steps 2000 --batch 16 --frames 8 --spec-k 5 --churn 0.08 --greedy

echo "=== all logs in /tmp/tpuval ==="
