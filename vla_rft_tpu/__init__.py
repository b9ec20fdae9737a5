"""vla_rft_tpu — a TPU-native world-model reinforcement fine-tuning framework for
Vision-Language-Action policies.

Re-implements the capabilities of OpenHelix-Team/VLA-RFT (verl + openvla-oft +
ivideogpt) as a single-program SPMD JAX framework:

* the Ray single-controller / FSDP-worker / vLLM hybrid-engine split collapses
  into pjit-compiled stages over one `jax.sharding.Mesh` driven by a thin host
  loop (see `vla_rft_tpu.trainer.grpo_trainer`);
* flash-attention CUDA kernels become Pallas TPU kernels (`vla_rft_tpu.ops.attention`);
* the vLLM autoregressive world-model rollout becomes a `jax.lax.scan` decode
  loop with a static KV cache (`vla_rft_tpu.workers.wm_rollout`);
* DataProto becomes `vla_rft_tpu.protocol.Batch`, a pytree batch container.
"""

__version__ = "0.1.0"

from vla_rft_tpu.protocol import Batch  # noqa: F401
