"""FLOPs estimation for throughput/MFU metrics.

Port of verl's FlopsCounter (train/verl/verl/utils/flops_counter.py:54-180):
dense-transformer FLOPs per token from config, plus attention quadratic term;
promised peak FLOPs per device for MFU.
"""
from __future__ import annotations

from typing import Iterable

# bf16 peak TFLOPs per chip
PROMISED_FLOPS = {
    "tpu v5 lite": 197e12,  # v5e
    "tpu v5": 459e12,  # v5p
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,  # trillium
    "cpu": 1e12,
}


def device_peak_flops(device_kind: str) -> float:
    kind = device_kind.lower()
    for k, v in PROMISED_FLOPS.items():
        if k in kind:
            return v
    return 197e12


class FlopsCounter:
    """estimate_flops(token_sums, delta_time) -> (achieved, promised)."""

    def __init__(self, cfg, device_kind: str = "tpu v5 lite"):
        """cfg: TransformerConfig-like (hidden_size, intermediate_size,
        num_layers, num_heads, num_kv_heads, vocab_size, hd)."""
        self.cfg = cfg
        self.peak = device_peak_flops(device_kind)

    def flops_per_token(self, seqlen: int) -> float:
        c = self.cfg
        hd = c.hd
        qkvo = c.hidden_size * hd * (c.num_heads * 2 + c.num_kv_heads * 2)
        mlp = 3 * c.hidden_size * c.intermediate_size
        emb = c.hidden_size * c.vocab_size  # lm head
        attn = 2 * c.num_heads * hd * seqlen  # score + value matmuls
        per_layer = 2 * (qkvo + mlp + attn)
        return per_layer * c.num_layers + 2 * emb

    def estimate_flops(self, global_token_nums: Iterable[int], delta_time: float):
        total = sum(n * self.flops_per_token(n) for n in global_token_nums)
        achieved = total / max(delta_time, 1e-9)
        return achieved, self.peak
