"""Rule-based reward scorers (verl/utils/reward_score/)."""
from __future__ import annotations

from typing import Optional


def default_compute_score(data_source: str, solution_str: str, ground_truth: str, extra_info=None) -> float:
    """Dispatch like verl's default_compute_score."""
    if data_source in ("openai/gsm8k", "gsm8k"):
        from vla_rft_tpu.utils.reward_score import gsm8k

        return gsm8k.compute_score(solution_str, ground_truth)
    if data_source in ("lighteval/MATH", "math", "math_dapo"):
        from vla_rft_tpu.utils.reward_score import math as math_score

        return math_score.compute_score(solution_str, ground_truth)
    raise NotImplementedError(f"no scorer for data source {data_source!r}")
