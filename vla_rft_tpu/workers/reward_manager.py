"""Reward managers for the text-RL path.

Ports of verl/workers/reward_manager/{naive,prime,dapo}.py selection
(main_vla_rft_grpo.py:147-159): decode responses, apply rule-based scorers,
place the scalar at the last valid response token.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from vla_rft_tpu.utils.reward_score import default_compute_score


class NaiveRewardManager:
    """verl/workers/reward_manager/naive.py:21."""

    def __init__(self, tokenizer, compute_score: Optional[Callable] = None, num_examine: int = 0):
        self.tokenizer = tokenizer
        self.compute_score = compute_score or default_compute_score
        self.num_examine = num_examine

    def __call__(
        self,
        responses: np.ndarray,  # (B, R) token ids
        response_mask: np.ndarray,  # (B, R)
        data_sources: List[str],
        ground_truths: List[str],
        extra_infos: Optional[List] = None,
    ) -> np.ndarray:
        B, R = responses.shape
        reward = np.zeros((B, R), np.float32)
        for i in range(B):
            n = int(response_mask[i].sum())
            if n == 0:
                continue
            text = self.tokenizer.decode(responses[i, :n].tolist())
            score = self.compute_score(
                data_sources[i], text, ground_truths[i],
                extra_infos[i] if extra_infos else None,
            )
            reward[i, n - 1] = score
            if i < self.num_examine:
                print(f"[reward] src={data_sources[i]} score={score} text={text[:200]!r}")
        return reward


class BatchRewardManager(NaiveRewardManager):
    """prime/dapo variants reduce to the same contract here; penalty knobs
    can be layered via compute_score closures."""
