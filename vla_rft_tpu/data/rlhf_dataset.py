"""RLHF prompt dataset (text-RL path).

Port of verl/utils/dataset/rl_dataset.py RLHFDataset: parquet files with a
chat-format prompt column, tokenized and LEFT-padded to max_prompt_length,
overlong prompts filtered; ground truth ridden along as non-tensor data.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


class RLHFDataset:
    def __init__(
        self,
        parquet_files,
        tokenizer,
        prompt_key: str = "prompt",
        reward_fn_key: str = "data_source",
        max_prompt_length: int = 256,
        pad_token_id: int = 0,
        filter_overlong_prompts: bool = True,
        seed: int = 0,
    ):
        import pandas as pd

        if isinstance(parquet_files, str):
            parquet_files = [parquet_files]
        frames = [pd.read_parquet(f) for f in parquet_files]
        self.df = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        self.tokenizer = tokenizer
        self.prompt_key = prompt_key
        self.reward_fn_key = reward_fn_key
        self.max_prompt_length = max_prompt_length
        self.pad_token_id = pad_token_id
        self._rng = np.random.default_rng(seed)

        self._rows = []
        for _, row in self.df.iterrows():
            ids = self._tokenize_prompt(row[self.prompt_key])
            if filter_overlong_prompts and len(ids) > max_prompt_length:
                continue
            self._rows.append((ids, row))

    def _tokenize_prompt(self, prompt) -> List[int]:
        if isinstance(prompt, (list, np.ndarray)):  # chat format
            if hasattr(self.tokenizer, "apply_chat_template"):
                return list(
                    self.tokenizer.apply_chat_template(
                        list(prompt), add_generation_prompt=True
                    )
                )
            text = "\n".join(m["content"] for m in prompt)
        else:
            text = str(prompt)
        return list(self.tokenizer.encode(text))

    def __len__(self):
        return len(self._rows)

    def sample_batch(self, batch_size: int) -> Dict[str, Any]:
        idx = self._rng.integers(0, len(self._rows), batch_size)
        P = self.max_prompt_length
        input_ids = np.full((batch_size, P), self.pad_token_id, np.int32)
        for j, i in enumerate(idx):
            ids, _ = self._rows[i]
            n = min(len(ids), P)
            input_ids[j, P - n :] = ids[:n]  # LEFT padding
        rows = [self._rows[i][1] for i in idx]
        gts = []
        for r in rows:
            rm = r.get("reward_model", None)
            gts.append(rm["ground_truth"] if isinstance(rm, dict) else r.get("ground_truth", ""))
        return {
            "input_ids": input_ids,
            "data_sources": [r.get(self.reward_fn_key, "gsm8k") for r in rows],
            "ground_truths": gts,
        }
