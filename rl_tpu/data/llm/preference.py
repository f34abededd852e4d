"""Pairwise preference data for reward-model / preference-optimization
training.

Counterpart of ``/root/reference/torchrl/data/llm/reward.py``
(``RewardData`` :19, ``PairwiseDataset`` :29 — prompt + chosen/rejected
completions, the RLHF reward-model format) and of the tokenization helpers
in ``data/llm/dataset.py`` (``TensorDictTokenizer`` :409).  Host-side
container; :meth:`tokenize` emits padded numpy batches ready for a jitted
Bradley-Terry reward-model or DPO update (losses in
``rl_tpu/objectives/llm``).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

__all__ = ["PairwiseDataset", "tokenize_batch"]


def tokenize_batch(texts: Sequence[str], tokenizer, max_len: int,
                   *, pad_id: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a list of strings to right-padded ``(ids, mask)`` arrays
    (the ``TensorDictTokenizer`` role: fixed shapes for the device)."""
    ids_list = []
    for t in texts:
        ids = tokenizer(t)
        if isinstance(ids, dict):
            ids = ids["input_ids"]
        ids_list.append(np.asarray(ids, np.int32).reshape(-1)[:max_len])
    out = np.full((len(ids_list), max_len), pad_id, np.int32)
    mask = np.zeros((len(ids_list), max_len), bool)
    for i, ids in enumerate(ids_list):
        out[i, : len(ids)] = ids
        mask[i, : len(ids)] = True
    return out, mask


class PairwiseDataset:
    """Rows of ``{"prompt", "chosen", "rejected"}`` (reference
    ``PairwiseDataset.from_dataset``; the CarperAI comparison layout).

    ``from_jsonl`` reads the local-file form (no hub downloads in this
    image — same posture as ``rl_tpu/data/datasets.py``).  ``tokenize``
    renders ``prompt+completion`` for both sides and returns a dict of
    padded arrays; a reward model scores both and trains on the
    Bradley-Terry objective (``rl_tpu.objectives.llm.preference_loss``).
    """

    def __init__(self, rows: Sequence[dict]):
        self.rows = [dict(r) for r in rows]
        for r in self.rows:
            missing = {"prompt", "chosen", "rejected"} - set(r)
            if missing:
                raise ValueError(f"row missing {sorted(missing)}: {r}")

    @classmethod
    def from_jsonl(cls, path: str | Path) -> "PairwiseDataset":
        with open(path) as f:
            return cls([json.loads(l) for l in f if l.strip()])

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, i: int) -> dict:
        return self.rows[i]

    def tokenize(self, tokenizer, max_len: int, *, pad_id: int = 0) -> dict:
        chosen = [r["prompt"] + r["chosen"] for r in self.rows]
        rejected = [r["prompt"] + r["rejected"] for r in self.rows]
        c_ids, c_mask = tokenize_batch(chosen, tokenizer, max_len, pad_id=pad_id)
        r_ids, r_mask = tokenize_batch(rejected, tokenizer, max_len, pad_id=pad_id)
        return dict(chosen_tokens=c_ids, chosen_mask=c_mask,
                    rejected_tokens=r_ids, rejected_mask=r_mask)

    def batches(self, batch_size: int, *, seed: int = 0, shuffle: bool = True):
        """Yield row-lists of ``batch_size`` (last partial batch dropped)."""
        for idx in self.index_batches(batch_size, seed=seed, shuffle=shuffle):
            yield [self.rows[j] for j in idx]

    def index_batches(self, batch_size: int, *, seed: int = 0,
                      shuffle: bool = True):
        """Yield index arrays of ``batch_size`` — the row-aligned handle a
        memmap-tokenized copy (``TokenizedDatasetLoader``) indexes by."""
        order = np.arange(len(self.rows))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield order[i: i + batch_size]
