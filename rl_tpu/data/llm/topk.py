"""Top-k reward selection for LLM replay (expert-iteration style).

Counterpart of the reference ``TopKRewardSelector``
(``/root/reference/torchrl/data/llm/topk.py:16``): a write-side filter that
buffers completed dialogs per prompt and, once ``total_dialog_turns``
completions of the same prompt have accumulated, releases only the
``topk_size`` highest-reward ones to the buffer (the rest are dropped).
Used by expert-iteration / best-of-n SFT pipelines.
"""
from __future__ import annotations

from collections import defaultdict, deque
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["TopKRewardSelector"]


class TopKRewardSelector:
    """Write-filter: ``selector(items) -> released items`` (possibly empty).

    Items are host-side dicts (the LLM data plane) carrying at least
    ``prompt_key`` (str) and ``reward_key`` (scalar or per-token array —
    arrays are summed).  Feed every completed rollout through it before
    ``rb.extend``; it returns the top-k groups that just completed.
    """

    def __init__(self, total_dialog_turns: int, topk_size: int, *,
                 prompt_key: str = "text", reward_key: str = "reward",
                 verbose: bool = False):
        if topk_size > total_dialog_turns:
            raise ValueError(
                f"topk_size ({topk_size}) must be <= total_dialog_turns "
                f"({total_dialog_turns})")
        self.total_dialog_turns = int(total_dialog_turns)
        self.topk_size = int(topk_size)
        self.prompt_key = prompt_key
        self.reward_key = reward_key
        self.verbose = verbose
        self.queues: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.total_dialog_turns))

    def _score(self, item: dict) -> float:
        return float(np.sum(np.asarray(item[self.reward_key])))

    def __call__(self, items: Sequence[dict] | dict) -> list[dict]:
        if isinstance(items, dict):
            items = [items]
        released: list[dict] = []
        for item in items:
            prompt = item[self.prompt_key]
            if not isinstance(prompt, str):
                raise TypeError(f"prompt must be str, got {type(prompt)}")
            q = self.queues[prompt]
            q.append(item)
            if len(q) == self.total_dialog_turns:
                ranked = sorted(q, key=self._score, reverse=True)
                kept = ranked[: self.topk_size]
                if self.verbose:
                    print(f"TopK: releasing {len(kept)}/{len(q)} for "
                          f"prompt {prompt[:40]!r}")
                released.extend(kept)
                q.clear()
        return released

    def flush(self) -> list[dict]:
        """Release top-k of every partially-filled queue (end of epoch)."""
        released = []
        for q in self.queues.values():
            if q:
                ranked = sorted(q, key=self._score, reverse=True)
                released.extend(ranked[: self.topk_size])
                q.clear()
        return released
