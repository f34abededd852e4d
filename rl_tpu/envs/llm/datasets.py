"""Task-specific LLM dataset environments.

Counterparts of ``/root/reference/torchrl/envs/llm/datasets/``:
``CountdownEnv`` (countdown.py:81 + the procedural problem generator :22),
``GSM8KEnv`` (gsm8k.py:143), ``MATHEnv`` (math.py:27), ``IFEvalEnv``
(ifeval.py:96).  Host-side envs over the :class:`rl_tpu.envs.llm.ChatEnv`
contract; the engine/tokenizer stays pluggable and rewards come from the
scorers in :mod:`rl_tpu.envs.llm.reward`.

No-egress posture: the reference pulls these datasets from the HF hub; here
each env accepts an in-memory row sequence or a local JSONL path, and
``download=True`` is rejected with the local-file contract named (the same
convention as ``rl_tpu/data/datasets.py``).
"""
from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Any, Callable, Sequence

from rl_tpu.data.llm.history import History
from rl_tpu.envs.llm.chat import ChatEnv, DatasetChatEnv
from rl_tpu.envs.llm.reward import (
    CountdownScorer,
    GSM8KRewardScorer,
    IFEvalScorer,
    MathScorer,
)

__all__ = [
    "CountdownProblemGenerator", "CountdownEnv", "GSM8KEnv", "MATHEnv",
    "IFEvalEnv", "load_jsonl",
]


def load_jsonl(path: str | Path) -> list[dict]:
    """Read a local JSONL file into a list of row dicts."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


class CountdownProblemGenerator:
    """Infinite procedural Countdown problem source (reference
    ``_CountdownProblemGenerator``, datasets/countdown.py:22).

    Each draw picks ``num_count`` integers in ``[1, max_number]`` and builds a
    reachable target by folding a random subset through ``+ - *`` (division is
    excluded from target *construction* so targets stay integral; the model may
    still use ``/`` in its answer).  Yields
    ``{"query": str, "answer": {"target": int, "numbers": [int, ...]}}``.
    """

    def __init__(self, *, num_count: int = 4, max_number: int = 100,
                 max_target: int = 1000, seed: int | None = None):
        self.num_count = int(num_count)
        self.max_number = int(max_number)
        self.max_target = int(max_target)
        self._rng = random.Random(seed)

    def _reachable_target(self, numbers: list[int]) -> tuple[int, str]:
        """(target, solution expression).  The RNG call sequence is
        identical to the pre-solution version, so seeded target streams
        are unchanged.  When the fold lands negative the solution is the
        MIRRORED fold (negate the base, swap +/−, keep ×): the mirror of a
        left fold equals its negation term-by-term, so the expression
        evaluates to abs(acc) exactly."""
        pool = list(numbers)
        self._rng.shuffle(pool)
        acc = pool[0]
        ops = []
        for n in pool[1:]:
            op = self._rng.randrange(3)
            ops.append(op)
            acc = acc + n if op == 0 else acc - n if op == 1 else acc * n
        negate = acc < 0
        acc = abs(acc)
        if acc == 0 or acc > self.max_target:
            # always reachable and within num_count*max_number
            return sum(numbers), "+".join(str(n) for n in pool)
        return acc, self._fold_expression(pool, ops, negate)

    @staticmethod
    def _fold_expression(pool: list[int], ops: list[int],
                         negate: bool) -> str:
        expr = ("-" if negate else "") + str(pool[0])
        has_addsub = False  # top-level +/− present (needs parens before ×)
        for n, op in zip(pool[1:], ops):
            if negate:
                op = (1, 0, 2)[op]  # mirror + <-> − under negation
            ch = "+-*"[op]
            if ch == "*" and has_addsub:
                expr = f"({expr})"
                has_addsub = False
            expr += ch + str(n)
            if ch in "+-":
                has_addsub = True
        return expr

    def __iter__(self):
        return self

    def __next__(self) -> dict[str, Any]:
        numbers = [self._rng.randint(1, self.max_number)
                   for _ in range(self.num_count)]
        target, solution = self._reachable_target(numbers)
        query = (
            f"Numbers: {numbers}. Target: {target}. Build an arithmetic "
            f"expression equal to the target, using each number at most once "
            f"and only +, -, *, / and parentheses."
        )
        return {"query": query,
                "answer": {"target": target, "numbers": numbers},
                "solution": solution}


class CountdownEnv(ChatEnv):
    """Countdown numbers-game env (reference ``CountdownEnv``,
    datasets/countdown.py:81): procedural problems, no external dataset, the
    standard quick-iteration GRPO debug task.

    ``reset`` draws a fresh problem; the ground truth for the drawn prompt is
    tracked internally so the scorer sees the matching ``answer``.
    """

    SYSTEM_PROMPT = (
        "You are given source numbers and a target. Find an arithmetic "
        "expression over the source numbers (each used at most once; only "
        "+, -, *, / and parentheses) that equals the target. Reason inside "
        "<think></think> tags, then give ONLY the expression inside "
        "<answer></answer> tags."
    )

    def __init__(self, *, num_count: int = 4, max_number: int = 100,
                 max_target: int = 1000, seed: int = 0,
                 scorer: CountdownScorer | None = None, **kwargs):
        self._gen = CountdownProblemGenerator(
            num_count=num_count, max_number=max_number, max_target=max_target,
            seed=seed)
        self.scorer = scorer or CountdownScorer()
        self._current: dict[str, Any] | None = None
        kwargs.setdefault("system_prompt", self.SYSTEM_PROMPT)
        super().__init__(self._draw, reward_fn=self._score, seed=seed, **kwargs)

    def _draw(self, rng) -> str:
        self._current = next(self._gen)
        return self._current["query"]

    @property
    def current_answer(self) -> dict[str, Any] | None:
        return None if self._current is None else self._current["answer"]

    def _score(self, history: History, response: str) -> float:
        if self._current is None:
            return 0.0
        return float(self.scorer(response, self._current["answer"]))

    def score_detail(self, response: str) -> dict:
        """Breakdown dict for the current problem (reward_answer/think/right/
        success — the reference parser's output keys)."""
        if self._current is None:
            raise RuntimeError("reset() before score_detail()")
        return self.scorer.detail(response, self._current["answer"])


class GSM8KEnv(DatasetChatEnv):
    """GSM8K grade-school-math env (reference ``GSM8KEnv``,
    datasets/gsm8k.py:143).  Rows: ``{"question": ..., "answer": ...}``
    (the HF layout) or ``(question, answer)`` pairs; local JSONL path accepted.
    """

    SYSTEM_PROMPT = (
        "Solve the math word problem. Think step by step inside "
        "<think></think> tags, then give the final numeric answer after "
        "'####' (for example: #### 42)."
    )

    def __init__(self, dataset: Sequence | str | Path, *,
                 scorer: Callable | None = None, **kwargs):
        rows = load_jsonl(dataset) if isinstance(dataset, (str, Path)) else dataset
        pairs = [
            (r["question"], r["answer"]) if isinstance(r, dict) else tuple(r)
            for r in rows
        ]
        self.scorer = scorer or GSM8KRewardScorer()
        kwargs.setdefault("system_prompt", self.SYSTEM_PROMPT)
        super().__init__(pairs, **kwargs)

    def _score(self, history: History, response: str) -> float:
        prompt = next(
            (m.content for m in history.messages if m.role == "user"), None)
        answer = self._answers.get(prompt)
        return 0.0 if answer is None else float(self.scorer(response, answer))


class MATHEnv(GSM8KEnv):
    """Competition-math env (reference ``MATHEnv``, datasets/math.py:27).
    Rows: ``{"problem": ..., "solution": ...}`` (the HF MATH layout) with the
    ground truth inside ``\\boxed{}``; scored by :class:`MathScorer`."""

    SYSTEM_PROMPT = (
        "Solve the problem. Reason inside <think></think> tags, then give the "
        "final answer inside <answer></answer> tags."
    )

    def __init__(self, dataset: Sequence | str | Path, *,
                 scorer: Callable | None = None, **kwargs):
        rows = load_jsonl(dataset) if isinstance(dataset, (str, Path)) else dataset
        pairs = [
            (r["problem"], r["solution"]) if isinstance(r, dict) else tuple(r)
            for r in rows
        ]
        super().__init__(pairs, scorer=scorer or MathScorer(), **kwargs)


class IFEvalEnv(ChatEnv):
    """Instruction-following env (reference ``IFEvalEnv``,
    datasets/ifeval.py:96).  Rows carry a prompt plus its constraint list:
    ``{"prompt": str, "constraints": [(name, kwargs), ...]}`` — the in-image
    analogue of IFEval's ``instruction_id_list``/``kwargs`` columns.  Reward =
    fraction of constraints satisfied (:class:`IFEvalScorer` per row).
    """

    SYSTEM_PROMPT = (
        "Follow the user's instructions exactly, including any formatting "
        "constraints they state."
    )

    def __init__(self, dataset: Sequence[dict] | str | Path, *, seed: int = 0,
                 **kwargs):
        rows = load_jsonl(dataset) if isinstance(dataset, (str, Path)) else list(dataset)
        self.rows = [dict(r) for r in rows]
        self._scorers = [
            IFEvalScorer([tuple(c) for c in r.get("constraints", ())])
            for r in self.rows
        ]
        self._by_prompt = {
            r["prompt"]: s for r, s in zip(self.rows, self._scorers)
        }
        kwargs.setdefault("system_prompt", self.SYSTEM_PROMPT)
        super().__init__([r["prompt"] for r in self.rows],
                         reward_fn=self._score, seed=seed, **kwargs)

    def _score(self, history: History, response: str) -> float:
        prompt = next(
            (m.content for m in history.messages if m.role == "user"), None)
        scorer = self._by_prompt.get(prompt)
        return 0.0 if scorer is None else float(scorer(response))
