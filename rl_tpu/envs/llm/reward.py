"""Dataset reward scorers for LLM RL.

Counterparts of the reference dataset reward scorers
(``/root/reference/torchrl/envs/llm/reward/`` — GSM8K answer extraction and
IFEval-style instruction checking).  Pure host-side functions:
``scorer(response_text, expected) -> reward`` (float), pluggable into
:class:`rl_tpu.envs.llm.ChatEnv` / :class:`DatasetChatEnv` as ``reward_fn``.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Sequence

__all__ = ["GSM8KRewardScorer", "IFEvalScorer", "extract_gsm8k_answer"]

_ANSWER_RE = re.compile(r"####\s*([\-0-9.,/]+)")
_NUMBER_RE = re.compile(r"-?\d[\d,]*(?:\.\d+)?")


def extract_gsm8k_answer(text: str) -> str | None:
    """Pull the final numeric answer: the ``#### N`` marker if present, else
    the last number in the text (the reference's extraction order)."""
    m = _ANSWER_RE.search(text)
    if m:
        return m.group(1).replace(",", "").strip().rstrip(".")
    nums = _NUMBER_RE.findall(text)
    if nums:
        return nums[-1].replace(",", "")
    return None


class GSM8KRewardScorer:
    """GSM8K-style scorer: graded reward for format + correctness.

    Mirrors the reference's shaped GSM8K reward: full credit for a correct
    boxed/``####`` answer, partial credit for a correct number without the
    format marker, small credit for producing *a* number, zero otherwise.
    """

    def __init__(self, *, correct: float = 1.0, correct_unformatted: float = 0.9,
                 has_number: float = 0.1, wrong: float = 0.0):
        self.correct = correct
        self.correct_unformatted = correct_unformatted
        self.has_number = has_number
        self.wrong = wrong

    def __call__(self, response: str, expected: str) -> float:
        target = extract_gsm8k_answer(str(expected))
        got = extract_gsm8k_answer(str(response))
        if got is None or target is None:
            return self.wrong
        try:
            match = abs(float(got) - float(target)) < 1e-6
        except ValueError:
            match = got == target
        if match:
            return (self.correct if _ANSWER_RE.search(str(response))
                    else self.correct_unformatted)
        return self.has_number


class IFEvalScorer:
    """Instruction-following scorer: fraction of constraints satisfied
    (IFEval pattern).  Constraints are ``(name, kwargs)`` pairs from the
    supported registry: ``contains``, ``not_contains``, ``min_words``,
    ``max_words``, ``starts_with``, ``ends_with``, ``num_bullets``,
    ``json_format``, ``regex``.
    """

    def __init__(self, constraints: Sequence[tuple[str, dict]]):
        self.constraints = list(constraints)
        for name, _ in self.constraints:
            if not hasattr(self, f"_check_{name}"):
                raise ValueError(f"unknown constraint {name!r}")

    # -- checks -------------------------------------------------------------
    @staticmethod
    def _check_contains(text, *, substring, case_sensitive=False):
        t, s = (text, substring) if case_sensitive else (
            text.lower(), substring.lower())
        return s in t

    @staticmethod
    def _check_not_contains(text, *, substring, case_sensitive=False):
        return not IFEvalScorer._check_contains(
            text, substring=substring, case_sensitive=case_sensitive)

    @staticmethod
    def _check_min_words(text, *, n):
        return len(text.split()) >= n

    @staticmethod
    def _check_max_words(text, *, n):
        return len(text.split()) <= n

    @staticmethod
    def _check_starts_with(text, *, prefix):
        return text.lstrip().startswith(prefix)

    @staticmethod
    def _check_ends_with(text, *, suffix):
        return text.rstrip().endswith(suffix)

    @staticmethod
    def _check_num_bullets(text, *, n):
        bullets = [l for l in text.splitlines()
                   if l.lstrip().startswith(("-", "*", "•"))]
        return len(bullets) == n

    @staticmethod
    def _check_json_format(text):
        import json

        try:
            json.loads(text.strip())
            return True
        except (ValueError, TypeError):
            return False

    @staticmethod
    def _check_regex(text, *, pattern):
        return re.search(pattern, text) is not None

    def __call__(self, response: str, expected: Any = None) -> float:
        if not self.constraints:
            return 0.0
        ok = 0
        for name, kwargs in self.constraints:
            if getattr(self, f"_check_{name}")(str(response), **kwargs):
                ok += 1
        return ok / len(self.constraints)
