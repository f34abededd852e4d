"""Dataset reward scorers for LLM RL.

Counterparts of the reference dataset reward scorers
(``/root/reference/torchrl/envs/llm/reward/`` — GSM8K answer extraction and
IFEval-style instruction checking).  Pure host-side functions:
``scorer(response_text, expected) -> reward`` (float), pluggable into
:class:`rl_tpu.envs.llm.ChatEnv` / :class:`DatasetChatEnv` as ``reward_fn``.
"""
from __future__ import annotations

import ast
import re
from fractions import Fraction
from typing import Any, Callable, Sequence

__all__ = [
    "GSM8KRewardScorer", "IFEvalScorer", "extract_gsm8k_answer",
    "extract_tags", "CountdownScorer", "MathScorer",
]

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

    # -- extended registry (reference ifeval instruction families:
    #    envs/llm/reward/ifeval/ — keywords/length/format/case/structure) --
    @staticmethod
    def _check_num_paragraphs(text, *, n, sep="\n\n"):
        return len([p for p in text.split(sep) if p.strip()]) == n

    @staticmethod
    def _check_num_sentences(text, *, min=None, max=None):  # noqa: A002
        count = len([s for s in re.split(r"[.!?]+", text) if s.strip()])
        return (min is None or count >= min) and (max is None or count <= max)

    @staticmethod
    def _check_first_word(text, *, word):
        parts = text.split()
        return bool(parts) and parts[0].strip(".,!?:;\"'").lower() == word.lower()

    @staticmethod
    def _check_keyword_frequency(text, *, keyword, n, relation="at_least"):
        count = text.lower().count(keyword.lower())
        return count >= n if relation == "at_least" else (
            count <= n if relation == "at_most" else count == n)

    @staticmethod
    def _check_all_lowercase(text):
        return text == text.lower()

    @staticmethod
    def _check_all_uppercase(text):
        return text == text.upper()

    @staticmethod
    def _check_num_capital_words(text, *, min=None, max=None):  # noqa: A002
        count = len([w for w in text.split() if w.isupper() and w.isalpha()])
        return (min is None or count >= min) and (max is None or count <= max)

    @staticmethod
    def _check_title(text):
        """Response starts with a <<title>> line (ifeval title format)."""
        return re.match(r"\s*<<[^<>\n]+>>", text) is not None

    @staticmethod
    def _check_postscript(text, *, marker="P.S."):
        return marker in text

    @staticmethod
    def _check_num_placeholders(text, *, n):
        """At least n [bracketed] placeholders (ifeval detectable_content)."""
        return len(re.findall(r"\[[^\[\]]+\]", text)) >= n

    @staticmethod
    def _check_num_sections(text, *, n, marker="Section"):
        return len(re.findall(re.escape(marker) + r"\s+\d", text)) == n

    @staticmethod
    def _check_json_keys(text, *, keys):
        import json

        try:
            obj = json.loads(text.strip())
        except (ValueError, TypeError):
            return False
        return isinstance(obj, dict) and set(keys) <= set(obj)

    @staticmethod
    def _check_quoted_response(text):
        t = text.strip()
        return len(t) >= 2 and t[0] == '"' and t[-1] == '"'

    @staticmethod
    def _check_no_commas(text):
        return "," not in text

    def __call__(self, response: str, expected: Any = None) -> float:
        if not self.constraints:
            return 0.0
        ok = 0
        for name, kwargs in self.constraints:
            if getattr(self, f"_check_{name}")(str(response), **kwargs):
                ok += 1
        return ok / len(self.constraints)


# ---------------------------------------------------------------------------
# <think>/<answer> tag protocol (shared by Countdown / MATH scorers)
# ---------------------------------------------------------------------------

_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)
_TAG_ANSWER_RE = re.compile(r"<answer>(.*?)</answer>", re.DOTALL)


def extract_tags(text: str) -> tuple[str, str]:
    """Split a response into ``(chain_of_thought, answer)`` using the
    ``<think>``/``<answer>`` tag protocol (the reference GRPO recipe format;
    reference envs/llm/reward/countdown.py ``extract_tags``).  Missing or
    malformed tags yield empty strings."""
    think = _THINK_RE.search(text)
    answer = _TAG_ANSWER_RE.search(text)
    return (think.group(1).strip() if think else "",
            answer.group(1).strip() if answer else "")


class CountdownScorer:
    """Scorer for the Countdown numbers game (reference
    ``CountdownRewardParser``, envs/llm/reward/countdown.py:18).

    The model gets source numbers and a target and must emit an arithmetic
    expression inside ``<answer>`` tags that evaluates to the target, using
    each source number at most once (only ``+ - * /`` and parentheses).

    Reward convention (the standard GRPO shaping):
    ``correct_reward`` (1.0) for a valid, correct expression;
    ``format_reward`` (0.1) for a well-formed ``<answer>`` that is wrong;
    0.0 otherwise.  :meth:`detail` additionally returns the reference's
    breakdown keys (``reward_answer``/``reward_think``/``reward_right``/
    ``success``).

    ``expected`` may be a ``{"target": int, "numbers": [int, ...]}`` mapping
    or the serialized ``"target=T, numbers=a,b,c"`` string form.
    """

    def __init__(self, *, correct_reward: float = 1.0,
                 format_reward: float = 0.1):
        self.correct_reward = float(correct_reward)
        self.format_reward = float(format_reward)

    # -- ground truth -------------------------------------------------------
    @staticmethod
    def parse_ground_truth(expected: Any) -> tuple[int, list[int]]:
        if isinstance(expected, dict):
            return int(expected["target"]), [int(n) for n in expected["numbers"]]
        text = str(expected)
        tm = re.search(r"target\s*=\s*(-?\d+)", text)
        nm = re.search(r"numbers\s*=\s*([\d,\s]+)", text)
        if not tm or not nm:
            raise ValueError(f"unparseable countdown ground truth: {expected!r}")
        numbers = [int(n) for n in re.findall(r"\d+", nm.group(1))]
        return int(tm.group(1)), numbers

    # -- expression validation ---------------------------------------------
    _ALLOWED_NODES = (ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant,
                      ast.Add, ast.Sub, ast.Mult, ast.Div, ast.USub, ast.UAdd)

    @classmethod
    def _safe_eval(cls, expression: str) -> float | None:
        """Evaluate an arithmetic expression via an AST whitelist (no eval of
        arbitrary code; only + - * / and unary signs over numeric literals)."""
        try:
            tree = ast.parse(expression, mode="eval")
        except SyntaxError:
            return None
        for node in ast.walk(tree):
            if not isinstance(node, cls._ALLOWED_NODES):
                return None
            if isinstance(node, ast.Constant) and not isinstance(
                    node.value, (int, float)):
                return None
        try:
            return float(eval(compile(tree, "<countdown>", "eval"),  # noqa: S307
                              {"__builtins__": {}}))
        except (ZeroDivisionError, OverflowError, ValueError):
            return None

    @classmethod
    def validate_expression(cls, expression: str, target: int,
                            numbers: Sequence[int]) -> bool:
        """True iff *expression* uses each source number at most once and
        evaluates to *target* (tolerance 1e-6 for division chains)."""
        # reject decimal literals outright: "3.5" would decompose into
        # source numbers 3 and 5 under the integer-token scan below, letting
        # a non-source literal pass the availability check (reward-hacking
        # channel; the reference parser shares the quirk — ADVICE r4)
        if "." in expression:
            return False
        used = [int(n) for n in re.findall(r"\d+", expression)]
        available = list(numbers)
        for n in used:
            if n in available:
                available.remove(n)
            else:
                return False
        value = cls._safe_eval(expression)
        return value is not None and abs(value - target) < 1e-6

    # -- scoring ------------------------------------------------------------
    def detail(self, response: str, expected: Any) -> dict:
        target, numbers = self.parse_ground_truth(expected)
        cot, expression = extract_tags(str(response))
        has_answer = bool(expression)
        correct = has_answer and self.validate_expression(
            expression, target, numbers)
        if correct:
            reward = self.correct_reward
        elif has_answer:
            reward = self.format_reward
        else:
            reward = 0.0
        return dict(reward_answer=float(has_answer),
                    reward_think=float(bool(cot)),
                    reward_right=reward, reward=reward, success=correct)

    def __call__(self, response: str, expected: Any) -> float:
        return self.detail(response, expected)["reward"]


_BOXED_RE = re.compile(r"\\boxed\{")


def _extract_boxed(text: str) -> str | None:
    """Pull the content of the last ``\\boxed{...}`` (brace-balanced — regex
    alone cannot handle nested ``\\frac{}{}``)."""
    last = None
    for m in _BOXED_RE.finditer(text):
        depth, start = 1, m.end()
        for i in range(start, len(text)):
            c = text[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    last = text[start:i]
                    break
    return last


class MathScorer:
    """Scorer for competition-math answers (reference ``MATHRewardParser``,
    envs/llm/reward/math.py:21).

    Prediction comes from ``<answer>`` tags (fallback: last ``\\boxed{}`` in
    the response); ground truth from the solution's ``\\boxed{}`` (fallback:
    the raw string).  Comparison: LaTeX-light normalization, then exact
    rational comparison via ``fractions.Fraction`` when both sides parse as
    numbers/fractions, else normalized string equality — the in-image
    analogue of the reference's optional ``math_verify`` path.
    """

    def __init__(self, *, correct_reward: float = 1.0,
                 format_reward: float = 0.1):
        self.correct_reward = float(correct_reward)
        self.format_reward = float(format_reward)

    _STRIP_CMDS = re.compile(
        r"\\(?:left|right|,|;|!|:|mathrm|text|textbf|mathbf|displaystyle)\b")
    _FRAC = re.compile(r"\\[td]?frac\{([^{}]+)\}\{([^{}]+)\}")

    @classmethod
    def normalize(cls, answer: str) -> str:
        s = answer.strip().strip("$").strip()
        s = cls._STRIP_CMDS.sub("", s)
        for _ in range(4):  # unnest simple fracs
            s, n = cls._FRAC.subn(r"(\1)/(\2)", s)
            if not n:
                break
        s = s.replace("\\cdot", "*").replace("\\times", "*")
        s = s.replace("{", "").replace("}", "").replace(" ", "")
        s = s.replace("dfrac", "frac")
        s = s.rstrip(".")
        # drop thousands separators in plain numbers: 1,234 -> 1234
        s = re.sub(r"(?<=\d),(?=\d{3}\b)", "", s)
        # peel redundant whole-string parens: (4) -> 4
        while (len(s) > 2 and s[0] == "(" and s[-1] == ")"
               and s.count("(") == 1 and s.count(")") == 1):
            s = s[1:-1]
        return s

    @staticmethod
    def _as_fraction(s: str) -> Fraction | None:
        m = re.fullmatch(r"\(?(-?[\d.]+)\)?/\(?(-?[\d.]+)\)?", s)
        try:
            if m:
                return Fraction(m.group(1)) / Fraction(m.group(2))
            return Fraction(s)
        except (ValueError, ZeroDivisionError):
            return None

    @classmethod
    def answers_match(cls, got: str, target: str) -> bool:
        ng, nt = cls.normalize(got), cls.normalize(target)
        if ng == nt:
            return True
        fg, ft = cls._as_fraction(ng), cls._as_fraction(nt)
        return fg is not None and ft is not None and fg == ft

    def detail(self, response: str, expected: str) -> dict:
        response = str(response)
        cot, got = extract_tags(response)
        if not got:
            got = _extract_boxed(response) or ""
        target = _extract_boxed(str(expected))
        if target is None:
            target = str(expected).strip()
        has_answer = bool(got)
        correct = has_answer and self.answers_match(got, target)
        if correct:
            reward = self.correct_reward
        elif has_answer:
            reward = self.format_reward
        else:
            reward = 0.0
        return dict(reward_answer=float(has_answer),
                    reward_think=float(bool(cot)),
                    reward_right=reward, reward=reward, success=correct)

    def __call__(self, response: str, expected: str) -> float:
        return self.detail(response, expected)["reward"]
