"""LLM env transforms: KL reward shaping, policy versioning, tool execution.

Counterparts of ``/root/reference/torchrl/envs/llm/transforms/``:
``KLRewardTransform`` kl.py:159 / ``RetrieveKL`` (modern form),
``PolicyVersion`` policy_version.py:27, the python tool-execution transform
tools.py (``PythonInterpreter``), and the browser transform browser.py.

These are host-side (text flows on the host); the KL math itself is pure
numpy/jax over token log-prob arrays so it can also run inside the jitted
loss (GRPO already consumes ``ref_log_prob`` — see
``rl_tpu/objectives/llm/grpo.py``).
"""
from __future__ import annotations

import contextlib
import dataclasses
import io
import re
import uuid
from typing import Any, Callable, Sequence

import numpy as np

from rl_tpu.data.llm.history import History

__all__ = [
    "KLRewardTransform", "RetrieveKL", "PolicyVersion", "VersionChange",
    "PythonInterpreterTransform", "BrowserTransform",
    "AddThinkingPrompt", "TemplateTransform", "DataLoadingPrimer",
    "ToolTransform", "RetrieveLogProb", "KLComputation",
    "IncrementalTokenizer",
]


def _token_kl(log_probs, ref_log_probs, *, kind: str = "k3"):
    """Per-token KL(policy || ref) estimators.

    ``k1``: -log_ratio sample estimator; ``k3``: the low-variance estimator
    exp(d) - d - 1 with d = ref - policy (Schulman's k3; what the
    reference's GRPO/KL transforms use).
    """
    lp = np.asarray(log_probs, np.float32)
    ref = np.asarray(ref_log_probs, np.float32)
    d = ref - lp
    if kind == "k1":
        return -d
    if kind == "k3":
        return np.exp(d) - d - 1.0
    raise ValueError(f"unknown KL estimator {kind!r}")


class RetrieveKL:
    """Compute per-token KL between policy and reference log-probs and stash
    it in the batch (reference ``RetrieveKL``, kl.py modern path).

    ``ref_model``: callable ``(tokens) -> ref_log_probs`` (e.g.
    ``TransformersWrapper.log_probs_batch``); if the batch already carries
    ``ref_log_prob`` it is reused.
    """

    def __init__(self, ref_model: Callable | None = None, *,
                 log_prob_key: str = "log_probs",
                 ref_key: str = "ref_log_prob",
                 kl_key: str = "kl_penalty", estimator: str = "k3"):
        self.ref_model = ref_model
        self.log_prob_key = log_prob_key
        self.ref_key = ref_key
        self.kl_key = kl_key
        self.estimator = estimator

    def __call__(self, batch: dict) -> dict:
        batch = dict(batch)
        if self.ref_key not in batch:
            if self.ref_model is None:
                raise KeyError(
                    f"{self.ref_key!r} missing and no ref_model given")
            batch[self.ref_key] = np.asarray(
                self.ref_model(batch["tokens"]))
        batch[self.kl_key] = _token_kl(
            batch[self.log_prob_key], batch[self.ref_key],
            kind=self.estimator)
        return batch


class KLRewardTransform(RetrieveKL):
    """Subtract ``coef * KL(policy || ref)`` from the (per-token or scalar)
    reward (reference ``KLRewardTransform`` kl.py:159)."""

    def __init__(self, ref_model: Callable | None = None, *,
                 coef: float = 1.0, reward_key: str = "reward", **kw):
        super().__init__(ref_model, **kw)
        self.coef = float(coef)
        self.reward_key = reward_key

    def __call__(self, batch: dict) -> dict:
        batch = super().__call__(batch)
        kl = batch[self.kl_key]
        reward = np.asarray(batch.get(self.reward_key, 0.0), np.float32)
        if reward.ndim < kl.ndim:  # scalar reward: subtract summed penalty
            penalty = kl.sum(-1)
        else:
            penalty = kl
        batch[self.reward_key] = reward - self.coef * penalty
        return batch


@dataclasses.dataclass(frozen=True)
class VersionChange:
    """One recorded version-change event (reference ``VersionChange``,
    policy_version.py:19)."""

    timestamp: float
    old_version: Any
    new_version: Any


class PolicyVersion:
    """Track the policy version and stamp it into collected data
    (reference ``PolicyVersion`` policy_version.py:27).  Version changes
    are recorded in :attr:`history` as :class:`VersionChange` events.

    ``version_type="int"``: monotonically increasing counter;
    ``"uuid"``: fresh UUID per update.  Collectors call
    :meth:`increment_version` on weight updates; the transform writes
    ``policy_version`` into every batch so stale data can be filtered
    (pairs with ``PolicyAgeFilter``).
    """

    def __init__(self, version_type: str = "int"):
        if version_type not in ("int", "uuid"):
            raise ValueError("version_type must be 'int' or 'uuid'")
        self.version_type = version_type
        self.version: Any = 0 if version_type == "int" else str(uuid.uuid4())
        self.history: list[VersionChange] = []

    def increment_version(self) -> Any:
        import time

        old = self.version
        if self.version_type == "int":
            self.version += 1
        else:
            self.version = str(uuid.uuid4())
        self.history.append(
            VersionChange(time.time(), old, self.version))
        return self.version

    def __call__(self, batch: dict) -> dict:
        batch = dict(batch)
        batch["policy_version"] = self.version
        return batch


_CODE_FENCE = re.compile(r"```(?:python|py)\n(.*?)```", re.DOTALL)

_SAFE_BUILTINS = {
    "abs": abs, "min": min, "max": max, "sum": sum, "len": len,
    "range": range, "enumerate": enumerate, "zip": zip, "sorted": sorted,
    "map": map, "filter": filter, "round": round, "divmod": divmod,
    "int": int, "float": float, "str": str, "bool": bool, "list": list,
    "dict": dict, "set": set, "tuple": tuple, "print": print, "pow": pow,
    "all": all, "any": any, "repr": repr, "reversed": reversed,
}


class PythonInterpreterTransform:
    """Execute fenced ``python`` code blocks from the assistant's message and
    append the captured stdout as a ``tool`` message (reference tool
    execution transform, envs/llm/transforms/tools.py).

    Execution is restricted: a whitelisted builtin set, no ``import``
    statements unless the module is in ``allowed_modules``, wall-clock capped
    through a statement budget (``max_statements`` via sys.settrace is too
    slow; we rely on the caller's process-level timeout for hard walls —
    same posture as the reference, which delegates isolation to a service
    process).
    """

    def __init__(self, *, allowed_modules: Sequence[str] = ("math",),
                 max_output_chars: int = 2000):
        self.allowed_modules = tuple(allowed_modules)
        self.max_output_chars = int(max_output_chars)

    def _safe_import(self, name, *args, **kwargs):
        if name.split(".")[0] not in self.allowed_modules:
            raise ImportError(f"import of {name!r} is not allowed")
        return __import__(name, *args, **kwargs)

    def execute(self, code: str) -> str:
        stdout = io.StringIO()
        env = {"__builtins__": dict(_SAFE_BUILTINS,
                                    __import__=self._safe_import)}
        try:
            with contextlib.redirect_stdout(stdout):
                exec(code, env)  # noqa: S102 - sandboxed tool execution
        except BaseException as e:  # noqa: BLE001 - error text goes to model
            return f"{type(e).__name__}: {e}"
        out = stdout.getvalue()
        return out[: self.max_output_chars]

    def __call__(self, history: History) -> History:
        """Run all code blocks in the last assistant message; append one
        tool message with the results (no-op if no code present)."""
        if not history.messages or history.messages[-1].role != "assistant":
            return history
        blocks = _CODE_FENCE.findall(history.messages[-1].text)
        if not blocks:
            return history
        results = [self.execute(b) for b in blocks]
        return history.append("tool", "\n".join(results))


class BrowserTransform:
    """Web-browsing tool transform (reference browser transform,
    envs/llm/transforms/browser.py).

    The container has no network egress, so the fetcher is injected:
    ``fetcher(url) -> str``.  Commands are fenced ``browse`` blocks with
    one URL per line; results are appended as a ``tool`` message.
    """

    _FENCE = re.compile(r"```browse\n(.*?)```", re.DOTALL)

    def __init__(self, fetcher: Callable[[str], str], *,
                 max_output_chars: int = 4000,
                 allowed_prefixes: Sequence[str] = ("http://", "https://")):
        self.fetcher = fetcher
        self.max_output_chars = int(max_output_chars)
        self.allowed_prefixes = tuple(allowed_prefixes)

    def fetch(self, url: str) -> str:
        if not url.startswith(self.allowed_prefixes):
            return f"error: URL scheme not allowed: {url}"
        try:
            return str(self.fetcher(url))[: self.max_output_chars]
        except Exception as e:  # noqa: BLE001 - error text goes to model
            return f"error: {type(e).__name__}: {e}"

    def __call__(self, history: History) -> History:
        if not history.messages or history.messages[-1].role != "assistant":
            return history
        blocks = self._FENCE.findall(history.messages[-1].text)
        if not blocks:
            return history
        urls = [u.strip() for b in blocks for u in b.splitlines() if u.strip()]
        results = [self.fetch(u) for u in urls]
        return history.append("tool", "\n".join(results))


class AddThinkingPrompt:
    """Nudge the model to reconsider a (low-reward) response by injecting a
    "think again" prompt and continuing the conversation (reference
    ``AddThinkingPrompt``, envs/llm/transforms/reason.py:20).

    Operates on the host batch dict after a step::

        batch = AddThinkingPrompt(cond=lambda b: b["reward"] < 0.5)(batch)

    where ``batch`` has ``history`` (:class:`History`), ``reward`` and
    ``done``.  When ``cond(batch)`` is true:

    - ``edit_last_turn=True`` (with ``role="assistant"``): the last assistant
      message's ``<answer>...</answer>`` is replaced by the thinking prompt,
      so the model resumes mid-thought on the next turn.
    - ``edit_last_turn=False``: the prompt is appended as a new message under
      ``role`` ("user" nudges read as coach feedback, "assistant" as
      self-talk).
    - ``zero_reward`` (default: ``edit_last_turn``) zeroes the reward — the
      graded answer no longer exists in the history.
    - ``undo_done=True`` clears ``done`` so the rollout continues.
    """

    PROMPTS_SELF = (
        "Hold on — I should re-examine that reasoning before answering...",
        "Wait, let me re-derive this step by step...",
        "Hmm, that may be wrong. Re-checking each step...",
        "Let me reconsider; I might have slipped somewhere...",
    )
    PROMPTS_COACH = (
        "Hold on — re-examine that reasoning before answering.",
        "That may be wrong. Re-check each step carefully.",
        "Try again, thinking through it step by step.",
    )

    def __init__(self, cond: Callable[[dict], bool], *,
                 prompt: str | None = None, random_prompt: bool = False,
                 role: str = "assistant", edit_last_turn: bool = True,
                 zero_reward: bool | None = None, undo_done: bool = True,
                 seed: int = 0):
        if role not in ("user", "assistant"):
            raise ValueError("role must be 'user' or 'assistant'")
        if edit_last_turn and role != "assistant":
            raise ValueError("edit_last_turn requires role='assistant'")
        self.cond = cond
        self._prompt = prompt
        self.random_prompt = random_prompt
        self.role = role
        self.edit_last_turn = edit_last_turn
        self.zero_reward = edit_last_turn if zero_reward is None else zero_reward
        self.undo_done = undo_done
        self._rng = np.random.RandomState(seed)

    @property
    def prompt(self) -> str:
        if self._prompt is not None and not self.random_prompt:
            return self._prompt
        pool = (self.PROMPTS_SELF if self.role == "assistant"
                else self.PROMPTS_COACH)
        if self.random_prompt:
            return pool[int(self._rng.randint(len(pool)))]
        return pool[0]

    _ANSWER_SPAN = re.compile(r"<answer>.*?</answer>", re.DOTALL)

    def _strip_answer(self, content: str) -> str:
        """Drop the answer span (and a trailing eos marker) and splice the
        thinking prompt where it was."""
        content = re.sub(r"<\|im_end\|>\s*$", "", content)
        if self._ANSWER_SPAN.search(content):
            content = self._ANSWER_SPAN.sub("", content).rstrip()
        return (content + "\n" + self.prompt).lstrip()

    def __call__(self, batch: dict) -> dict:
        if not self.cond(batch):
            return batch
        batch = dict(batch)
        history: History = batch["history"]
        if (self.edit_last_turn and history.messages
                and history.messages[-1].role == "assistant"):
            last = history.messages[-1]
            edited = dataclasses.replace(
                last, content=self._strip_answer(last.text))
            history = History(history.messages[:-1] + (edited,))
        else:
            history = history.append(self.role, self.prompt)
        batch["history"] = history
        if self.zero_reward and "reward" in batch:
            batch["reward"] = np.zeros_like(np.asarray(batch["reward"], np.float32))
        if self.undo_done and "done" in batch:
            batch["done"] = np.zeros_like(np.asarray(batch["done"], bool))
        return batch


class TemplateTransform:
    """Render a :class:`History` to engine-ready text and parse the engine's
    raw completion back (reference ``TemplateTransform``,
    envs/llm/transforms/format.py:18).

    Forward: ``render(history) -> str`` via the tokenizer's chat template
    when available (``apply_chat_template(..., tokenize=False)``), else the
    History's chatml renderer.  Inverse: ``parse(raw) -> str`` strips the
    generation scaffold (leading role header, trailing eos/im_end) so the
    stored assistant message is clean text.
    """

    def __init__(self, tokenizer=None, *, eos_tokens: Sequence[str] =
                 ("<|im_end|>", "</s>", "<|endoftext|>")):
        self.tokenizer = tokenizer
        self.eos_tokens = tuple(eos_tokens)

    def render(self, history: History, *, add_generation_prompt: bool = True) -> str:
        tok = self.tokenizer
        if tok is not None and hasattr(tok, "apply_chat_template"):
            try:
                return tok.apply_chat_template(
                    history.to_chats(), tokenize=False,
                    add_generation_prompt=add_generation_prompt)
            except (TypeError, ValueError):
                pass  # tokenizer without a text-mode template: chatml below
        return history.render(add_generation_prompt)

    def parse(self, raw: str) -> str:
        text = raw
        m = re.match(r"\s*<\|im_start\|>assistant\n", text)
        if m:
            text = text[m.end():]
        for eos in self.eos_tokens:
            idx = text.find(eos)
            if idx >= 0:
                text = text[:idx]
        eos = getattr(self.tokenizer, "eos_token", None)
        if eos:
            text = text.split(eos)[0]
        return text.strip()

    __call__ = render


class DataLoadingPrimer:
    """Feed prompts (or any per-reset fields) from a dataloader into env
    resets (reference ``DataLoadingPrimer``, envs/llm/transforms/
    dataloading.py — the transform that turns a dataset iterator into reset
    data).

    ``dataloader`` is any iterable of dicts (or a factory returning one).
    Draws cycle endlessly: when the iterator is exhausted a fresh one is made
    (via the factory, or ``iter()`` over the same sequence).  ``repeats=k``
    serves each underlying sample ``k`` consecutive times — the GRPO
    group-sampling pattern where one prompt yields a group of completions
    (reference `repeats` arg; pairs with
    :class:`rl_tpu.objectives.llm.MCAdvantage`).

    Use standalone (``primer.draw()``) or as the prompt source of a
    :class:`rl_tpu.envs.llm.ChatEnv` (``ChatEnv(primer.prompt_fn())``).
    """

    def __init__(self, dataloader, *, repeats: int = 1,
                 prompt_key: str = "query"):
        if repeats < 1:
            raise ValueError("repeats must be >= 1")
        self._source = dataloader
        self.repeats = int(repeats)
        self.prompt_key = prompt_key
        self._it = None
        self._pending: list[dict] = []
        self._epoch = 0

    def _make_iter(self):
        src = self._source() if callable(self._source) else self._source
        return iter(src)

    def reset_dataloader(self) -> None:
        self._it = None
        self._pending.clear()

    def draw(self) -> dict:
        """Next sample dict (each served ``repeats`` times in a row)."""
        if self._pending:
            return self._pending.pop()
        if self._it is None:
            self._it = self._make_iter()
        try:
            sample = next(self._it)
        except StopIteration:
            self._epoch += 1
            self._it = self._make_iter()
            sample = next(self._it)  # empty dataloader raises loudly here
        sample = dict(sample)
        self._pending = [dict(sample) for _ in range(self.repeats - 1)]
        return sample

    def prompt_fn(self) -> Callable:
        """Adapter: ``ChatEnv(prompts=primer.prompt_fn())``; the full sample
        of the latest draw stays available as ``primer.last_sample``."""
        def _draw(rng) -> str:
            self.last_sample = self.draw()
            return str(self.last_sample[self.prompt_key])
        return _draw


class ToolTransform:
    """Generic named-tool execution over fenced JSON calls (reference
    ``MCPToolTransform``, envs/llm/transforms/tools.py — the registry-of-
    callables form of tool use; the python/browser transforms above are the
    specialized forms).

    Tools are ``{name: callable(**kwargs) -> Any}``.  The assistant invokes
    them with fenced blocks::

        ```tool
        {"name": "lookup", "arguments": {"key": "x"}}
        ```

    Each call's result (or error text — errors go back to the model, never
    raise) is appended as one ``tool`` message.  Non-JSON or unknown-tool
    blocks produce an error message in-band, matching the reference posture.
    """

    _FENCE = re.compile(r"```tool\n(.*?)```", re.DOTALL)

    def __init__(self, tools: dict[str, Callable], *,
                 max_output_chars: int = 4000):
        self.tools = dict(tools)
        self.max_output_chars = int(max_output_chars)

    def execute(self, block: str) -> str:
        import json

        try:
            call = json.loads(block)
            name = call["name"]
        except (ValueError, TypeError, KeyError) as e:
            return f"error: malformed tool call ({type(e).__name__}: {e})"
        fn = self.tools.get(name)
        if fn is None:
            return (f"error: unknown tool {name!r}; available: "
                    f"{sorted(self.tools)}")
        try:
            result = fn(**call.get("arguments", {}))
        except Exception as e:  # noqa: BLE001 - error text goes to model
            return f"error: {type(e).__name__}: {e}"
        return str(result)[: self.max_output_chars]

    def __call__(self, history: History) -> History:
        if not history.messages or history.messages[-1].role != "assistant":
            return history
        blocks = self._FENCE.findall(history.messages[-1].text)
        if not blocks:
            return history
        for block in blocks:
            history = history.append("tool", self.execute(block))
        return history


class RetrieveLogProb:
    """Score a batch's token sequences under a (reference) model and stash
    the per-token log-probs (reference ``RetrieveLogProb``,
    envs/llm/transforms/kl.py:561 — the composable piece that
    ``RetrieveKL`` builds from twice: once for the generating model, once
    for the reference model).

    ``model``: callable ``(tokens) -> per-token log-probs`` (full-sequence;
    e.g. ``TransformersWrapper.log_probs_batch``).  When
    ``response_mask_key`` is present in the batch, prompt positions are
    zeroed so downstream KL terms only count assistant tokens (the
    reference's assistant-token masking).
    """

    def __init__(self, model: Callable, *, out_key: str = "ref_log_prob",
                 tokens_key: str = "tokens",
                 response_mask_key: str = "response_mask"):
        self.model = model
        self.out_key = out_key
        self.tokens_key = tokens_key
        self.response_mask_key = response_mask_key

    def __call__(self, batch: dict) -> dict:
        batch = dict(batch)
        lp = np.asarray(self.model(batch[self.tokens_key]), np.float32)
        mask = batch.get(self.response_mask_key)
        if mask is not None:
            lp = lp * np.asarray(mask, np.float32)
        batch[self.out_key] = lp
        return batch


class KLComputation:
    """Combine two stored log-prob fields into a KL estimate and (optionally)
    a shaped reward (reference ``KLComputation``, envs/llm/transforms/
    kl.py:1369 — the terminal stage of the modern ``RetrieveKL`` pipeline).

    Unlike :class:`RetrieveKL` (which scores the reference model itself),
    this is pure arithmetic over keys already in the batch — so it can sit
    after any pair of :class:`RetrieveLogProb` stages, or after a collector
    that recorded behaviour log-probs.  ``coef`` is a plain attribute so a
    trainer hook can anneal it mid-run.
    """

    def __init__(self, *, gen_key: str = "log_probs",
                 ref_key: str = "ref_log_prob", kl_key: str = "kl_penalty",
                 reward_key: str | None = "reward", coef: float = 1.0,
                 estimator: str = "k3"):
        self.gen_key = gen_key
        self.ref_key = ref_key
        self.kl_key = kl_key
        self.reward_key = reward_key
        self.coef = float(coef)
        self.estimator = estimator

    def __call__(self, batch: dict) -> dict:
        batch = dict(batch)
        kl = _token_kl(batch[self.gen_key], batch[self.ref_key],
                       kind=self.estimator)
        batch[self.kl_key] = kl
        if self.reward_key is not None and self.coef:
            reward = np.asarray(batch.get(self.reward_key, 0.0), np.float32)
            penalty = kl.sum(-1) if reward.ndim < kl.ndim else kl
            batch[self.reward_key] = reward - self.coef * penalty
        return batch


class IncrementalTokenizer:
    """Tokenize a growing conversation incrementally: only the text appended
    since the previous call is run through the tokenizer (reference
    ``IncrementalTokenizer``, envs/llm/transforms/tokenizer.py:328 — the
    KV-cache-friendly path where prompt tokens are never recomputed).

    ``__call__(text) -> np.ndarray`` of ALL token ids for ``text``.  When
    ``text`` extends the previously seen string, cached ids are reused and
    only the suffix is tokenized.  Exact for char-level tokenizers and for
    byte-level BPEs when growth happens on message boundaries (the chat
    case); ``validate_every=N`` cross-checks a full retokenization every N
    calls and repairs the cache on mismatch (cheap insurance against
    boundary-merging tokenizers).
    """

    def __init__(self, tokenizer: Callable, *, validate_every: int = 0):
        self.tokenizer = tokenizer
        self.validate_every = int(validate_every)
        self._text = ""
        self._ids = np.zeros((0,), np.int32)
        self._calls = 0

    def _tok(self, text: str) -> np.ndarray:
        ids = self.tokenizer(text)
        if isinstance(ids, dict):
            ids = ids["input_ids"]
        return np.asarray(ids, np.int32).reshape(-1)

    def reset(self) -> None:
        self._text = ""
        self._ids = np.zeros((0,), np.int32)

    def __call__(self, text: str) -> np.ndarray:
        self._calls += 1
        if text.startswith(self._text) and self._text:
            suffix = text[len(self._text):]
            ids = (np.concatenate([self._ids, self._tok(suffix)])
                   if suffix else self._ids)
        else:
            ids = self._tok(text)
        if self.validate_every and self._calls % self.validate_every == 0:
            full = self._tok(text)
            if not np.array_equal(full, ids):
                ids = full  # boundary merge: repair the cache
        self._text, self._ids = text, ids
        return ids
