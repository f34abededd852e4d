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
import io
import re
import uuid
from typing import Any, Callable, Sequence

import numpy as np

from rl_tpu.data.llm.history import History

__all__ = [
    "KLRewardTransform", "RetrieveKL", "PolicyVersion",
    "PythonInterpreterTransform", "BrowserTransform",
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


class PolicyVersion:
    """Track the policy version and stamp it into collected data
    (reference ``PolicyVersion`` policy_version.py:27).

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

    def increment_version(self) -> Any:
        if self.version_type == "int":
            self.version += 1
        else:
            self.version = str(uuid.uuid4())
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
        blocks = _CODE_FENCE.findall(history.messages[-1].content)
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
        blocks = self._FENCE.findall(history.messages[-1].content)
        if not blocks:
            return history
        urls = [u.strip() for b in blocks for u in b.splitlines() if u.strip()]
        results = [self.fetch(u) for u in urls]
        return history.append("tool", "\n".join(results))
