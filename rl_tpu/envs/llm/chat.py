"""ChatEnv — conversation-as-environment for LLM RL.

Counterpart of ``/root/reference/torchrl/envs/llm/chat.py:60`` (``ChatEnv``)
and ``:542`` (``DatasetChatEnv``): reset draws a prompt, step appends the
policy's assistant message to the ``History`` and scores it with a pluggable
reward function.  Host-side env (text is NonTensor data) — it feeds the
device-side GRPO losses through tokenized batches; pairs with any engine
exposing ``generate(history) -> (text, token_ids, log_probs)``.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np

from rl_tpu.data.llm.history import History, Message

__all__ = ["ChatEnv", "DatasetChatEnv"]


class ChatEnv:
    """Single-turn-per-step chat env over a prompt source.

    Not an ``Env`` subclass: LLM text flows on the host (reference LLM envs
    are similarly outside the tensor contract).  API::

        state = env.reset(idx or None)   # History with system+user
        state, reward, done, info = env.step(state, assistant_text)
    """

    def __init__(
        self,
        prompts: Sequence[str] | Callable[[np.random.RandomState], str],
        *,
        system_prompt: str | None = None,
        reward_fn: Callable[[History, str], float] | None = None,
        max_turns: int = 1,
        seed: int = 0,
    ):
        self.prompts = prompts
        self.system_prompt = system_prompt
        self.reward_fn = reward_fn
        self.max_turns = int(max_turns)
        self._rng = np.random.RandomState(seed)

    def reset(self, idx: int | None = None) -> History:
        if callable(self.prompts):
            prompt = self.prompts(self._rng)
        else:
            if idx is None:
                idx = int(self._rng.randint(len(self.prompts)))
            prompt = self.prompts[idx]
        h = History()
        if self.system_prompt:
            h = h.append("system", self.system_prompt)
        return h.append("user", prompt)

    def step(self, state: History, assistant_text: str):
        state = state.append("assistant", assistant_text)
        reward = (
            float(self.reward_fn(state, assistant_text)) if self.reward_fn else 0.0
        )
        n_turns = sum(1 for m in state.messages if m.role == "assistant")
        done = n_turns >= self.max_turns
        return state, reward, done, {}

    def rollout_group(self, engine, *, group_size: int, idx: int | None = None):
        """Sample ``group_size`` completions of one prompt (the GRPO group;
        reference PromptGroupSampler/MCAdvantage pattern).

        ``engine(history) -> (text, token_ids, log_probs)``.
        Returns list of dicts with history/text/tokens/log_probs/reward.
        """
        prompt_state = self.reset(idx)
        out = []
        for _ in range(group_size):
            text, tokens, log_probs = engine(prompt_state)
            state, reward, done, info = self.step(prompt_state, text)
            out.append(
                dict(history=state, text=text, tokens=np.asarray(tokens),
                     log_probs=np.asarray(log_probs), reward=reward, done=done)
            )
        return out


class DatasetChatEnv(ChatEnv):
    """ChatEnv over (prompt, answer) pairs with an exact-match/contains
    reward — the GSM8K-style pattern (reference llm/envs GSM8K scorers)."""

    def __init__(self, dataset: Sequence[tuple[str, str]], *,
                 match: str = "contains", **kwargs):
        self.dataset = list(dataset)
        self._answers = {p: a for p, a in self.dataset}
        self.match = match
        super().__init__(
            [p for p, _ in self.dataset], reward_fn=self._score, **kwargs
        )

    def _score(self, history: History, response: str) -> float:
        prompt = next(
            (m.content for m in history.messages if m.role == "user"), None
        )
        answer = self._answers.get(prompt)
        if answer is None:
            return 0.0
        if self.match == "exact":
            return float(response.strip() == answer.strip())
        return float(answer.strip() in response)
