"""LLMEnv — generic text/token generation environment.

Counterpart of the reference ``LLMEnv``
(``/root/reference/torchrl/envs/llm/envs.py:44``): observation is a string
(or token array), the action (response text/tokens) is concatenated onto it
to form the next observation; prompts are drawn from a dataloader on reset;
``eos_token_id`` sets the done flag.  Host-side (text is NonTensor data) —
the device boundary is the tokenized batch handed to the GRPO/SFT losses,
same split as the reference's vLLM-driven flow.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Sequence

import numpy as np

__all__ = ["LLMEnv"]


class LLMEnv:
    """Prompt-continuation env.

    API (host-side, mirrors :class:`rl_tpu.envs.llm.ChatEnv`)::

        obs = env.reset()                    # {"text": ...} or {"tokens": ...}
        obs, reward, done, info = env.step(obs, action)

    ``from_text=True``: observations/actions are strings under ``text`` /
    ``text_response``; otherwise integer arrays under ``tokens`` /
    ``tokens_response`` (+ ``attention_mask`` when ``has_attention``).

    ``assign_reward``: write a zero per-token reward of the action's shape at
    each step (the reference's dense-reward scaffold for later transforms);
    done is set when ``eos_token_id`` appears in the response or after
    ``max_steps`` steps.
    """

    _DEFAULT_TOKEN_KEY = "tokens"
    _DEFAULT_STR_KEY = "text"
    _DEFAULT_ATTENTION_KEY = "attention_mask"
    _DEFAULT_ACTION_TOKENS_KEY = "tokens_response"
    _DEFAULT_ACTION_STR_KEY = "text_response"

    def __init__(
        self,
        *,
        dataloader: Iterable | None = None,
        from_text: bool = True,
        token_key: str | None = None,
        str_key: str | None = None,
        attention_key: str | None = None,
        action_key: str | None = None,
        reward_key: str = "reward",
        vocab_size: int | None = None,
        has_attention: bool = True,
        assign_reward: bool = False,
        eos_token_id: int | None = None,
        max_steps: int | None = None,
        transforms: Sequence[Callable] = (),
    ):
        self.from_text = bool(from_text)
        self.token_key = token_key or self._DEFAULT_TOKEN_KEY
        self.str_key = str_key or self._DEFAULT_STR_KEY
        self.attention_key = attention_key or self._DEFAULT_ATTENTION_KEY
        self.action_key = action_key or (
            self._DEFAULT_ACTION_STR_KEY if from_text
            else self._DEFAULT_ACTION_TOKENS_KEY)
        self.reward_key = reward_key
        self.vocab_size = vocab_size
        self.has_attention = bool(has_attention)
        self.assign_reward = bool(assign_reward)
        self.eos_token_id = eos_token_id
        self.max_steps = max_steps
        self.transforms = list(transforms)
        self._dataloader = dataloader
        self._dl_iter: Iterator | None = None

    @classmethod
    def from_dataloader(cls, dataloader, **kwargs) -> "LLMEnv":
        """Reference ``LLMEnv.from_dataloader`` (envs.py:273)."""
        return cls(dataloader=dataloader, **kwargs)

    # -- helpers ------------------------------------------------------------
    def _next_prompt(self):
        if self._dataloader is None:
            raise RuntimeError("no dataloader; pass prompts via reset(obs=...)")
        if self._dl_iter is None:
            self._dl_iter = iter(self._dataloader)
        try:
            return next(self._dl_iter)
        except StopIteration:
            self._dl_iter = iter(self._dataloader)
            return next(self._dl_iter)

    def _apply_transforms(self, obs: dict) -> dict:
        for t in self.transforms:
            obs = t(obs)
        return obs

    # -- env API ------------------------------------------------------------
    def reset(self, obs: dict | None = None) -> dict:
        if obs is None:
            item = self._next_prompt()
            obs = item if isinstance(item, dict) else (
                {self.str_key: item} if self.from_text
                else {self.token_key: np.asarray(item)})
        obs = dict(obs)
        obs["step_count"] = 0
        obs["done"] = False
        if not self.from_text and self.has_attention:
            obs.setdefault(
                self.attention_key,
                np.ones_like(np.asarray(obs[self.token_key])))
        return self._apply_transforms(obs)

    def step(self, obs: dict, action) -> tuple[dict, Any, bool, dict]:
        obs = dict(obs)
        if self.from_text:
            if not isinstance(action, str):
                raise TypeError("from_text=True expects a str action")
            obs[self.action_key] = action
            obs[self.str_key] = obs[self.str_key] + action
            done = False
        else:
            action = np.asarray(action)
            if self.vocab_size is not None and action.size:
                if int(action.max()) >= self.vocab_size:
                    raise ValueError("action token out of vocabulary")
            obs[self.action_key] = action
            obs[self.token_key] = np.concatenate(
                [np.asarray(obs[self.token_key]), action], axis=-1)
            if self.has_attention:
                obs[self.attention_key] = np.ones_like(obs[self.token_key])
            done = bool(self.eos_token_id is not None
                        and (action == self.eos_token_id).any())
        obs["step_count"] = obs.get("step_count", 0) + 1
        if self.max_steps is not None and obs["step_count"] >= self.max_steps:
            done = True
        reward: Any = 0.0
        if self.assign_reward:
            shape = (len(action),) if self.from_text else action.shape
            reward = np.zeros(shape, np.float32)
        obs["done"] = done
        obs = self._apply_transforms(obs)
        # transforms may rewrite reward (e.g. KL penalty) or done
        reward = obs.pop(self.reward_key, reward)
        done = bool(obs.get("done", done))
        return obs, reward, done, {}
