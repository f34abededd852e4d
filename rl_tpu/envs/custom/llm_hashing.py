"""LLM hashing env: token-append generation with hashed observations.

Counterpart of ``/root/reference/torchrl/envs/custom/llm.py``
(``LLMHashingEnv`` :25): each step appends the chosen token to the
sequence and exposes a hash of the full prefix as the observation — the
trick that lets MCTS forests index huge text states by a fixed-size key.

TPU adaptation: the reference grows the token tensor every step (dynamic
shape); here the sequence lives in a fixed ``max_len`` buffer with a
length counter, and the hash is a rolling 32-bit FNV-1a combine
``h' = (h XOR token) * prime`` — updated incrementally per step, so the
whole env is jittable and scannable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["LLMHashingEnv"]

_FNV_PRIME = jnp.uint32(16777619)
_FNV_OFFSET = jnp.uint32(2166136261)


def _fnv_combine(h, token):
    return (h ^ jnp.asarray(token, jnp.uint32)) * _FNV_PRIME


class LLMHashingEnv(Env):
    """Token-generation env with hashed prefix observations.

    ``prompt``: initial token ids (fixed at construction — the functional
    counterpart of the reference's prompt-carrying reset td).
    """

    def __init__(self, vocab_size: int, *, max_len: int = 128, prompt=None):
        self.vocab_size = int(vocab_size)
        self.max_len = int(max_len)
        self.prompt = (
            jnp.zeros((0,), jnp.int32) if prompt is None
            else jnp.asarray(prompt, jnp.int32)
        )
        if self.prompt.shape[0] >= self.max_len:
            raise ValueError("prompt longer than max_len")

    @property
    def observation_spec(self) -> Composite:
        return Composite(
            observation=Categorical(
                self.vocab_size, (self.max_len,), jnp.int32
            ),
            length=Unbounded((1,), jnp.int32),
            hashing=Unbounded((1,), jnp.uint32),
        )

    def _action_spec(self):
        return Categorical(self.vocab_size, (), jnp.int32)

    def _obs(self, state) -> TDict:
        return TDict(
            observation=state["tokens"],
            length=state["length"],
            hashing=state["hash"],
        )

    def _reset(self, key):
        P = self.prompt.shape[0]
        tokens = jnp.zeros((self.max_len,), jnp.int32)
        tokens = tokens.at[:P].set(self.prompt) if P else tokens
        h = _FNV_OFFSET
        for tok in self.prompt:  # static prompt → unrolled, traced once
            h = _fnv_combine(h, tok)
        state = TDict(
            tokens=tokens,
            length=jnp.full((1,), P, jnp.int32),
            hash=jnp.asarray(h, jnp.uint32).reshape(1),
        )
        return state, self._obs(state)

    def _step(self, state, td, key):
        action = jnp.asarray(td["action"], jnp.int32).reshape(())
        length = state["length"][0]
        in_range = length < self.max_len
        idx = jnp.minimum(length, self.max_len - 1)
        tokens = jnp.where(
            in_range, state["tokens"].at[idx].set(action), state["tokens"]
        )
        h = jnp.where(
            in_range, _fnv_combine(state["hash"][0], action),
            state["hash"][0],
        )
        new_len = jnp.where(in_range, length + 1, length)
        new_state = TDict(
            tokens=tokens, length=new_len.reshape(1), hash=h.reshape(1)
        )
        truncated = (new_len >= self.max_len).reshape(1)
        return new_state, self._obs(new_state).update(TDict(
            reward=jnp.zeros((1,), jnp.float32),
            terminated=jnp.zeros((1,), bool),
            truncated=truncated,
        ))
