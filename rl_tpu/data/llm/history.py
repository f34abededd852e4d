"""History — the chat-conversation container of the LLM stack.

Counterpart of the reference ``History`` tensorclass
(``/root/reference/torchrl/data/llm/history.py:465`` + ``ContentBase``
:374): an append-only list of ``(role, content)`` messages with chat-template
rendering and tokenization hooks.  Host-side object (text never enters jit);
token tensors produced by :meth:`to_tokens` are padded TDicts ready for the
device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Iterable, Sequence

import numpy as np

from rl_tpu.data.tdict import TDict

__all__ = ["Message", "History"]


@dataclasses.dataclass(frozen=True)
class Message:
    role: str  # "system" | "user" | "assistant" | "tool"
    content: str
    name: str | None = None


class History:
    """Immutable-ish conversation; ``append`` returns a new History."""

    def __init__(self, messages: Sequence[Message] | None = None):
        self.messages: tuple[Message, ...] = tuple(messages or ())

    @classmethod
    def from_chats(cls, chats: Iterable[dict]) -> "History":
        """From OpenAI-style [{"role": ..., "content": ...}, ...]."""
        return cls([Message(m["role"], m["content"], m.get("name")) for m in chats])

    def append(self, role: str, content: str, name: str | None = None) -> "History":
        return History(self.messages + (Message(role, content, name),))

    def extend(self, other: "History") -> "History":
        return History(self.messages + other.messages)

    def __len__(self) -> int:
        return len(self.messages)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return History(self.messages[i])
        return self.messages[i]

    @property
    def last(self) -> Message | None:
        return self.messages[-1] if self.messages else None

    def to_chats(self) -> list[dict]:
        return [
            {"role": m.role, "content": m.content}
            | ({"name": m.name} if m.name else {})
            for m in self.messages
        ]

    # -- rendering ----------------------------------------------------------
    def render(self, add_generation_prompt: bool = True) -> str:
        """Simple chat-template rendering (chatml-style); a HF tokenizer's
        ``apply_chat_template`` takes precedence when provided to
        :meth:`to_tokens`."""
        parts = [
            f"<|im_start|>{m.role}\n{m.content}<|im_end|>\n" for m in self.messages
        ]
        if add_generation_prompt:
            parts.append("<|im_start|>assistant\n")
        return "".join(parts)

    def to_tokens(self, tokenizer, max_len: int | None = None,
                  add_generation_prompt: bool = True) -> TDict:
        """Tokenize to a padded TDict(tokens, attention_mask)."""
        if hasattr(tokenizer, "apply_chat_template"):
            ids = tokenizer.apply_chat_template(
                self.to_chats(), add_generation_prompt=add_generation_prompt
            )
        else:
            ids = tokenizer(self.render(add_generation_prompt))
            if isinstance(ids, dict):
                ids = ids["input_ids"]
        ids = np.asarray(ids, np.int32).reshape(-1)
        if max_len is not None:
            pad = max(0, max_len - len(ids))
            mask = np.concatenate([np.ones(len(ids), bool), np.zeros(pad, bool)])[:max_len]
            ids = np.concatenate([ids, np.zeros(pad, np.int32)])[:max_len]
        else:
            mask = np.ones(len(ids), bool)
        return TDict(tokens=ids, attention_mask=mask)

    def __repr__(self):
        inner = "\n".join(f"  [{m.role}] {m.content[:60]!r}" for m in self.messages)
        return f"History(\n{inner}\n)"
