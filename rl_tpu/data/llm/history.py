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

__all__ = ["ContentBlock", "Message", "History"]


@dataclasses.dataclass(frozen=True)
class ContentBlock:
    """One part of a structured message (reference ``ContentBase``,
    data/llm/history.py:374 — the multimodal content-parts container).

    ``type``: "text" | "image" | "tool_call" | "tool_result".  Text lives in
    ``text``; images carry a ``url`` (or data URI); tool calls carry
    ``name``/``arguments``.
    """

    type: str = "text"
    text: str = ""
    url: str | None = None
    name: str | None = None
    arguments: Any = None

    def to_part(self) -> dict:
        """OpenAI-style content-part dict."""
        if self.type == "text":
            return {"type": "text", "text": self.text}
        if self.type == "image":
            return {"type": "image_url", "image_url": {"url": self.url or ""}}
        if self.type == "tool_call":
            return {"type": "tool_call", "name": self.name,
                    "arguments": self.arguments}
        return {"type": self.type, "text": self.text}

    @classmethod
    def from_part(cls, part: dict) -> "ContentBlock":
        t = part.get("type", "text")
        if t == "image_url":
            url = part.get("image_url", {})
            return cls("image", url=url.get("url") if isinstance(url, dict) else str(url))
        if t == "tool_call":
            return cls("tool_call", name=part.get("name"),
                       arguments=part.get("arguments"))
        return cls(t, text=part.get("text", ""))


@dataclasses.dataclass(frozen=True)
class Message:
    role: str  # "system" | "user" | "assistant" | "tool"
    content: str | tuple[ContentBlock, ...]
    name: str | None = None

    @property
    def text(self) -> str:
        """Flattened text view (text blocks joined; str content as-is)."""
        if isinstance(self.content, str):
            return self.content
        return "\n".join(b.text for b in self.content if b.type == "text")

    @property
    def blocks(self) -> tuple[ContentBlock, ...]:
        if isinstance(self.content, str):
            return (ContentBlock("text", text=self.content),)
        return tuple(self.content)


class History:
    """Immutable-ish conversation; ``append`` returns a new History."""

    def __init__(self, messages: Sequence[Message] | None = None):
        self.messages: tuple[Message, ...] = tuple(messages or ())

    @classmethod
    def from_chats(cls, chats: Iterable[dict]) -> "History":
        """From OpenAI-style [{"role": ..., "content": ...}, ...]; ``content``
        may be a string or a content-parts list (multimodal)."""
        msgs = []
        for m in chats:
            content = m["content"]
            if not isinstance(content, str):
                content = tuple(ContentBlock.from_part(p) for p in content)
            msgs.append(Message(m["role"], content, m.get("name")))
        return cls(msgs)

    _IM_RE = None  # compiled lazily (class body avoids import-order issues)

    @classmethod
    def from_text(cls, rendered: str) -> "History":
        """Parse a chatml-rendered conversation back into a History —
        inverse of :meth:`render` (reference ``History.from_text``,
        data/llm/history.py).  A trailing open ``<|im_start|>assistant``
        generation prompt is ignored; an unterminated final message is kept
        (partial generation)."""
        import re

        if cls._IM_RE is None:
            cls._IM_RE = re.compile(
                r"<\|im_start\|>(\w+)\n(.*?)(?:<\|im_end\|>|$)", re.DOTALL)
        msgs = []
        for role, content in cls._IM_RE.findall(rendered):
            content = content.rstrip("\n")
            if not content and role == "assistant":
                continue  # bare generation prompt
            msgs.append(Message(role, content))
        return cls(msgs)

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
        out = []
        for m in self.messages:
            content = (m.content if isinstance(m.content, str)
                       else [b.to_part() for b in m.content])
            out.append({"role": m.role, "content": content}
                       | ({"name": m.name} if m.name else {}))
        return out

    # -- rendering ----------------------------------------------------------
    def render(self, add_generation_prompt: bool = True) -> str:
        """Simple chat-template rendering (chatml-style); a HF tokenizer's
        ``apply_chat_template`` takes precedence when provided to
        :meth:`to_tokens`."""
        parts = [
            f"<|im_start|>{m.role}\n{m.text}<|im_end|>\n" for m in self.messages
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
        inner = "\n".join(f"  [{m.role}] {m.text[:60]!r}" for m in self.messages)
        return f"History(\n{inner}\n)"
