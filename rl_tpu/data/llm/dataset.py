"""Tokenize-once → memmap prompt/corpus datasets (+ resumable reload).

Counterpart of the reference ``TokenizedDatasetLoader`` / ``get_dataloader``
(``/root/reference/torchrl/data/llm/dataset.py:26,317``): a corpus is
tokenized ONCE, persisted as flat ``.npy`` memmaps under
``<root_dir>/<split>/<max_length>/`` next to a JSON index, and later runs
reload the memmap instantly (no re-tokenization) — the preprocessed-corpus
path SFT/RM/DPO training needs at any scale.  TPU-native shape: plain
numpy memmaps (zero-copy into ``jax.device_put``) instead of
MemoryMappedTensor, and the dataloader yields fixed-shape ``[B, L]``
batches so the consuming jit never retraces.

No hub downloads happen here (zero-egress image): ``source`` is a local
jsonl/txt path, a sequence of rows, or any iterable of rows (an HF
``datasets.Dataset`` object duck-types via iteration).
"""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Any, Callable, Iterable, Iterator, Sequence

import numpy as np

__all__ = ["TokenizedDatasetLoader", "create_infinite_iterator",
           "get_dataloader"]


def _rows_from_source(source, text_key: str) -> Iterable[str]:
    """Yield raw text rows from a path / sequence / iterable source."""
    if isinstance(source, (str, Path)):
        path = Path(source)
        with open(path) as f:
            if path.suffix == ".jsonl":
                for line in f:
                    if line.strip():
                        row = json.loads(line)
                        yield row[text_key] if isinstance(row, dict) else row
            else:  # one document per line
                for line in f:
                    if line.rstrip("\n"):
                        yield line.rstrip("\n")
        return
    for row in source:
        if isinstance(row, dict):
            yield row[text_key]
        else:
            yield row


class TokenizedDatasetLoader:
    """Tokenize a text corpus once and cache it as ``[N, max_length]``
    memmaps; subsequent :meth:`load` calls (same root/split/max_length)
    reload the cache without touching the tokenizer.

    Args:
        source: jsonl/txt path, sequence of rows, or iterable of rows
            (dicts with ``text_key`` or plain strings).
        tokenizer_fn: ``text -> sequence of int token ids`` (a HF
            tokenizer's ``__call__``-returning-input_ids works via
            ``lambda t: tok(t)["input_ids"]``).
        max_length: rows are truncated / right-padded to this length.

    Keyword Args:
        root_dir: cache root (default ``~/.cache/rl_tpu/data``).
        split: cache namespace; splits starting with ``"valid"`` are
            truncated to ``valid_size`` rows (reference semantics).
        valid_size: see ``split``. Default 2000.
        text_key: dict-row text field. Default ``"text"``.
        pad_id: padding token id. Default 0.
        pre_tokenization_hook: called with the full row list before
            tokenization (dataset-level filtering, reference kwarg).
    """

    def __init__(self, source, tokenizer_fn: Callable[[str], Sequence[int]],
                 max_length: int, *, root_dir: str | Path | None = None,
                 split: str = "train", valid_size: int = 2000,
                 text_key: str = "text", pad_id: int = 0,
                 pre_tokenization_hook: Callable | None = None):
        self.source = source
        self.tokenizer_fn = tokenizer_fn
        self.max_length = int(max_length)
        self.root_dir = Path(root_dir if root_dir is not None
                             else Path.home() / ".cache" / "rl_tpu" / "data")
        self.split = split
        self.valid_size = int(valid_size)
        self.text_key = text_key
        self.pad_id = int(pad_id)
        self.pre_tokenization_hook = pre_tokenization_hook

    @property
    def data_dir(self) -> Path:
        return self.root_dir / self.split / str(self.max_length)

    # -- cache key ----------------------------------------------------------
    @staticmethod
    def _fingerprint(texts: Sequence[str]) -> str:
        """Cheap corpus identity: count + head/tail samples (documented
        approximation — a mid-corpus edit with identical count and ends
        will NOT invalidate the cache; delete the cache dir to force)."""
        h = hashlib.sha1(str(len(texts)).encode())
        for t in list(texts[:16]) + list(texts[-16:]):
            h.update(t.encode())
        return h.hexdigest()

    # -- load ---------------------------------------------------------------
    def load(self) -> dict:
        """Returns ``{"input_ids": [N, L] int32 memmap, "attention_mask":
        [N, L] bool memmap}`` (read-only views onto the cache files)."""
        texts = list(_rows_from_source(self.source, self.text_key))
        if self.pre_tokenization_hook is not None:
            texts = list(self.pre_tokenization_hook(texts))
        if self.split.startswith("valid"):
            texts = texts[: self.valid_size]
        fp = self._fingerprint(texts)
        meta_path = self.data_dir / "meta.json"
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            if meta.get("fingerprint") == fp:
                return self._open(meta["num_rows"])
        return self._tokenize_and_write(texts, fp)

    def _open(self, n: int) -> dict:
        ids = np.load(self.data_dir / "input_ids.npy", mmap_mode="r")
        mask = np.load(self.data_dir / "attention_mask.npy", mmap_mode="r")
        if ids.shape != (n, self.max_length):
            raise ValueError(
                f"cache shape {ids.shape} != index ({n}, {self.max_length})"
                f" — delete {self.data_dir} and re-run")
        return {"input_ids": ids, "attention_mask": mask}

    def _tokenize_and_write(self, texts: Sequence[str], fp: str) -> dict:
        os.makedirs(self.data_dir, exist_ok=True)
        n, L = len(texts), self.max_length
        ids = np.lib.format.open_memmap(
            self.data_dir / "input_ids.npy", mode="w+", dtype=np.int32,
            shape=(n, L))
        mask = np.lib.format.open_memmap(
            self.data_dir / "attention_mask.npy", mode="w+", dtype=bool,
            shape=(n, L))
        ids[:] = self.pad_id
        mask[:] = False
        for i, text in enumerate(texts):
            row = np.asarray(list(self.tokenizer_fn(text))[:L], np.int32)
            ids[i, : len(row)] = row
            mask[i, : len(row)] = True
        ids.flush()
        mask.flush()
        (self.data_dir / "meta.json").write_text(json.dumps({
            "num_rows": n, "max_length": L, "fingerprint": fp,
            "pad_id": self.pad_id}))
        return self._open(n)


def create_infinite_iterator(iterator_factory) -> Iterator:
    """Cycle forever over ``iterator_factory()`` (reference
    ``create_infinite_iterator`` — there over a finitely-iterable
    dataloader; a factory here since numpy iterators don't rewind)."""
    while True:
        yield from iterator_factory()


def get_dataloader(batch_size: int, block_size: int, source,
                   tokenizer_fn, *, infinite: bool = True,
                   shuffle: bool = True, seed: int = 0,
                   split: str = "train", root_dir=None,
                   device_put: bool = False, **loader_kwargs) -> Iterator[dict]:
    """Tokenize-once + batched iteration (reference ``get_dataloader``,
    dataset.py:317): yields ``{"input_ids": [B, block_size],
    "attention_mask": [B, block_size]}`` numpy (or device) batches; drops
    the ragged tail so shapes are jit-stable."""
    data = TokenizedDatasetLoader(
        source, tokenizer_fn, block_size, split=split, root_dir=root_dir,
        **loader_kwargs).load()
    n = data["input_ids"].shape[0]
    if n < batch_size:
        raise ValueError(f"corpus has {n} rows < batch_size {batch_size}")
    rng = np.random.RandomState(seed)

    def epoch():
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = np.sort(order[start: start + batch_size])
            batch = {k: np.asarray(v[idx]) for k, v in data.items()}
            if device_put:
                import jax

                batch = {k: jax.device_put(v) for k, v in batch.items()}
            yield batch

    return create_infinite_iterator(epoch) if infinite else epoch()
