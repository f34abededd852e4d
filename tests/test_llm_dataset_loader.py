"""TokenizedDatasetLoader / get_dataloader (VERDICT r4 missing #5 —
reference /root/reference/torchrl/data/llm/dataset.py:26,317)."""
import json

import numpy as np
import pytest

from rl_tpu.data.llm import (TokenizedDatasetLoader, create_infinite_iterator,
                             get_dataloader)

CHARS = "0123456789+=$_abcdef "


def char_tok(text):
    return [CHARS.index(c) for c in text if c in CHARS]


class CountingTok:
    def __init__(self):
        self.calls = 0

    def __call__(self, text):
        self.calls += 1
        return char_tok(text)


class TestTokenizedDatasetLoader:
    def test_tokenize_pad_truncate(self, tmp_path):
        rows = ["12+34=46$", "7+8=15$", "1" * 50]
        out = TokenizedDatasetLoader(rows, char_tok, 12,
                                     root_dir=tmp_path).load()
        ids, mask = out["input_ids"], out["attention_mask"]
        assert ids.shape == (3, 12) and mask.shape == (3, 12)
        assert ids.dtype == np.int32
        np.testing.assert_array_equal(ids[0, :9], char_tok("12+34=46$"))
        assert not mask[0, 9:].any() and (ids[0, 9:] == 0).all()
        assert mask[2].all()  # truncated row fully attended

    def test_resume_skips_tokenizer(self, tmp_path):
        rows = [f"{i}+{i}=" for i in range(40)]
        tok = CountingTok()
        loader = TokenizedDatasetLoader(rows, tok, 8, root_dir=tmp_path)
        first = loader.load()
        assert tok.calls == 40
        second = TokenizedDatasetLoader(rows, tok, 8,
                                        root_dir=tmp_path).load()
        assert tok.calls == 40  # cache hit: tokenizer never called again
        np.testing.assert_array_equal(np.asarray(first["input_ids"]),
                                      np.asarray(second["input_ids"]))

    def test_changed_corpus_invalidates(self, tmp_path):
        tok = CountingTok()
        TokenizedDatasetLoader(["a", "b"], tok, 4, root_dir=tmp_path).load()
        TokenizedDatasetLoader(["a", "c"], tok, 4, root_dir=tmp_path).load()
        assert tok.calls == 4  # re-tokenized: fingerprint changed

    def test_jsonl_source_and_valid_truncation(self, tmp_path):
        p = tmp_path / "corpus.jsonl"
        p.write_text("".join(json.dumps({"text": f"{i}+1="}) + "\n"
                             for i in range(30)))
        out = TokenizedDatasetLoader(
            str(p), char_tok, 8, root_dir=tmp_path / "c", split="valid",
            valid_size=5).load()
        assert out["input_ids"].shape[0] == 5

    def test_pre_tokenization_hook(self, tmp_path):
        out = TokenizedDatasetLoader(
            ["keep1", "drop", "keep2"], char_tok, 8, root_dir=tmp_path,
            pre_tokenization_hook=lambda ts: [t for t in ts if "keep" in t],
        ).load()
        assert out["input_ids"].shape[0] == 2


class TestGetDataloader:
    def test_shapes_and_infinite(self, tmp_path):
        rows = [f"{i % 10}+{i % 7}=" for i in range(20)]
        it = get_dataloader(8, 6, rows, char_tok, root_dir=tmp_path, seed=0)
        seen = [next(it) for _ in range(6)]  # > one epoch (20//8 = 2/epoch)
        for b in seen:
            assert b["input_ids"].shape == (8, 6)
            assert b["attention_mask"].shape == (8, 6)

    def test_finite_drops_ragged_tail(self, tmp_path):
        rows = [f"{i}=" for i in range(10)]
        batches = list(get_dataloader(4, 4, rows, char_tok,
                                      root_dir=tmp_path, infinite=False))
        assert len(batches) == 2  # 10 rows, B=4 -> tail of 2 dropped

    def test_shuffle_determinism(self, tmp_path):
        rows = [f"{i:02d}=" for i in range(16)]
        a = next(get_dataloader(16, 4, rows, char_tok, root_dir=tmp_path,
                                seed=7))
        b = next(get_dataloader(16, 4, rows, char_tok,
                                root_dir=tmp_path / "x", seed=7))
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])

    def test_infinite_iterator_helper(self):
        it = create_infinite_iterator(lambda: iter([1, 2]))
        assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]
