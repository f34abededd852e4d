"""LLM policy wrappers over external engines.

Counterparts of the reference LLM policy layer
(``/root/reference/torchrl/modules/llm/policies/``: ``TransformersWrapper``
(2,828 LoC), ``vLLMWrapper``, ``SGLangWrapper``).  The engines themselves
(vLLM/SGLang) are not in this image; the HF transformers backend is, so
``TransformersWrapper`` provides the reference's host-side contract:
generate completions and score per-token log-probs for GRPO/SFT training.
Everything returns padded numpy/TDict batches ready for the device-side
losses (rl_tpu.objectives.llm).
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from rl_tpu.data import TDict
from rl_tpu.data.llm import History

__all__ = ["TransformersWrapper", "vLLMWrapper", "SGLangWrapper"]


class TransformersWrapper:
    """Wrap a HF causal-LM (torch) as a ChatEnv engine + log-prob scorer.

    * ``generate(history) -> (text, token_ids, log_probs)`` — the ChatEnv
      engine protocol;
    * ``log_probs_batch(prompts_tokens, response_tokens)`` — per-token
      log-probs under the CURRENT weights (the GRPO "new policy" pass);
    * response masks mark which positions contribute to losses.
    """

    def __init__(self, model, tokenizer, *, max_new_tokens: int = 32,
                 temperature: float = 1.0, do_sample: bool = True):
        self.model = model
        self.tokenizer = tokenizer
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = float(temperature)
        self.do_sample = do_sample

    # -- engine protocol ----------------------------------------------------
    def generate(self, history: History):
        import torch

        prompt_ids = self._encode_history(history)
        input_ids = torch.tensor([prompt_ids], dtype=torch.long)
        with torch.no_grad():
            out = self.model.generate(
                input_ids,
                max_new_tokens=self.max_new_tokens,
                do_sample=self.do_sample,
                temperature=self.temperature,
                pad_token_id=self._pad_id(),
                return_dict_in_generate=True,
                output_scores=True,
            )
        seq = out.sequences[0]
        response_ids = seq[len(prompt_ids):].tolist()
        log_probs = []
        for score, tok in zip(out.scores, response_ids):
            lp = torch.log_softmax(score[0], dim=-1)[tok]
            log_probs.append(float(lp))
        text = self.tokenizer.decode(response_ids, skip_special_tokens=True)
        return text, response_ids, log_probs

    # -- scoring ------------------------------------------------------------
    @staticmethod
    def build_scoring_batch(prompt_ids: Sequence[Sequence[int]],
                            response_ids: Sequence[Sequence[int]],
                            pad: int):
        """Pad prompt+response rows into the EXACT batch ``generate()``
        implies: ``attention_mask`` masks pad ids wherever they appear
        (including inside the prompt — HF infers the mask from
        pad_token_id), and ``position_ids`` are the mask cumsum (HF derives
        positions the same way, so masked prompt positions shift later
        tokens' learned positions).  Returns numpy
        ``(tokens, attn, pos, response_mask)`` all ``[B, L]``; shared by the
        no-grad behaviour pass and the differentiable training pass so the
        two can never drift (the GRPO ratio is silently wrong for every
        non-longest row otherwise — found driving a real HF GPT2)."""
        rows = [(list(p), list(r)) for p, r in zip(prompt_ids, response_ids)]
        L = max(len(p) + len(r) for p, r in rows)
        tokens = np.full((len(rows), L), pad, np.int64)
        mask = np.zeros((len(rows), L), bool)
        attn = np.zeros((len(rows), L), np.int64)
        for i, (p, r) in enumerate(rows):
            tokens[i, : len(p) + len(r)] = p + r
            mask[i, len(p): len(p) + len(r)] = True
            attn[i, : len(p)] = (np.asarray(p) != pad).astype(np.int64)
            attn[i, len(p): len(p) + len(r)] = 1
        pos = np.maximum(np.cumsum(attn, axis=1) - 1, 0)
        return tokens, attn, pos, mask

    @staticmethod
    def score_tokens(model, tokens, attn, pos):
        """Per-token log-probs of *tokens* under *model* — DIFFERENTIABLE
        (no ``no_grad``): the training-side pass for GRPO/SFT updates of the
        HF model itself.  ``out[i, j]`` scores ``tokens[i, j]`` given the
        prefix; position 0 is 0.  Returns a torch tensor ``[B, L]``."""
        import torch

        t = torch.as_tensor(tokens)
        logits = model(t, attention_mask=torch.as_tensor(attn),
                       position_ids=torch.as_tensor(pos)).logits  # [B, L, V]
        logp = torch.log_softmax(logits[:, :-1], dim=-1)
        token_logp = logp.gather(-1, t[:, 1:].unsqueeze(-1)).squeeze(-1)
        return torch.nn.functional.pad(token_logp, (1, 0))  # [B, L]

    def log_probs_batch(self, prompt_ids: Sequence[Sequence[int]],
                        response_ids: Sequence[Sequence[int]]) -> TDict:
        """Score responses under current weights; returns padded
        TDict(tokens, log_probs, response_mask) [B, L]."""
        import torch

        tokens, attn, pos, mask = self.build_scoring_batch(
            prompt_ids, response_ids, self._pad_id())
        with torch.no_grad():
            out_logp = self.score_tokens(self.model, tokens, attn, pos)
        return TDict(
            tokens=tokens.astype(np.int32),
            log_probs=out_logp.numpy().astype(np.float32),
            response_mask=mask,
        )

    # -- weight sync --------------------------------------------------------
    def update_weights(self, state_dict) -> None:
        """Load a trained state-dict into the wrapped engine model — the
        trainer→engine push target for :class:`LLMEngineWeightSync`
        (reference: the NCCL trainer→vLLM broadcast, vllm_nccl.py:46-97;
        here the engine is colocated so the push is a state-dict load)."""
        self.model.load_state_dict(state_dict)

    def grpo_log_prob_fn(self):
        """Adapter for GRPOLoss(policy_log_prob_fn=...): host re-scoring."""

        def fn(params, td):
            # params unused: HF weights live in the wrapped torch model
            return np.asarray(td["log_probs"])

        return fn

    # -- helpers ------------------------------------------------------------
    def _encode_history(self, history: History) -> list[int]:
        if hasattr(self.tokenizer, "apply_chat_template"):
            try:
                return list(self.tokenizer.apply_chat_template(
                    history.to_chats(), add_generation_prompt=True
                ))
            except Exception:
                pass
        enc = self.tokenizer(history.render())
        # HF returns BatchEncoding (a UserDict, NOT a dict instance) —
        # iterating it yields key strings; index it explicitly
        try:
            return list(enc["input_ids"])
        except (TypeError, KeyError, IndexError):
            return list(enc)

    def _pad_id(self) -> int:
        pid = getattr(self.tokenizer, "pad_token_id", None)
        if pid is None:
            pid = getattr(self.tokenizer, "eos_token_id", 0)
        return int(pid or 0)


class vLLMWrapper:
    """Gated: the reference's vLLM generation engine wrapper
    (torchrl/modules/llm/policies/vllm_wrapper.py) — vLLM is not in this
    image; :class:`TransformersWrapper` provides the same engine protocol
    over a local HF model."""

    def __init__(self, *a, **k):
        raise ImportError("vllm is not available in this image; use "
                          "TransformersWrapper")


class SGLangWrapper:
    """Gated: reference SGLang engine wrapper — sglang absent here."""

    def __init__(self, *a, **k):
        raise ImportError("sglang is not available in this image; use "
                          "TransformersWrapper")
