"""Native TPU LLM serving engine — the vLLM-analogue layer.

The reference delegates LLM serving to external engines (vLLM / SGLang:
``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py`` — engine
config, continuous batching, sampling params; ``vllm_wrapper.py`` policy
wrapper).  Neither engine exists for TPU in this image, and a TPU-native
framework should own this layer anyway: serving on TPU is a *static-shape
slot machine* (fixed decode batch, per-slot KV rows, chunked scans), not a
dynamic paged allocator.

Components:

* :mod:`rl_tpu.serve.engine` — device kernels: an explicit-cache twin of
  :class:`~rl_tpu.modules.transformer.TransformerLM` (identical parameter
  tree — trained params drop in), parallel ragged prefill at arbitrary slot
  offsets, chunked decode scans, and a per-slot sampling kernel
  (temperature / top-k / top-p / min-p / repetition penalty / stop tokens —
  the vLLM ``SamplingParams`` surface).
* :mod:`rl_tpu.serve.scheduler` — host-side continuous batching: a request
  queue + slot manager that prefills queued prompts into freed slots
  while other slots keep decoding (in-flight batching), with
  bucketed-compile shapes so the jit cache stays bounded.
"""
from rl_tpu.serve.engine import (
    ServeLM,
    SamplingParams,
    TokenDFA,
    init_slot_cache,
    init_slot_state,
    prefill,
    decode_chunk,
    sample_from_logits,
)
from rl_tpu.serve.scheduler import ServingEngine, Request
from rl_tpu.serve.speculative import (
    draft_prefill,
    ngram_decode_chunk,
    ngram_propose,
    speculative_decode_chunk,
    speculative_round,
)

__all__ = [
    "ServeLM",
    "SamplingParams",
    "TokenDFA",
    "init_slot_cache",
    "init_slot_state",
    "prefill",
    "decode_chunk",
    "sample_from_logits",
    "ServingEngine",
    "Request",
    "speculative_decode_chunk",
    "speculative_round",
    "draft_prefill",
    "ngram_propose",
    "ngram_decode_chunk",
]
