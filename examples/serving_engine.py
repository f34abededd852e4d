"""Native LLM serving engine demo: continuous batching + speculative decode.

The vLLM-analogue layer (reference delegates serving to vLLM engine args,
``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py``); here
it is TPU-native: fixed decode slots, bucketed parallel prefill, chunked
``lax.scan`` decode, per-request sampling params, and optional speculative
decoding with a draft model.  Run::

    python examples/serving_engine.py [n_requests=32] [n_slots=8] [spec=1]

Works on CPU (``RLTPU_DEVICE=cpu``, the default here) and on a chip
(``RLTPU_DEVICE=tpu``).
"""
import os
import sys
import time

os.environ.setdefault("RLTPU_DEVICE", "cpu")
import rl_tpu  # noqa: F401  (applies the platform pin before jax compute)
import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.serve import ServingEngine


def main(n_requests: int = 32, n_slots: int = 8, spec: int = 1,
         seed: int = 0):
    V = 64
    lm = TransformerLM(vocab_size=V, n_layers=4, d_model=128, n_heads=4,
                       max_len=96)
    params = lm.init(jax.random.PRNGKey(seed),
                     jnp.zeros((1, 8), jnp.int32))["params"]
    draft = None
    if spec:
        dlm = TransformerLM(vocab_size=V, n_layers=1, d_model=64, n_heads=4,
                            max_len=96)
        draft = (dlm, dlm.init(jax.random.PRNGKey(seed + 1),
                               jnp.zeros((1, 8), jnp.int32))["params"])

    eng = ServingEngine(lm, params, n_slots=n_slots, max_new_cap=32,
                        prefill_width=4, decode_chunk_len=8,
                        draft=draft, gamma=3, seed=seed)
    rng = np.random.RandomState(seed)
    prompts = [list(rng.randint(1, V, rng.randint(3, 14)))
               for _ in range(n_requests)]
    max_news = rng.randint(4, 33, n_requests)

    t0 = time.perf_counter()
    reqs = [eng.submit(p, max_new_tokens=int(m), temperature=0.0,
                       stop=(2,))
            for p, m in zip(prompts, max_news)]
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    toks = sum(len(r.tokens) for r in reqs)
    print(f"{n_requests} mixed-length requests through {n_slots} slots: "
          f"{toks} tokens in {dt:.2f}s ({toks / dt:,.0f} tok/s), "
          f"{eng.prefill_calls} prefill calls, {eng.decode_steps} "
          f"decode dispatches")
    if spec:
        print(f"speculative acceptance: {eng.spec_acceptance:.2f} "
              f"tokens/verify (gamma=3 → ceiling 4.0)")
    for r in reqs[:3]:
        print(f"  req {r.id}: prompt[{len(r.prompt_ids)}] -> "
              f"{len(r.tokens)} tokens, mean lp "
              f"{float(np.mean(r.log_probs)):.3f}")


if __name__ == "__main__":
    kw = dict(arg.split("=", 1) for arg in sys.argv[1:])
    main(**{k: int(v) for k, v in kw.items()})
