"""Speculative decoding (rl_tpu.serve.speculative).

Exactness contract: the committed-token distribution equals the target
model's sampling distribution for ANY draft model — greedy speculative
output is token-identical to plain greedy decode, and temperature>0 output
matches the analytic filtered target distribution in frequency.

Reference: Leviathan et al. 2023 accept/reject; the TorchRL reference
delegates this layer to vLLM (modules/llm/backends/vllm/vllm_async.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.serve import (
    SamplingParams, ServeLM, ServingEngine, init_slot_cache, init_slot_state,
    prefill,
)
from rl_tpu.serve.speculative import speculative_round


@pytest.fixture(scope="module")
def models():
    lm = TransformerLM(vocab_size=24, n_layers=2, n_heads=2, d_model=32,
                       max_len=48)
    params = lm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 4), jnp.int32))["params"]
    draft = TransformerLM(vocab_size=24, n_layers=1, n_heads=2, d_model=16,
                          max_len=48)
    dparams = draft.init(jax.random.PRNGKey(9),
                         jnp.zeros((1, 4), jnp.int32))["params"]
    return lm, params, draft, dparams


def _greedy_ref(lm, params, prompt, n):
    seq = list(map(int, prompt))
    for _ in range(n):
        lg = lm.apply({"params": params}, jnp.asarray([seq]))
        seq.append(int(lg[0, -1].argmax()))
    return seq[len(prompt):]


class TestSpeculativeEngine:
    def test_greedy_identical_to_plain_any_draft(self, models):
        lm, params, draft, dparams = models
        plain = ServingEngine(lm, params, n_slots=3, max_new_cap=12,
                              decode_chunk_len=5)
        spec = ServingEngine(lm, params, n_slots=3, max_new_cap=12,
                             decode_chunk_len=5, draft=(draft, dparams),
                             gamma=3)
        rng = np.random.RandomState(4)
        prompts = [list(rng.randint(1, 24, rng.randint(2, 8)))
                   for _ in range(6)]
        a = plain.generate(prompts, max_new_tokens=10, temperature=0.0)
        b = spec.generate(prompts, max_new_tokens=10, temperature=0.0)
        for x, y in zip(a, b):
            assert x.tokens == y.tokens
            np.testing.assert_allclose(x.log_probs, y.log_probs, atol=1e-5)

    def test_self_draft_high_acceptance(self, models):
        lm, params, _, _ = models
        spec = ServingEngine(lm, params, n_slots=1, max_new_cap=16,
                             decode_chunk_len=8, draft=(lm, params), gamma=3)
        [r] = spec.generate([[3, 7, 1]], max_new_tokens=12, temperature=0.0)
        assert r.tokens == _greedy_ref(lm, params, [3, 7, 1], 12)
        # draft == target at temp 0 → every proposal accepted: γ+1 per round
        assert spec.spec_acceptance > 3.5

    def test_stop_and_max_new_in_speculative_mode(self, models):
        lm, params, draft, dparams = models
        spec = ServingEngine(lm, params, n_slots=2, max_new_cap=12,
                             decode_chunk_len=6, draft=(draft, dparams),
                             gamma=3)
        prompt = [5, 9, 2]
        full = _greedy_ref(lm, params, prompt, 10)
        stop = full[4]
        [r] = spec.generate([prompt], max_new_tokens=10, temperature=0.0,
                            stop=(stop,))
        first = full.index(stop)
        assert r.tokens == full[: first + 1]
        assert len(r.log_probs) == len(r.tokens)

    def test_validation(self, models):
        lm, params, draft, dparams = models
        spec = ServingEngine(lm, params, n_slots=2, max_new_cap=16,
                             draft=(draft, dparams), gamma=4)
        with pytest.raises(ValueError, match="repetition_penalty"):
            spec.submit([1, 2], max_new_tokens=4, repetition_penalty=1.5)
        with pytest.raises(ValueError, match="speculative margin"):
            # plen + max_new + gamma > max_len
            spec.submit(list(range(1, 30)), max_new_tokens=16)
        plain = ServingEngine(lm, params, n_slots=2, max_new_cap=16)
        with pytest.raises(RuntimeError):
            plain.update_draft_weights(params)


class TestDistributionExactness:
    def test_committed_token_frequency_matches_target(self, models):
        """At temperature 1, the first token committed by a speculative
        round is distributed as the target's softmax given the context —
        for a draft with different weights (nontrivial rejections)."""
        lm, params, draft, dparams = models
        serve_t, serve_d = ServeLM.from_lm(lm), ServeLM.from_lm(draft)
        prompt = np.array([[4, 11, 7]], np.int32)
        row = SamplingParams(max_new_tokens=8, temperature=1.0).as_row(4)
        req = {k: (np.stack([v]) if k == "stop" else np.full(1, v))
               for k, v in row.items()}
        cache_t = init_slot_cache(serve_t, 1)
        cache_d = init_slot_cache(serve_d, 1)
        state = init_slot_state(1, lm.max_len, max_new_cap=8)
        # greedy prefill so the conditioning context is FIXED; then flip the
        # slot to temp 1.0 for the speculative round
        greedy_req = dict(req)
        greedy_req["temperature"] = np.zeros(1, np.float32)
        cache_t, state = prefill(serve_t, params, cache_t, state, [0], prompt,
                                 np.array([3]), greedy_req,
                                 jax.random.PRNGKey(0))
        from rl_tpu.serve.speculative import draft_prefill
        cache_d = draft_prefill(serve_d, dparams, cache_d, [0], prompt, None)
        state = state.update({"temperature": jnp.ones(1, jnp.float32)})
        ctx = [int(t) for t in np.asarray(state["tokens"][0, :4])]
        expect = np.asarray(jax.nn.softmax(
            lm.apply({"params": params}, jnp.asarray([ctx]))[0, -1]))

        round_fn = jax.jit(lambda ct, cd, s, k: speculative_round(
            serve_t, serve_d, params, dparams, ct, cd, s, k, gamma=3))
        counts = np.zeros(24)
        n = 400
        for i in range(n):
            _, _, s2, eff = round_fn(cache_t, cache_d, state,
                                     jax.random.PRNGKey(1000 + i))
            assert int(eff[0]) >= 1
            counts[int(s2["tokens"][0, 4])] += 1
        np.testing.assert_allclose(counts / n, expect, atol=0.075)

    def test_top_k_support_respected_in_speculative_mode(self, models):
        """Every committed token lies in the target's top-k set for its
        prefix (filters apply to both models' distributions)."""
        lm, params, draft, dparams = models
        spec = ServingEngine(lm, params, n_slots=1, max_new_cap=8,
                             decode_chunk_len=4, draft=(draft, dparams),
                             gamma=2, seed=11)
        prompt = [6, 2, 9]
        for trial in range(10):
            spec._key = jax.random.PRNGKey(trial)
            [r] = spec.generate([prompt], max_new_tokens=5, temperature=1.0,
                                top_k=3)
            seq = list(prompt)
            for t in r.tokens:
                lg = lm.apply({"params": params}, jnp.asarray([seq]))[0, -1]
                topk = set(np.argsort(-np.asarray(lg))[:3].tolist())
                assert t in topk, (trial, t, topk)
                seq.append(t)


class TestNgramSpeculation:
    """Draft-free prompt-lookup speculation (draft=\"ngram\")."""

    def test_greedy_identical_to_plain(self, models):
        lm, params, _, _ = models
        plain = ServingEngine(lm, params, n_slots=3, max_new_cap=12,
                              decode_chunk_len=5)
        ng = ServingEngine(lm, params, n_slots=3, max_new_cap=12,
                           decode_chunk_len=5, draft="ngram", gamma=3)
        rng = np.random.RandomState(4)
        prompts = [list(rng.randint(1, 24, rng.randint(2, 8)))
                   for _ in range(6)]
        a = plain.generate(prompts, max_new_tokens=10, temperature=0.0)
        b = ng.generate(prompts, max_new_tokens=10, temperature=0.0)
        for x, y in zip(a, b):
            assert x.tokens == y.tokens
            np.testing.assert_allclose(x.log_probs, y.log_probs, atol=1e-5)
        assert ng.spec_acceptance >= 1.0

    def test_repetitive_continuation_accelerates(self, models):
        """A prompt whose greedy continuation becomes constant must reach
        acceptance > 1 (adjacent-repeat match, frontier-clamped reads)."""
        lm, params, _, _ = models
        plain = ServingEngine(lm, params, n_slots=1, max_new_cap=14,
                              decode_chunk_len=7)
        rng = np.random.RandomState(1)
        found = None
        for _ in range(20):
            p = list(rng.randint(1, 24, 4))
            [r] = plain.generate([p], max_new_tokens=12, temperature=0.0)
            if len(set(r.tokens[-6:])) == 1:
                found = (p, r.tokens)
                break
        assert found, "no constant-continuation prompt found"
        p, expect = found
        ng = ServingEngine(lm, params, n_slots=1, max_new_cap=14,
                           decode_chunk_len=8, draft="ngram", gamma=3)
        [x] = ng.generate([p], max_new_tokens=12, temperature=0.0)
        assert x.tokens == expect
        assert ng.spec_acceptance > 1.3

    def test_ngram_sampled_support_respected(self, models):
        lm, params, _, _ = models
        ng = ServingEngine(lm, params, n_slots=1, max_new_cap=8,
                           decode_chunk_len=4, draft="ngram", gamma=2,
                           seed=5)
        prompt = [6, 2, 9]
        for trial in range(6):
            ng._key = jax.random.PRNGKey(trial)
            [r] = ng.generate([prompt], max_new_tokens=5, temperature=1.0,
                              top_k=3)
            seq = list(prompt)
            for t in r.tokens:
                lg = lm.apply({"params": params}, jnp.asarray([seq]))[0, -1]
                topk = set(np.argsort(-np.asarray(lg))[:3].tolist())
                assert t in topk
                seq.append(t)

    def test_no_draft_weight_update(self, models):
        lm, params, _, _ = models
        ng = ServingEngine(lm, params, n_slots=1, max_new_cap=8,
                           draft="ngram")
        with pytest.raises(RuntimeError):
            ng.update_draft_weights(params)
