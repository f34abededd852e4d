"""Native LLM serving engine (rl_tpu.serve) — the vLLM-analogue layer.

Covers: param-tree compatibility with TransformerLM, ragged parallel
prefill, chunked decode equivalence vs full-forward greedy, per-slot
sampling controls (top-k / top-p / min-p / repetition penalty / stop
tokens), multi-turn continuation prefill over a live cache, and host-side
continuous batching (more requests than slots).

Reference surface: vLLM SamplingParams + engine scheduling
(/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py:176,504).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.serve import (
    Request, SamplingParams, ServeLM, ServingEngine, decode_chunk,
    init_slot_cache, init_slot_state, prefill, sample_from_logits,
)


@pytest.fixture(scope="module")
def lm_and_params():
    lm = TransformerLM(vocab_size=50, n_layers=2, n_heads=2, d_model=32,
                       max_len=64)
    params = lm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 4), jnp.int32))["params"]
    return lm, params


def _req_rows(n, sp: SamplingParams, n_stop=4):
    row = sp.as_row(n_stop)
    return {k: (np.stack([v] * n) if k == "stop" else np.full(n, v))
            for k, v in row.items()}


def _greedy_ref(lm, params, prompt, n):
    seq = list(map(int, prompt))
    for _ in range(n):
        lg = lm.apply({"params": params}, jnp.asarray([seq]))
        seq.append(int(lg[0, -1].argmax()))
    return seq[len(prompt):]


class TestServeLM:
    def test_param_tree_identical(self, lm_and_params):
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        cache = init_slot_cache(serve, 2)
        sp = serve.init(jax.random.PRNGKey(1), jnp.zeros((2, 3), jnp.int32),
                        cache, jnp.zeros(2, jnp.int32))["params"]
        assert jax.tree.structure(sp) == jax.tree.structure(params)
        assert all(a.shape == b.shape for a, b in
                   zip(jax.tree.leaves(sp), jax.tree.leaves(params)))

    def test_full_forward_matches_training_twin(self, lm_and_params):
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        toks = jax.random.randint(jax.random.PRNGKey(1), (3, 12), 0, 50)
        ref = lm.apply({"params": params}, toks)
        got, _ = serve.apply({"params": params}, toks,
                             init_slot_cache(serve, 3),
                             jnp.zeros(3, jnp.int32))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)
        assert (ref.argmax(-1) == got.argmax(-1)).all()

    def test_ragged_prefill_greedy_decode_exact(self, lm_and_params):
        """Left-aligned ragged prompts + chunked decode == per-row
        full-forward greedy (the ``lm_generate_cached`` fixed-length
        restriction does not apply here)."""
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        S, G = 4, 6
        cache = init_slot_cache(serve, S)
        state = init_slot_state(S, lm.max_len, max_new_cap=8)
        plens = np.array([3, 7, 2, 5])
        prompts = np.zeros((S, 7), np.int32)
        rng = np.random.RandomState(0)
        for i, pl in enumerate(plens):
            prompts[i, :pl] = rng.randint(1, 50, pl)
        req = _req_rows(S, SamplingParams(max_new_tokens=G, temperature=0.0))
        cache, state = prefill(serve, params, cache, state, np.arange(S),
                               prompts, plens, req, jax.random.PRNGKey(2))
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(3), G - 1)
        assert bool(state["done"].all())
        for i in range(S):
            got = list(map(int, state["tokens"][i, plens[i]:plens[i] + G]))
            assert got == _greedy_ref(lm, params, prompts[i, :plens[i]], G)
            # behaviour lps are finite and as long as the generation
            assert np.isfinite(np.asarray(state["lps"][i, :G])).all()

    def test_multiturn_continuation_prefill(self, lm_and_params):
        """start>0 prefill appends a second turn over the slot's existing
        cache (prefix reuse) — equal to prefilling the concatenation."""
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        t1 = np.array([[5, 9, 13]], np.int32)
        t2 = np.array([[21, 2]], np.int32)
        req = _req_rows(1, SamplingParams(max_new_tokens=4, temperature=0.0))

        cache = init_slot_cache(serve, 1)
        state = init_slot_state(1, lm.max_len, max_new_cap=8)
        cache, state = prefill(serve, params, cache, state, [0], t1,
                               np.array([3]), req, jax.random.PRNGKey(0))
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(1), 3)
        mid = int(state["length"][0])   # 3 prompt + 4 generated
        assert mid == 7
        # second turn continues at the current frontier
        cache, state = prefill(serve, params, cache, state, [0], t2,
                               np.array([2]), req, jax.random.PRNGKey(2),
                               start=state["length"])
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(3), 3)
        full_ctx = list(map(int, state["tokens"][0, :9]))
        got = list(map(int, state["tokens"][0, 9:13]))
        assert got == _greedy_ref(lm, params, full_ctx, 4)

    def test_decode_idempotent_for_done_slots(self, lm_and_params):
        """Extra decode chunks after done leave tokens/lps unchanged."""
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        cache = init_slot_cache(serve, 2)
        state = init_slot_state(2, lm.max_len, max_new_cap=8)
        prompts = np.array([[4, 7], [9, 1]], np.int32)
        req = _req_rows(2, SamplingParams(max_new_tokens=3, temperature=0.0))
        cache, state = prefill(serve, params, cache, state, [0, 1], prompts,
                               np.array([2, 2]), req, jax.random.PRNGKey(0))
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(1), 4)
        snap_t = np.asarray(state["tokens"])
        snap_l = np.asarray(state["lps"])
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(2), 4)
        np.testing.assert_array_equal(snap_t, np.asarray(state["tokens"]))
        np.testing.assert_array_equal(snap_l, np.asarray(state["lps"]))

    def test_bucket_padding_rows_do_not_corrupt_live_slots(self,
                                                           lm_and_params):
        """An invalid (bucket-padding) prefill row targeting a busy slot
        must not disturb that slot's in-flight request."""
        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        cache = init_slot_cache(serve, 2)
        state = init_slot_state(2, lm.max_len, max_new_cap=8)
        req1 = _req_rows(1, SamplingParams(max_new_tokens=6, temperature=0.0))
        p0 = np.array([[3, 8, 11]], np.int32)
        cache, state = prefill(serve, params, cache, state, [0], p0,
                               np.array([3]), req1, jax.random.PRNGKey(0))
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(1), 2)
        # admit a request into slot 1; the padding row targets busy slot 0
        req2 = _req_rows(2, SamplingParams(max_new_tokens=4, temperature=0.0))
        prompts = np.array([[6, 2], [0, 0]], np.int32)
        cache, state = prefill(serve, params, cache, state, [1, 0], prompts,
                               np.array([2, 1]), req2, jax.random.PRNGKey(2),
                               valid=np.array([True, False]))
        cache, state = decode_chunk(serve, params, cache, state,
                                    jax.random.PRNGKey(3), 5)
        got0 = list(map(int, state["tokens"][0, 3:9]))
        assert got0 == _greedy_ref(lm, params, p0[0, :3], 6)
        got1 = list(map(int, state["tokens"][1, 2:6]))
        assert got1 == _greedy_ref(lm, params, prompts[0, :2], 4)


class TestSampling:
    def _state(self, **over):
        s = init_slot_state(2, 8, 4)
        s = s.update({"active": jnp.ones(2, bool),
                      "length": jnp.ones(2, jnp.int32)})
        return s.update({k: jnp.asarray(v) for k, v in over.items()})

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([[0., 1., 2., 3., 4.],
                              [0., 1., 2., 3., 4.]])
        state = self._state(top_k=np.array([2, 0], np.int32))
        toks = set()
        for i in range(64):
            t, _ = sample_from_logits(logits, state,
                                      jax.random.PRNGKey(i))
            toks.add(int(t[0]))
        assert toks <= {3, 4}

    def test_top_p_restricts_support(self):
        # probs ~ softmax([0,0,0,8]) — top token carries ~.999 mass
        logits = jnp.asarray([[0., 0., 0., 8.]] * 2)
        state = self._state(top_p=np.array([0.5, 1.0], np.float32))
        for i in range(32):
            t, _ = sample_from_logits(logits, state, jax.random.PRNGKey(i))
            assert int(t[0]) == 3

    def test_min_p_restricts_support(self):
        logits = jnp.asarray([[0., 2., 4., 4.01]] * 2)
        state = self._state(min_p=np.array([0.5, 0.0], np.float32))
        for i in range(32):
            t, _ = sample_from_logits(logits, state, jax.random.PRNGKey(i))
            assert int(t[0]) in (2, 3)   # only tokens with p >= .5*pmax

    def test_greedy_vs_sampled_and_lps(self):
        logits = jnp.asarray([[0., 1., 5., 2.]] * 2)
        state = self._state(temperature=np.array([0.0, 1.0], np.float32))
        t, lp = sample_from_logits(logits, state, jax.random.PRNGKey(0))
        assert int(t[0]) == 2
        expect = float(jax.nn.log_softmax(logits[0])[2])
        assert abs(float(lp[0]) - expect) < 1e-5

    def test_repetition_penalty_discourages_seen(self):
        # token 1 already in context; with a huge penalty its positive
        # logit collapses and argmax moves to token 2
        state = self._state(
            temperature=np.array([0.0, 0.0], np.float32),
            repetition_penalty=np.array([50.0, 1.0], np.float32),
            tokens=np.tile(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.int32),
                           (2, 1)),
            length=np.array([1, 1], np.int32))
        logits = jnp.asarray([[0., 3., 2.9, 0.]] * 2)
        t, _ = sample_from_logits(logits, state, jax.random.PRNGKey(0))
        assert int(t[0]) == 2      # penalized
        assert int(t[1]) == 1      # pen=1 → untouched

    def test_sampled_frequencies_match_distribution(self):
        logits = jnp.tile(jnp.asarray([[0.0, 1.0, 2.0]]), (1, 1))
        state = init_slot_state(1, 8, 4).update(
            {"active": jnp.ones(1, bool), "length": jnp.ones(1, jnp.int32)})
        probs = np.asarray(jax.nn.softmax(logits[0]))
        counts = np.zeros(3)
        n = 600
        for i in range(n):
            t, lp = sample_from_logits(logits, state, jax.random.PRNGKey(i))
            counts[int(t[0])] += 1
            assert abs(float(lp[0]) - np.log(probs[int(t[0])])) < 1e-5
        np.testing.assert_allclose(counts / n, probs, atol=0.06)


class TestServingEngine:
    def test_continuous_batching_exact(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=3, max_new_cap=12,
                            prefill_width=2, decode_chunk_len=4, seed=7)
        rng = np.random.RandomState(1)
        prompts = [list(rng.randint(1, 50, rng.randint(2, 10)))
                   for _ in range(8)]
        reqs = eng.generate(prompts, max_new_tokens=8, temperature=0.0)
        assert all(r.done for r in reqs)
        for r in reqs:
            assert r.tokens == _greedy_ref(lm, params, r.prompt_ids, 8)
            assert len(r.log_probs) == 8
        # slots were reused: 8 requests > 3 slots
        assert eng.prefill_calls >= 4
        assert eng.tokens_generated == 64

    def test_stop_token_halts_generation(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=12,
                            decode_chunk_len=4)
        prompt = [5, 9, 13]
        full = _greedy_ref(lm, params, prompt, 8)
        stop = full[3]
        [r] = eng.generate([prompt], max_new_tokens=8, temperature=0.0,
                           stop=(stop,))
        first = full.index(stop)
        assert r.tokens == full[: first + 1]     # stop token recorded
        assert len(r.log_probs) == len(r.tokens)

    def test_heterogeneous_sampling_per_request(self, lm_and_params):
        """Requests with different temperature/top_k coexist in one batch."""
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=4, max_new_cap=8,
                            prefill_width=4, decode_chunk_len=4, seed=3)
        eng.start()
        try:
            greedy = eng.submit([4, 7, 2], max_new_tokens=6, temperature=0.0)
            hot = eng.submit([4, 7, 2], max_new_tokens=6, temperature=1.5,
                             top_k=10)
            greedy.wait(30)
            hot.wait(30)
        finally:
            eng.close()
        assert greedy.tokens == _greedy_ref(lm, params, [4, 7, 2], 6)
        assert len(hot.tokens) == 6

    def test_submit_validation(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=4)
        with pytest.raises(ValueError):
            eng.submit([1, 2], max_new_tokens=9)           # > cap
        with pytest.raises(ValueError):
            eng.submit(list(range(62)), max_new_tokens=4)  # > max_len
        with pytest.raises(ValueError):
            eng.submit([], max_new_tokens=2)

    def test_update_weights_changes_output(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8)
        [a] = eng.generate([[3, 1, 4]], max_new_tokens=6, temperature=0.0)
        p2 = jax.tree.map(lambda x: x * 1.5, params)
        eng.update_weights(p2)
        [b] = eng.generate([[3, 1, 4]], max_new_tokens=6, temperature=0.0)
        assert b.tokens == _greedy_ref(lm, p2, [3, 1, 4], 6)
        assert a.tokens == _greedy_ref(lm, params, [3, 1, 4], 6)

    def test_request_ids_monotonic(self):
        a = Request([1], SamplingParams(max_new_tokens=1))
        b = Request([1], SamplingParams(max_new_tokens=1))
        assert b.id == a.id + 1


class TestServingParallel:
    def test_tp_sharded_serving_decode_equals_unsharded(self, lm_and_params):
        """ServeLM's param tree is identical to TransformerLM's, so the
        Megatron TP rules (parallel/llm_tp.py) apply unchanged; the
        explicit KV cache shards on the heads dim (shard_serve_cache).
        Greedy continuous decode over a tp=2 mesh must equal unsharded."""
        from rl_tpu.parallel import make_mesh, shard_lm_params
        from rl_tpu.parallel.llm_tp import shard_serve_cache

        lm, params = lm_and_params
        serve = ServeLM.from_lm(lm)
        S, G = 2, 6
        plens = np.array([3, 5])
        prompts = np.zeros((S, 5), np.int32)
        rng = np.random.RandomState(2)
        for i, pl in enumerate(plens):
            prompts[i, :pl] = rng.randint(1, 50, pl)
        req = _req_rows(S, SamplingParams(max_new_tokens=G, temperature=0.0))

        def run(params_in, cache_in):
            cache, state = prefill(serve, params_in, cache_in,
                                   init_slot_state(S, lm.max_len, 8),
                                   np.arange(S), prompts, plens, req,
                                   jax.random.PRNGKey(4))
            cache, state = decode_chunk(serve, params_in, cache, state,
                                        jax.random.PRNGKey(5), G - 1)
            return state["tokens"], state["lps"]

        base_t, base_l = run(params, init_slot_cache(serve, S))
        mesh = make_mesh({"tp": 2}, jax.devices()[:2])
        sp = shard_lm_params(params, mesh)
        sc = shard_serve_cache(init_slot_cache(serve, S), mesh)
        with mesh:
            tp_t, tp_l = jax.jit(run)(sp, sc)
        np.testing.assert_array_equal(np.asarray(base_t), np.asarray(tp_t))
        np.testing.assert_allclose(np.asarray(base_l), np.asarray(tp_l),
                                   atol=1e-5)


class TestCollectorIntegration:
    def test_as_chat_engine_drives_llm_collector(self, lm_and_params):
        """ServingEngine as the LLMCollector engine: conversation workers
        submit concurrently and coalesce through continuous batching."""
        from rl_tpu.collectors import LLMCollector
        from rl_tpu.envs.llm import ChatEnv

        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=4, max_new_cap=8,
                            prefill_width=2, decode_chunk_len=4)
        encode = lambda h: [min(ord(c), 49) for c in
                            h.messages[-1].content][:10] or [1]
        decode = lambda toks: "".join(chr(97 + (t % 26)) for t in toks)
        engine = eng.as_chat_engine(encode, decode, max_new_tokens=6,
                                    temperature=0.0)
        try:
            env = ChatEnv(["What is 2+2?", "Name a color.", "Say hi."],
                          reward_fn=lambda h, r: float(len(r)) / 10.0,
                          max_turns=1, seed=0)
            c = LLMCollector(env, engine, dialog_turns_per_batch=3,
                             total_dialog_turns=6, max_tokens=16)
            batches = list(c)
        finally:
            eng.close()
        assert len(batches) == 2
        for b in batches:
            for s in b:
                assert len(s["response"]) == 6
                assert s["log_probs"].shape == (16,)
                assert s["reward"] > 0

    def test_llm_weight_sync_registers_serving_engine(self, lm_and_params):
        """LLMEngineWeightSync pushes trained params into the ServingEngine
        (the trainer→engine path grpo_10m engine=serving uses)."""
        from rl_tpu.weight_update.llm import LLMEngineWeightSync

        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8)
        sync = LLMEngineWeightSync()
        sync.register_engine(eng)
        p2 = jax.tree.map(lambda x: x * 1.3, params)
        v = sync.push_weights(p2)
        assert v >= 1
        [r] = eng.generate([[3, 1, 4]], max_new_tokens=5, temperature=0.0)
        assert r.tokens == _greedy_ref(lm, p2, [3, 1, 4], 5)


class TestPromptLogprobs:
    def test_prompt_logprobs_match_full_forward(self, lm_and_params):
        """prompt_logprobs=True returns teacher-forced prompt scores equal
        to a full-forward log_softmax pass (position 0 scored 0.0)."""
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=6)
        prompt = [7, 3, 19, 4, 2]
        [r] = eng.generate([prompt], max_new_tokens=4, temperature=0.0,
                           prompt_logprobs=True)
        assert r.prompt_logprobs.shape == (5,)
        assert r.prompt_logprobs[0] == 0.0
        lg = lm.apply({"params": params}, jnp.asarray([prompt]))
        lp = jax.nn.log_softmax(np.asarray(lg, np.float32), -1)
        expect = [float(lp[0, i - 1, prompt[i]]) for i in range(1, 5)]
        np.testing.assert_allclose(r.prompt_logprobs[1:], expect, atol=1e-5)

    def test_prompt_logprobs_off_by_default(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=6)
        [r] = eng.generate([[3, 1]], max_new_tokens=3, temperature=0.0)
        assert r.prompt_logprobs is None


class TestBiasAndMinTokens:
    def test_min_tokens_suppresses_stop(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8)
        full = _greedy_ref(lm, params, [5, 9, 2], 8)
        stop = full[2]
        first = full.index(stop)
        [a] = eng.generate([[5, 9, 2]], max_new_tokens=8, temperature=0.0,
                           stop=(stop,))
        [b] = eng.generate([[5, 9, 2]], max_new_tokens=8, temperature=0.0,
                           stop=(stop,), min_tokens=6)
        assert len(a.tokens) == first + 1
        assert len(b.tokens) >= 6

    def test_logit_bias_bans_and_forces(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8)
        full = _greedy_ref(lm, params, [5, 9, 2], 4)
        [c] = eng.generate([[5, 9, 2]], max_new_tokens=4, temperature=0.0,
                           logit_bias={full[0]: -1e9})
        assert c.tokens[0] != full[0]
        [d] = eng.generate([[5, 9, 2]], max_new_tokens=3, temperature=0.0,
                           logit_bias={7: 1e9})
        assert d.tokens == [7, 7, 7]
        # a reused slot must NOT inherit the previous request's bias
        [e] = eng.generate([[5, 9, 2]], max_new_tokens=4, temperature=0.0)
        assert e.tokens == full

    def test_bias_in_speculative_and_min_tokens_rejected(self,
                                                         lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8,
                            draft="ngram")
        with pytest.raises(ValueError, match="min_tokens"):
            eng.submit([1, 2], max_new_tokens=3, min_tokens=2)
        [f] = eng.generate([[5, 9, 2]], max_new_tokens=3, temperature=0.0,
                           logit_bias={7: 1e9})
        assert f.tokens == [7, 7, 7]


class TestMultiTurnContinuation:
    """hold_slot + continue_request: KV-prefix reuse across turns."""

    def test_two_turn_exact(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=3, max_new_cap=8,
                            decode_chunk_len=4)
        t1, t2 = [5, 9, 13], [21, 2]
        r1 = eng.submit(t1, max_new_tokens=4, temperature=0.0,
                        hold_slot=True)
        eng.run_until_complete()
        assert r1.tokens == _greedy_ref(lm, params, t1, 4)
        r2 = eng.continue_request(r1, t2, max_new_tokens=4, temperature=0.0)
        eng.run_until_complete()
        full = t1 + r1.tokens + t2
        assert r2.tokens == _greedy_ref(lm, params, full, 4)
        # three turns + interleaved fresh traffic on the other slots
        eng.generate([[8, 8, 1], [2, 30]], max_new_tokens=5, temperature=0.0)
        r3 = eng.continue_request(r2, [11], max_new_tokens=3,
                                  temperature=0.0)
        eng.run_until_complete()
        assert r3.tokens == _greedy_ref(lm, params, full + r2.tokens + [11],
                                        3)
        eng.release_slot(r3)
        with pytest.raises(ValueError, match="holds no slot"):
            eng.continue_request(r1, [1], max_new_tokens=2)

    def test_held_slot_starvation_raises(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=1, max_new_cap=8)
        h = eng.submit([3, 2], max_new_tokens=3, temperature=0.0,
                       hold_slot=True)
        eng.run_until_complete()
        eng.submit([4, 4], max_new_tokens=3)
        with pytest.raises(RuntimeError, match="held"):
            eng.run_until_complete()
        eng.release_slot(h)
        eng.run_until_complete()   # now schedulable

    def test_speculative_continuation_exact(self, lm_and_params):
        """The continuation re-feeds the previous turn's final token, so
        the draft cache gap at the old frontier is filled and model-draft
        speculation stays greedy-exact across turns."""
        lm, params = lm_and_params
        draft = TransformerLM(vocab_size=lm.vocab_size, n_layers=1,
                              n_heads=2, d_model=16, max_len=lm.max_len)
        dpar = draft.init(jax.random.PRNGKey(9),
                          jnp.zeros((1, 4), jnp.int32))["params"]
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8,
                            decode_chunk_len=5, draft=(draft, dpar), gamma=3)
        t1, t2 = [5, 9, 13], [21, 2]
        a = eng.submit(t1, max_new_tokens=4, temperature=0.0, hold_slot=True)
        eng.run_until_complete()
        b = eng.continue_request(a, t2, max_new_tokens=4, temperature=0.0)
        eng.run_until_complete()
        assert b.tokens == _greedy_ref(lm, params, t1 + a.tokens + t2, 4)


class TestGrammarConstrainedDecoding:
    """TokenDFA guided decoding (the vLLM/outlines structured-generation
    analogue): forbidden tokens masked per slot, DFA advanced per commit."""

    def _dfa(self, V):
        from rl_tpu.serve import TokenDFA
        trans = -np.ones((3, V), np.int32)
        trans[0, 1] = 1
        trans[0, 2] = 1
        trans[1, 3] = 2
        trans[1, 4] = 2
        trans[2, 0] = 0
        return TokenDFA(trans, start_state=0)

    def test_outputs_follow_grammar(self, lm_and_params):
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=3, max_new_cap=9,
                            grammar=self._dfa(lm.vocab_size))
        reqs = eng.generate([[5, 7], [3, 3, 9]], max_new_tokens=9,
                            temperature=1.0, use_grammar=True)
        for r in reqs:
            t = r.tokens
            for i in range(0, 9, 3):
                assert t[i] in (1, 2) and t[i + 1] in (3, 4) and t[i + 2] == 0
        # an unconstrained request reusing a slot is unaffected
        [u] = eng.generate([[5, 7]], max_new_tokens=6, temperature=0.0)
        assert u.tokens == _greedy_ref(lm, params, [5, 7], 6)

    def test_grammar_validation(self, lm_and_params):
        lm, params = lm_and_params
        plain = ServingEngine(lm, params, n_slots=2, max_new_cap=4)
        with pytest.raises(ValueError, match="no .?grammar"):
            plain.submit([1], max_new_tokens=2, use_grammar=True)
        spec = ServingEngine(lm, params, n_slots=2, max_new_cap=8,
                             draft="ngram", grammar=self._dfa(lm.vocab_size))
        with pytest.raises(ValueError, match="speculative"):
            spec.submit([1], max_new_tokens=2, use_grammar=True)
        from rl_tpu.serve import TokenDFA
        with pytest.raises(ValueError, match="vocab"):
            ServingEngine(lm, params, n_slots=2, max_new_cap=4,
                          grammar=TokenDFA(-np.ones((2, 7), np.int32)))

    def test_failed_continuation_leaves_slot_held(self, lm_and_params):
        """A continue_request that fails validation must not un-hold the
        slot (the conversation prefix stays reusable)."""
        lm, params = lm_and_params
        eng = ServingEngine(lm, params, n_slots=2, max_new_cap=8)
        r1 = eng.submit([5, 9], max_new_tokens=3, temperature=0.0,
                        hold_slot=True)
        eng.run_until_complete()
        with pytest.raises(ValueError):
            eng.continue_request(r1, [2], max_new_tokens=99)   # > cap
        # the slot is still held: a valid continuation succeeds
        r2 = eng.continue_request(r1, [2], max_new_tokens=3, temperature=0.0)
        eng.run_until_complete()
        assert r2.tokens == _greedy_ref(
            lm, params, [5, 9] + r1.tokens + [2], 3)
