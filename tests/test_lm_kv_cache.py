"""KV-cached decode for the TransformerLM serving path.

Reference role: vLLM owns the KV cache inside the engine
(/root/reference/torchrl/modules/llm/backends/vllm/); here it is explicit
flax decode-mode state (rl_tpu/modules/transformer.py lm_generate_cached).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.modules.transformer import (
    TransformerLM,
    init_lm_cache,
    lm_generate_cached,
)

V, P, R, ML = 32, 5, 6, 16


@pytest.fixture(scope="module")
def lms():
    lm = TransformerLM(vocab_size=V, n_layers=2, d_model=64, max_len=ML)
    lm_dec = lm.copy(decode=True)
    params = lm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, ML), jnp.int32))["params"]
    return lm, lm_dec, params


def _full_forward_greedy(lm, params, prompts, gen_len):
    tokens = jnp.concatenate(
        [prompts, jnp.zeros((prompts.shape[0], gen_len), jnp.int32)], 1)
    Pl = prompts.shape[1]
    for t in range(gen_len):
        logits = lm.apply({"params": params}, tokens)[:, Pl + t - 1]
        tokens = tokens.at[:, Pl + t].set(jnp.argmax(logits, -1))
    return tokens[:, Pl:]


def test_cached_greedy_matches_full_forward(lms):
    lm, lm_dec, params = lms
    prompts = jax.random.randint(jax.random.PRNGKey(1), (3, P), 0, V)
    ref = _full_forward_greedy(lm, params, prompts, R)
    out, lps = jax.jit(lambda p, pr, k: lm_generate_cached(
        lm_dec, p, pr, R, k, temperature=0.0))(
            params, prompts, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert lps.shape == (3, R)
    # greedy log-probs are the argmax token's log-softmax: all finite, <= 0
    assert np.all(np.asarray(lps) <= 0) and np.all(np.isfinite(np.asarray(lps)))


def test_cached_params_interchangeable_with_training_twin(lms):
    """decode=False (training) and decode=True (serving) share one param
    tree: the cache is the only extra state."""
    lm, lm_dec, params = lms
    cache = init_lm_cache(lm_dec, 2)
    assert "cached_key" in str(jax.tree_util.tree_structure(cache))
    tok = jnp.zeros((2, 1), jnp.int32)
    logits, mut = lm_dec.apply({"params": params, "cache": cache}, tok,
                               pos_offset=0, mutable=["cache"])
    assert logits.shape == (2, 1, V)
    # cache index advanced by one
    idx = jax.tree_util.tree_leaves(
        [v for k, v in mut["cache"]["CausalTransformer_0"][
            "_Block_0"]["MultiHeadDotProductAttention_0"].items()
         if "index" in k])[0]
    assert int(idx) == 1


def test_cached_sampling_reproducible(lms):
    _, lm_dec, params = lms
    prompts = jax.random.randint(jax.random.PRNGKey(3), (4, P), 0, V)
    f = jax.jit(lambda p, pr, k: lm_generate_cached(
        lm_dec, p, pr, R, k, temperature=1.0))
    a, _ = f(params, prompts, jax.random.PRNGKey(7))
    b, _ = f(params, prompts, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_rejects_overlong(lms):
    _, lm_dec, params = lms
    prompts = jnp.zeros((1, ML), jnp.int32)
    with pytest.raises(ValueError):
        lm_generate_cached(lm_dec, params, prompts, 1, jax.random.PRNGKey(0))
