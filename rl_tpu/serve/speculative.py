"""Speculative decoding over the slot-machine serving kernels.

A small draft model proposes ``gamma`` tokens per slot sequentially; the
target model verifies all of them (plus a bonus position) in ONE parallel
forward; standard accept/reject (Leviathan et al. 2023, "Fast Inference
from Transformers via Speculative Decoding") keeps the output distribution
EXACTLY the target's sampling distribution — greedy speculative output is
bit-identical to greedy plain decode for ANY draft model.

Why this is nearly free on this engine: the positional attention mask makes
cache entries beyond a slot's frontier invisible and re-writes idempotent,
so rejecting draft tokens needs NO cache rollback for either model — the
frontier simply doesn't advance past the accepted point, and stale K/V
beyond it is overwritten as decoding proceeds.

Supports per-slot temperature / top-k / top-p / min-p (both models' logits
run through the same filter pipeline; the accept/reject theorem holds for
any proposal q vs target p).  Repetition penalty is NOT supported on the
speculative path (the penalty at position i depends on the tokens committed
at positions < i inside the same verify window); the scheduler rejects such
requests when speculative decoding is enabled.

The reference has no counterpart (vLLM owns this beneath its engine API —
``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py`` exposes
only engine args); on TPU the verify forward is an MXU-friendly [S, γ+1]
batched pass, which is exactly where this engine wants its FLOPs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import TDict
from rl_tpu.serve.engine import (
    ServeLM, _filtered_logits, _sampling_probs,
)

__all__ = ["speculative_decode_chunk", "speculative_round", "draft_prefill",
           "ngram_propose", "ngram_round", "ngram_decode_chunk"]


def draft_prefill(serve_d: ServeLM, params_d, cache_d, slot_ids, prompts,
                  valid, start=None):
    """Populate the DRAFT model's KV cache for newly admitted prompts
    (logits discarded; garbage K/V beyond each prompt's true length sits
    beyond the frontier and is overwritten as proposals advance)."""
    slot_ids = jnp.asarray(slot_ids, jnp.int32)
    prompts = jnp.asarray(prompts, jnp.int32)
    K = prompts.shape[0]
    valid = jnp.ones(K, bool) if valid is None else jnp.asarray(valid, bool)
    start = jnp.zeros(K, jnp.int32) if start is None else jnp.asarray(
        start, jnp.int32)
    sub = jax.tree.map(lambda c: c[slot_ids], cache_d)
    _, new = serve_d.apply({"params": params_d}, prompts, sub, start)
    merged = jax.tree.map(
        lambda o, n: jnp.where(valid[:, None, None, None], n, o), sub, new)
    return jax.tree.map(lambda c, m: c.at[slot_ids].set(m), cache_d, merged)

_TINY = 1e-30


def _filters_at(state: TDict, reps: int):
    """Per-slot filter params repeated for ``reps`` positions → flat [S*reps]."""
    rep = lambda x: jnp.repeat(x, reps, 0)
    return (rep(state["temperature"]), rep(state["top_k"]),
            rep(state["top_p"]), rep(state["min_p"]))


def speculative_round(serve_t: ServeLM, serve_d: ServeLM, params_t, params_d,
                      cache_t, cache_d, state: TDict, key, gamma: int):
    """One speculative round for every slot: draft ``gamma`` proposals,
    verify in one target forward, commit the accepted prefix plus one
    corrected/bonus token (1..gamma+1 tokens per round).

    Returns ``(cache_t, cache_d, state, committed [S])`` where ``committed``
    counts tokens committed this round per slot (0 for idle/done slots).
    """
    S, Lmax = state["tokens"].shape
    V = serve_t.vocab_size
    arange = jnp.arange(S)
    live = state["active"] & ~state["done"]
    L0 = state["length"]
    kd, kv, kb = jax.random.split(key, 3)

    # ---- draft phase -------------------------------------------------------
    # The draft cache trails the committed frontier by one position after a
    # full-accept round (the last accepted proposal x_γ was proposed but
    # never FED through the draft, and the bonus token is fed next round) —
    # so the first step of every round feeds a 2-token catch-up window at
    # positions (L0-2, L0-1), rewriting the possibly-missing row
    # idempotently, then γ-1 single-token steps follow.
    def _propose(logits_last, toks, length, k):
        logits_last = jnp.asarray(logits_last, jnp.float32)
        if state.get("logit_bias", None) is not None:
            logits_last = logits_last + state["logit_bias"]
        flog, greedy = _filtered_logits(
            logits_last,
            state["temperature"], state["top_k"], state["top_p"],
            state["min_p"])
        nxt = jnp.where(greedy, jnp.argmax(flog, -1),
                        jax.random.categorical(k, flog, -1)).astype(jnp.int32)
        wpos = jnp.clip(length, 0, Lmax - 1)
        toks = toks.at[arange, wpos].set(jnp.where(live, nxt,
                                                   toks[arange, wpos]))
        return nxt, flog, greedy, toks

    dkeys = jax.random.split(kd, gamma)
    toks, length = state["tokens"], L0
    p0 = jnp.clip(L0 - 2, 0, Lmax - 1)
    win0_idx = jnp.clip(p0[:, None] + jnp.arange(2)[None], 0, Lmax - 1)
    win0 = toks[arange[:, None], win0_idx]
    logits0, cache_d = serve_d.apply({"params": params_d}, win0, cache_d, p0)
    x1, flog1, greedy1, toks = _propose(logits0[:, -1], toks, length,
                                        dkeys[0])
    length = length + live

    def draft_body(carry, k):
        cache_d, toks, length, prev = carry
        p = jnp.clip(length - 1, 0, Lmax - 1)
        logits, cache_d = serve_d.apply({"params": params_d},
                                        prev[:, None], cache_d, p)
        nxt, flog, greedy, toks = _propose(logits[:, 0], toks, length, k)
        return (cache_d, toks, length + live, nxt), (nxt, flog, greedy)

    if gamma > 1:
        (cache_d, toks, _, _), (props_r, flog_r, greedy_r) = jax.lax.scan(
            draft_body, (cache_d, toks, length, x1), dkeys[1:])
        props = jnp.concatenate([x1[None], props_r], 0).T       # [S, gamma]
        d_flog = jnp.moveaxis(
            jnp.concatenate([flog1[None], flog_r], 0), 0, 1)    # [S, γ, V]
        d_greedy = jnp.concatenate([greedy1[None], greedy_r], 0).T
    else:
        props, d_flog, d_greedy = x1[:, None], flog1[:, None], \
            greedy1[:, None]

    d_probs = _sampling_probs(
        d_flog.reshape(S * gamma, V), d_greedy.reshape(S * gamma)
    ).reshape(S, gamma, V)
    cache_t, state, eff = _verify_commit(
        serve_t, params_t, cache_t, state, toks, props, d_probs, kv, kb,
        gamma)
    return cache_t, cache_d, state, eff


def _verify_commit(serve_t, params_t, cache_t, state: TDict, toks, props,
                   d_probs, kv, kb, gamma: int):
    """Verify ``props`` [S, gamma] (already staged in ``toks`` beyond each
    frontier) against the target in ONE forward, accept/reject against the
    proposal distribution ``d_probs`` [S, gamma, V], and commit the
    accepted prefix plus a corrected/bonus token.  Exact for ANY proposal
    distribution — a model draft's filtered softmax or a deterministic
    proposer's one-hot."""
    S, Lmax = state["tokens"].shape
    V = serve_t.vocab_size
    arange = jnp.arange(S)
    live = state["active"] & ~state["done"]
    L0 = state["length"]

    # ---- verify phase: one target forward over gamma+1 positions ----------
    win_idx = jnp.clip((L0 - 1)[:, None] + jnp.arange(gamma + 1)[None],
                       0, Lmax - 1)
    window = toks[arange[:, None], win_idx]           # [S, gamma+1]
    t_logits, cache_t = serve_t.apply({"params": params_t}, window, cache_t,
                                      L0 - 1)
    t_raw = jnp.asarray(t_logits, jnp.float32)        # [S, gamma+1, V]
    if state.get("logit_bias", None) is not None:
        t_raw = t_raw + state["logit_bias"][:, None, :]
    t_flog_flat, t_greedy_flat = _filtered_logits(
        t_raw.reshape(S * (gamma + 1), V), *_filters_at(state, gamma + 1))
    t_probs = _sampling_probs(t_flog_flat, t_greedy_flat).reshape(
        S, gamma + 1, V)                              # target sampling law

    # ---- accept/reject -----------------------------------------------------
    p_at = jnp.take_along_axis(t_probs[:, :gamma], props[..., None],
                               -1)[..., 0]            # [S, gamma]
    q_at = jnp.take_along_axis(d_probs, props[..., None], -1)[..., 0]
    u = jax.random.uniform(kv, (S, gamma))
    accept = u < p_at / jnp.maximum(q_at, _TINY)
    n_acc = jnp.cumprod(accept.astype(jnp.int32), 1).sum(1)   # [S] in 0..gamma

    # corrected token from the residual max(p - q, 0) at the rejection
    # position; with q := 0 at position gamma the same formula yields the
    # bonus distribution p itself
    p_row = jnp.take_along_axis(
        t_probs, n_acc[:, None, None], 1)[:, 0]       # [S, V]
    q_pad = jnp.concatenate([d_probs, jnp.zeros((S, 1, V))], 1)
    q_row = jnp.take_along_axis(q_pad, n_acc[:, None, None], 1)[:, 0]
    residual = jnp.maximum(p_row - q_row, 0.0)
    norm = residual.sum(-1, keepdims=True)
    # rejection guarantees residual mass > 0; guard anyway (fall back to p)
    residual = jnp.where(norm > 0, residual / jnp.maximum(norm, _TINY), p_row)
    corr_sampled = jax.random.categorical(kb, jnp.log(residual + _TINY), -1)
    greedy_slot = state["temperature"] <= 0.0
    corrected = jnp.where(greedy_slot, jnp.argmax(residual, -1),
                          corr_sampled).astype(jnp.int32)

    # ---- commit ------------------------------------------------------------
    commit_toks = jnp.concatenate([props, props[:, -1:]], 1)  # [S, gamma+1]
    commit_toks = commit_toks.at[arange, n_acc].set(corrected)
    # committed count before stop/max_new truncation
    count = n_acc + 1
    stop_hit = (commit_toks[..., None] == state["stop"][:, None, :]).any(-1)
    in_commit = jnp.arange(gamma + 1)[None] < count[:, None]
    stop_pos = jnp.where(stop_hit & in_commit, jnp.arange(gamma + 1)[None],
                         gamma + 1).min(1)            # first stop, or γ+1
    eff = jnp.minimum(count, stop_pos + 1)
    eff = jnp.minimum(eff, state["max_new"] - state["gen_count"])
    eff = jnp.minimum(eff, Lmax - L0)
    eff = jnp.where(live, jnp.maximum(eff, 0), 0)

    # per-token behaviour log-probs under the target sampling law (greedy
    # slots: the raw model log-softmax, matching sample_from_logits)
    lp_filtered = jnp.log(jnp.maximum(
        jnp.take_along_axis(t_probs, commit_toks[..., None], -1)[..., 0],
        _TINY))
    lp_raw = jnp.take_along_axis(
        jax.nn.log_softmax(t_raw, -1), commit_toks[..., None], -1)[..., 0]
    lp_commit = jnp.where(greedy_slot[:, None], lp_raw, lp_filtered)

    keep = jnp.arange(gamma + 1)[None] < eff[:, None]           # [S, γ+1]
    tok_pos = jnp.clip(L0[:, None] + jnp.arange(gamma + 1)[None], 0, Lmax - 1)
    cur_toks = state["tokens"][arange[:, None], tok_pos]
    tokens = state["tokens"].at[arange[:, None], tok_pos].set(
        jnp.where(keep, commit_toks, cur_toks))
    Gmax = state["lps"].shape[1]
    lp_pos = jnp.clip(state["gen_count"][:, None] + jnp.arange(gamma + 1),
                      0, Gmax - 1)
    cur_lps = state["lps"][arange[:, None], lp_pos]
    lps = state["lps"].at[arange[:, None], lp_pos].set(
        jnp.where(keep, lp_commit, cur_lps))

    g_new = state["gen_count"] + eff
    len_new = L0 + eff
    hit_stop_any = (stop_pos < count) & live
    done_new = state["done"] | (live & (
        hit_stop_any | (g_new >= state["max_new"]) | (len_new >= Lmax)))
    state = state.update({
        "tokens": tokens, "lps": lps, "length": len_new,
        "gen_count": g_new, "done": done_new,
    })
    return cache_t, state, eff


def ngram_propose(state: TDict, gamma: int, k: int = 2):
    """Draft-free prompt-lookup proposals (the vLLM ngram-speculation
    analogue): match each slot's most recent ``k``-gram against its own
    earlier context and propose the ``gamma`` tokens that followed the
    most recent earlier occurrence.  Returns ``(toks, props)`` with the
    proposals staged beyond each frontier; the proposal distribution is
    the one-hot at ``props`` (accept prob = p(x) under the target — the
    accept/reject theorem holds for any q, so this stays exact)."""
    tokens = state["tokens"]
    S, Lmax = tokens.shape
    arange = jnp.arange(S)
    live = state["active"] & ~state["done"]
    L0 = state["length"]

    # key gram: the last k tokens [S, k] (key[i] = tokens[L0-k+i])
    key_idx = jnp.clip((L0 - k)[:, None] + jnp.arange(k)[None], 0, Lmax - 1)
    key_gram = tokens[arange[:, None], key_idx]
    # candidate gram ENDING at j (inclusive): tokens[j-k+1 .. j]
    j = jnp.arange(Lmax)
    cand_idx = jnp.clip(j[:, None] - (k - 1) + jnp.arange(k)[None],
                        0, Lmax - 1)                      # [Lmax, k]
    cand = tokens[:, cand_idx]                            # [S, Lmax, k]
    match = (cand == key_gram[:, None, :]).all(-1)
    match &= (j[None] >= k - 1) & (j[None] <= (L0 - 2)[:, None])
    best_j = jnp.where(match, j[None], -1).max(1)         # [S], -1 = none
    # proposals: tokens[best_j+1 .. best_j+gamma], with reads CLAMPED at
    # the frontier (L0-1): continuation beyond the last committed token is
    # unknown, so the clamp repeats it — exactly right for constant runs
    # (the adjacent-repeat match), harmlessly rejected otherwise
    prop_idx = jnp.clip(best_j[:, None] + 1 + jnp.arange(gamma)[None],
                        0, jnp.maximum(L0 - 1, 0)[:, None])
    props = jnp.where((best_j >= 0)[:, None],
                      tokens[arange[:, None], prop_idx],
                      jnp.asarray(state["pad_id"], jnp.int32))
    props = props.astype(jnp.int32)
    # stage beyond the frontier for the verify window
    stage_idx = jnp.clip(L0[:, None] + jnp.arange(gamma)[None], 0, Lmax - 1)
    cur = tokens[arange[:, None], stage_idx]
    toks = tokens.at[arange[:, None], stage_idx].set(
        jnp.where(live[:, None], props, cur))
    return toks, props


def ngram_round(serve_t: ServeLM, params_t, cache_t, state: TDict, key,
                gamma: int, k: int = 2):
    """One draft-free speculative round: n-gram proposals + target verify.
    Commits 1..gamma+1 tokens per live slot; exact for greedy and sampled
    targets alike."""
    kv, kb = jax.random.split(key)
    toks, props = ngram_propose(state, gamma, k)
    V = serve_t.vocab_size
    d_probs = jax.nn.one_hot(props, V, dtype=jnp.float32)   # [S, gamma, V]
    return _verify_commit(serve_t, params_t, cache_t, state, toks, props,
                          d_probs, kv, kb, gamma)


def ngram_decode_chunk(serve_t, params_t, cache_t, state: TDict, key,
                       n_rounds: int, gamma: int, k: int = 2):
    """``n_rounds`` n-gram speculative rounds under ``lax.scan``; returns
    ``(cache_t, state, committed_total, live_slot_rounds)``."""

    def body(carry, kk):
        cache_t, state = carry
        cache_t, state, eff = ngram_round(serve_t, params_t, cache_t, state,
                                          kk, gamma, k)
        return (cache_t, state), eff

    keys = jax.random.split(key, n_rounds)
    (cache_t, state), effs = jax.lax.scan(body, (cache_t, state), keys)
    return cache_t, state, effs.sum(), (effs > 0).sum()


def speculative_decode_chunk(serve_t, serve_d, params_t, params_d, cache_t,
                             cache_d, state: TDict, key, n_rounds: int,
                             gamma: int):
    """``n_rounds`` speculative rounds under ``lax.scan`` (one device
    dispatch; each round commits 1..gamma+1 tokens per live slot).  Returns
    ``(cache_t, cache_d, state, committed_total, live_slot_rounds)`` — the
    latter counts (slot, round) pairs that were live, so
    ``committed_total / live_slot_rounds`` is the true per-sequence
    acceptance rate undiluted by idle rounds."""

    def body(carry, k):
        cache_t, cache_d, state = carry
        cache_t, cache_d, state, eff = speculative_round(
            serve_t, serve_d, params_t, params_d, cache_t, cache_d, state,
            k, gamma)
        return (cache_t, cache_d, state), eff

    keys = jax.random.split(key, n_rounds)
    (cache_t, cache_d, state), effs = jax.lax.scan(
        body, (cache_t, cache_d, state), keys)
    return cache_t, cache_d, state, effs.sum(), (effs > 0).sum()
