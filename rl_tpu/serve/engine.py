"""Device kernels for the native LLM serving engine.

The serving model (:class:`ServeLM`) is a twin of
:class:`rl_tpu.modules.transformer.TransformerLM` with an *explicit* KV
cache: the cache is a plain pytree argument (donate-able, shard-able) rather
than a flax variable collection, attention takes a per-slot absolute write
position, and the attention mask is derived purely from positions — so

* prompts may be **ragged** (left-aligned + lengths; closes the documented
  ``lm_generate_cached`` fixed-length limitation),
* prefill runs **in parallel over the prompt length** (one forward, not P
  sequential steps) and may start at a nonzero offset (multi-turn
  continuation re-uses the slot's existing cache — the prefix-cache
  analogue),
* decode advances *all* slots one token per step under ``lax.scan``
  (chunked decode), each slot carrying its own sampling parameters.

The parameter tree is **identical** to ``TransformerLM`` (submodule names
are pinned), so trained params drop in unchanged and the Megatron-style TP
rules in :mod:`rl_tpu.parallel.llm_tp` apply as-is.

Reference surface: vLLM's engine + ``SamplingParams``
(``/root/reference/torchrl/modules/llm/backends/vllm/vllm_async.py:176,504``
engine args; the reference wraps vLLM rather than owning serving).  On TPU
the idiomatic design is fixed slots + static shapes, not paged memory: a
"page" here is one slot row of the ``[S, L, H, Dh]`` cache.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rl_tpu.data import TDict

__all__ = [
    "ServeLM", "SamplingParams", "TokenDFA", "init_slot_cache",
    "init_slot_state", "prefill", "decode_chunk", "decode_step",
    "sample_from_logits",
]


class TokenDFA:
    """Grammar-constrained ("guided") decoding as a token-level DFA — the
    exact static-shape core of vLLM/outlines-style structured generation.

    ``transition[state, token] = next_state``, with ``-1`` marking a
    forbidden token in that state.  The DFA constrains GENERATED tokens
    only: it starts at ``start_state`` after the prompt and advances on
    each committed token.  States should either allow at least one token
    or allow the request's stop token (a state with no legal token
    degenerates to an unconstrained distribution — build total DFAs).
    """

    def __init__(self, transition, start_state: int = 0):
        self.transition = np.asarray(transition, np.int32)
        if self.transition.ndim != 2:
            raise ValueError("transition must be [n_states, vocab]")
        self.start_state = int(start_state)
        if not (0 <= self.start_state < self.transition.shape[0]):
            raise ValueError("start_state out of range")

_NEG = -1e30


class _ServeAttention(nn.Module):
    """Multi-head attention over an explicit per-slot KV cache.

    Parameter-compatible with ``nn.MultiHeadDotProductAttention`` (DenseGeneral
    submodules named query/key/value/out; q scaled by 1/sqrt(head_dim); mask
    applied pre-softmax as a large negative) so ``TransformerLM`` params load
    unchanged.
    """

    n_heads: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, kv, write_pos):
        # h [S, T, D]; kv = (k_cache, v_cache) each [S, L, H, Dh];
        # write_pos [S] — absolute position of h[:, 0].
        S, T, _ = h.shape
        Dh = self.d_model // self.n_heads
        proj = functools.partial(
            nn.DenseGeneral, features=(self.n_heads, Dh), axis=-1,
            dtype=self.dtype)
        q = proj(name="query")(h)   # [S, T, H, Dh]
        k = proj(name="key")(h)
        v = proj(name="value")(h)
        k_cache, v_cache = kv
        L = k_cache.shape[1]
        idx = write_pos[:, None] + jnp.arange(T)[None]          # [S, T]
        safe = jnp.clip(idx, 0, L - 1)
        rows = jnp.arange(S)[:, None]
        k_cache = k_cache.at[rows, safe].set(k.astype(k_cache.dtype))
        v_cache = v_cache.at[rows, safe].set(v.astype(v_cache.dtype))
        q = q / jnp.sqrt(Dh).astype(self.dtype)
        scores = jnp.einsum("sthd,slhd->shtl", q,
                            k_cache.astype(self.dtype))
        j = jnp.arange(L)
        mask = j[None, None, None, :] <= safe[:, None, :, None]  # [S,1,T,L]
        scores = jnp.where(mask, scores, jnp.asarray(_NEG, scores.dtype))
        w = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("shtl,slhd->sthd", w, v_cache.astype(self.dtype))
        out = nn.DenseGeneral(features=self.d_model, axis=(-2, -1),
                              dtype=self.dtype, name="out")(ctx)
        return out, (k_cache, v_cache)


class _ServeBlock(nn.Module):
    n_heads: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, write_pos):
        h = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")(x)
        h, kv = _ServeAttention(
            self.n_heads, self.d_model, self.dtype,
            name="MultiHeadDotProductAttention_0")(h, kv, write_pos)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_1")(x)
        h = nn.Dense(4 * self.d_model, dtype=self.dtype, name="Dense_0")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="Dense_1")(h)
        return x + h, kv


class _ServeCore(nn.Module):
    n_layers: int
    n_heads: int
    d_model: int
    max_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache, write_pos):
        x = nn.Dense(self.d_model, dtype=self.dtype, name="Dense_0")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.d_model))
        T = x.shape[-2]
        idx = jnp.clip(write_pos[:, None] + jnp.arange(T)[None],
                       0, self.max_len - 1)
        x = x + jnp.asarray(pos, self.dtype)[idx]
        new_cache = []
        for i in range(self.n_layers):
            x, kv = _ServeBlock(self.n_heads, self.d_model, self.dtype,
                                name=f"_Block_{i}")(x, cache[i], write_pos)
            new_cache.append(kv)
        x = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")(x)
        return x, tuple(new_cache)


class ServeLM(nn.Module):
    """Explicit-cache serving twin of ``TransformerLM``.

    ``apply({"params": p}, tokens [S,T], cache, write_pos [S]) ->
    (logits [S,T,V], new_cache)`` — writes the chunk's K/V at absolute
    positions ``write_pos + [0..T)`` and attends each query position ``p``
    over cache positions ``<= p`` (garbage beyond a slot's frontier is never
    visible; done-slot re-writes are idempotent).
    """

    vocab_size: int
    n_layers: int = 2
    n_heads: int = 4
    d_model: int = 128
    max_len: int = 512
    dtype: Any = jnp.float32

    @classmethod
    def from_lm(cls, lm) -> "ServeLM":
        """Build from a :class:`TransformerLM` (training twin) config."""
        return cls(vocab_size=lm.vocab_size, n_layers=lm.n_layers,
                   n_heads=lm.n_heads, d_model=lm.d_model,
                   max_len=lm.max_len, dtype=lm.dtype)

    @nn.compact
    def __call__(self, tokens, cache, write_pos):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="Embed_0")(jnp.asarray(tokens, jnp.int32))
        x, cache = _ServeCore(
            n_layers=self.n_layers, n_heads=self.n_heads,
            d_model=self.d_model, max_len=self.max_len, dtype=self.dtype,
            name="CausalTransformer_0")(x, cache, write_pos)
        return nn.Dense(self.vocab_size, dtype=self.dtype,
                        name="Dense_0")(x), cache


def init_slot_cache(lm, n_slots: int):
    """Zeroed explicit KV cache: a tuple (per layer) of ``(k, v)`` arrays
    ``[n_slots, max_len, n_heads, head_dim]`` in the model dtype — same
    layout as the flax decode cache, so ``llm_tp.shard_lm_cache``-style
    heads-dim sharding applies."""
    dh = lm.d_model // lm.n_heads
    shape = (n_slots, lm.max_len, lm.n_heads, dh)
    z = lambda: jnp.zeros(shape, lm.dtype)
    return tuple((z(), z()) for _ in range(lm.n_layers))


class SamplingParams:
    """Per-request sampling controls (the vLLM ``SamplingParams`` surface).

    Defaults are pass-through: ``top_k=0`` / ``top_p=1`` / ``min_p=0`` /
    ``repetition_penalty=1`` disable each filter; ``temperature=0`` is
    greedy.  ``stop`` is a sequence of token ids (up to the state's
    ``n_stop``); generation records the stop token then halts.
    """

    def __init__(self, *, max_new_tokens: int, temperature: float = 1.0,
                 top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0,
                 repetition_penalty: float = 1.0, stop: tuple = (),
                 prompt_logprobs: bool = False, min_tokens: int = 0,
                 logit_bias: dict | None = None, use_grammar: bool = False):
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.min_p = float(min_p)
        self.repetition_penalty = float(repetition_penalty)
        self.stop = tuple(int(s) for s in stop)
        # min_tokens: stop tokens are suppressed (logit -> -inf) until this
        # many tokens are committed (HF min_new_tokens / vLLM min_tokens)
        self.min_tokens = int(min_tokens)
        # logit_bias: {token_id: additive bias} applied pre-softmax to every
        # decode position (the OpenAI/vLLM logit_bias surface; -inf-like
        # values ban tokens, large positive values force them)
        self.logit_bias = dict(logit_bias) if logit_bias else None
        # constrain generation with the ENGINE's TokenDFA grammar
        self.use_grammar = bool(use_grammar)
        # also return per-token log-probs of the PROMPT under the model
        # (the vLLM ``prompt_logprobs`` / OpenAI ``echo`` surface; the RL
        # rescoring path gets behaviour log-probs for the whole sequence).
        # Position 0 scores 0.0 by convention (no context in the window).
        self.prompt_logprobs = bool(prompt_logprobs)

    def as_row(self, n_stop: int) -> dict:
        if len(self.stop) > n_stop:
            raise ValueError(f"{len(self.stop)} stop tokens > n_stop={n_stop}")
        stop = list(self.stop) + [-1] * (n_stop - len(self.stop))
        return dict(max_new=self.max_new_tokens, temperature=self.temperature,
                    top_k=self.top_k, top_p=self.top_p, min_p=self.min_p,
                    repetition_penalty=self.repetition_penalty,
                    min_tokens=self.min_tokens,
                    use_grammar=bool(self.use_grammar),
                    stop=np.asarray(stop, np.int32))

    def bias_row(self, vocab_size: int) -> np.ndarray:
        row = np.zeros(vocab_size, np.float32)
        if self.logit_bias:
            for t, b in self.logit_bias.items():
                row[int(t)] = float(b)
        return row


def init_slot_state(n_slots: int, max_len: int, max_new_cap: int,
                    *, n_stop: int = 4, pad_id: int = 0,
                    vocab_size: int | None = None,
                    grammar: "TokenDFA | None" = None) -> TDict:
    """Fresh slot table.  ``max_new_cap`` bounds any request's generation
    length (static log-prob buffer).  All fields are per-slot arrays:

    tokens [S, max_len], length/gen_count/max_new [S], active/done [S],
    lps [S, max_new_cap], sampling params, stop [S, n_stop].  Passing
    ``vocab_size`` additionally allocates the per-slot ``logit_bias``
    table [S, V] (omitted → the bias surface is disabled).
    """
    S = int(n_slots)
    extra = {}
    if vocab_size:
        extra["logit_bias"] = jnp.zeros((S, int(vocab_size)), jnp.float32)
    if grammar is not None:
        extra["dfa_trans"] = jnp.asarray(grammar.transition, jnp.int32)
        extra["dfa_start"] = jnp.asarray(grammar.start_state, jnp.int32)
        extra["dfa_state"] = jnp.zeros(S, jnp.int32)
        extra["grammar_on"] = jnp.zeros(S, bool)
    return TDict(
        **extra,
        min_tokens=jnp.zeros(S, jnp.int32),
        tokens=jnp.full((S, max_len), pad_id, jnp.int32),
        length=jnp.zeros(S, jnp.int32),
        active=jnp.zeros(S, bool),
        done=jnp.zeros(S, bool),
        gen_count=jnp.zeros(S, jnp.int32),
        max_new=jnp.zeros(S, jnp.int32),
        lps=jnp.zeros((S, max_new_cap), jnp.float32),
        plps=jnp.zeros((S, max_len), jnp.float32),
        temperature=jnp.ones(S, jnp.float32),
        top_k=jnp.zeros(S, jnp.int32),
        top_p=jnp.ones(S, jnp.float32),
        min_p=jnp.zeros(S, jnp.float32),
        repetition_penalty=jnp.ones(S, jnp.float32),
        stop=jnp.full((S, n_stop), -1, jnp.int32),
        pad_id=jnp.asarray(pad_id, jnp.int32),
    )


def _filtered_logits(logits, temp, top_k, top_p, min_p):
    """Temperature + top-k/top-p/min-p filter pipeline over [N, V] logits
    with per-row parameters.  Returns ``(masked [N, V], greedy [N])`` —
    ``masked`` is the temperature-scaled logits with filtered entries at a
    large negative (softmax of it IS the sampling distribution);
    ``greedy`` rows (temp<=0) are left unscaled/unfiltered (their sampling
    law is the argmax one-hot)."""
    N, V = logits.shape
    greedy = temp <= 0.0
    scaled = logits / jnp.where(greedy, 1.0, temp)[:, None]

    # sorted-order thresholds (per-row k/p need value cutoffs, not lax.top_k)
    sort_desc = -jnp.sort(-scaled, axis=-1)                    # [N, V]
    probs = jax.nn.softmax(sort_desc, -1)
    csum = jnp.cumsum(probs, -1)
    k_eff = jnp.where((top_k <= 0) | (top_k > V), V, top_k)
    k_thresh = sort_desc[jnp.arange(N), k_eff - 1]
    # top-p: keep the smallest prefix whose mass reaches p (first always kept)
    keep_sorted = (csum - probs) < top_p[:, None]
    n_keep = jnp.maximum(keep_sorted.sum(-1), 1)
    p_thresh = sort_desc[jnp.arange(N), n_keep - 1]
    # min-p: prob >= min_p * p_max  ⇔  logit >= log(min_p) + max_logit
    mp_thresh = jnp.where(
        min_p > 0,
        jnp.log(jnp.maximum(min_p, 1e-30)) + sort_desc[:, 0], -jnp.inf)
    thresh = jnp.maximum(jnp.maximum(k_thresh, p_thresh), mp_thresh)
    keep = scaled >= thresh[:, None]
    masked = jnp.where(keep, scaled, _NEG)
    return jnp.where(greedy[:, None], scaled, masked), greedy


def _sampling_probs(masked, greedy):
    """The actual per-row sampling distribution as probs [N, V]: softmax of
    the filtered logits, or the argmax one-hot for greedy rows."""
    probs = jax.nn.softmax(masked, -1)
    one_hot = jax.nn.one_hot(jnp.argmax(masked, -1), masked.shape[-1],
                             dtype=probs.dtype)
    return jnp.where(greedy[:, None], one_hot, probs)


def _apply_repetition_penalty(logits, pen, tokens, length):
    """HF-convention context penalty: for tokens already in the slot's
    context (prompt + generated), positive logits divided by ``pen``,
    negative multiplied."""
    K, V = logits.shape
    valid = jnp.arange(tokens.shape[1])[None] < length[:, None]
    seen = jnp.zeros((K, V), bool).at[
        jnp.arange(K)[:, None], jnp.clip(tokens, 0, V - 1)].max(valid)
    pen = pen[:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen & (pen != 1.0), penalized, logits)


def sample_from_logits(logits, state: TDict, key, slot_ids=None):
    """Per-slot sampling: repetition penalty → temperature → top-k/top-p/
    min-p filters → categorical (or argmax when temperature==0).

    ``logits`` [K, V] float; slot params gathered at ``slot_ids`` (default:
    all slots in order).  Returns ``(token [K] int32, log_prob [K] f32)``
    where ``log_prob`` is under the *actual* sampling distribution (filtered
    + renormalized; for greedy, the unfiltered softmax — a deterministic
    choice has no sampling distribution, so we report the model's).
    """
    take = (lambda x: x) if slot_ids is None else (lambda x: x[slot_ids])
    logits = jnp.asarray(logits, jnp.float32)
    logits = _apply_repetition_penalty(
        logits, take(state["repetition_penalty"]), take(state["tokens"]),
        take(state["length"]))
    if state.get("logit_bias", None) is not None:
        logits = logits + take(state["logit_bias"])
    if state.get("dfa_trans", None) is not None:
        # grammar mask: forbid tokens with no DFA transition from the
        # slot's current state (a state with no legal token degenerates to
        # the unconstrained distribution rather than sampling uniform junk)
        allowed = state["dfa_trans"][take(state["dfa_state"])] >= 0
        on = take(state["grammar_on"])[:, None]
        any_ok = allowed.any(-1, keepdims=True)
        logits = jnp.where(on & any_ok & ~allowed,
                           jnp.asarray(_NEG, logits.dtype), logits)
    # min_tokens: suppress stop tokens until enough tokens are committed
    K, V = logits.shape
    below = take(state["gen_count"]) < take(state["min_tokens"])
    stop = take(state["stop"])
    for i in range(stop.shape[1]):
        sid = jnp.clip(stop[:, i], 0, V - 1)
        cur = logits[jnp.arange(K), sid]
        logits = logits.at[jnp.arange(K), sid].set(
            jnp.where(below & (stop[:, i] >= 0), _NEG, cur))
    raw_lp = jax.nn.log_softmax(logits, -1)
    masked, greedy = _filtered_logits(
        logits, take(state["temperature"]), take(state["top_k"]),
        take(state["top_p"]), take(state["min_p"]))
    sampled = jax.random.categorical(key, masked, -1)
    tok = jnp.where(greedy, jnp.argmax(masked, -1), sampled).astype(jnp.int32)
    lp_masked = jnp.take_along_axis(
        jax.nn.log_softmax(masked, -1), tok[:, None], 1)[:, 0]
    lp_raw = jnp.take_along_axis(raw_lp, tok[:, None], 1)[:, 0]
    return tok, jnp.where(greedy, lp_raw, lp_masked)


def _append_token(state: TDict, slot_ids, tok, lp, live_mask=None) -> TDict:
    """Record a sampled token for slots ``slot_ids`` (active & not done):
    write at ``tokens[length]``, bump length/gen_count, store lp, detect
    stop/max_new.  ``slot_ids`` must be unique within one call (duplicate
    scatter order is undefined); masked-out rows write back their slot's
    current values, which is a no-op."""
    live = state["active"][slot_ids] & ~state["done"][slot_ids]
    if live_mask is not None:
        live = live & live_mask
    length = state["length"][slot_ids]
    L = state["tokens"].shape[1]
    pos = jnp.clip(length, 0, L - 1)
    old_tok = state["tokens"][slot_ids, pos]
    new_tok = jnp.where(live, tok, old_tok)
    tokens = state["tokens"].at[slot_ids, pos].set(new_tok)
    g = state["gen_count"][slot_ids]
    gpos = jnp.clip(g, 0, state["lps"].shape[1] - 1)
    old_lp = state["lps"][slot_ids, gpos]
    lps = state["lps"].at[slot_ids, gpos].set(jnp.where(live, lp, old_lp))
    hit_stop = (tok[:, None] == state["stop"][slot_ids]).any(-1)
    g_new = jnp.where(live, g + 1, g)
    done_new = state["done"][slot_ids] | (
        live & (hit_stop | (g_new >= state["max_new"][slot_ids])
                | (length + 1 >= L)))
    updates = {
        "tokens": tokens,
        "length": state["length"].at[slot_ids].set(
            jnp.where(live, length + 1, length)),
        "gen_count": state["gen_count"].at[slot_ids].set(g_new),
        "lps": lps,
        "done": state["done"].at[slot_ids].set(done_new),
    }
    if state.get("dfa_trans", None) is not None:
        # advance the grammar DFA on the committed token
        trans = state["dfa_trans"]
        cur = state["dfa_state"][slot_ids]
        nxt = trans[cur, jnp.clip(tok, 0, trans.shape[1] - 1)]
        adv = live & state["grammar_on"][slot_ids]
        updates["dfa_state"] = state["dfa_state"].at[slot_ids].set(
            jnp.where(adv, jnp.maximum(nxt, 0), cur))
    return state.update(updates)


def prefill(serve: ServeLM, params, cache, state: TDict, slot_ids,
            prompts, plens, req: TDict, key, valid=None, start=None):
    """Admit up to K requests: run one parallel forward over the (ragged,
    left-aligned) prompt chunk for the chosen slots, scatter K/V into the
    cache, install per-request sampling params, and sample each request's
    first token.

    Args: ``slot_ids`` [K] target slots; ``prompts`` [K, P] left-aligned;
    ``plens`` [K] true lengths (1..P); ``req`` a TDict of per-request rows
    (``max_new/temperature/top_k/top_p/min_p/repetition_penalty/stop``,
    see :meth:`SamplingParams.as_row`); ``valid`` [K] masks padding rows
    (invalid rows leave slot + cache untouched — prefill shapes are
    bucketed by the host); ``start`` [K] absolute offsets (default 0;
    nonzero = multi-turn continuation over the slot's existing cache).

    Returns ``(cache, state)``.
    """
    slot_ids = jnp.asarray(slot_ids, jnp.int32)
    prompts = jnp.asarray(prompts, jnp.int32)
    plens = jnp.asarray(plens, jnp.int32)
    K, P = prompts.shape
    valid = jnp.ones(K, bool) if valid is None else jnp.asarray(valid, bool)
    start = jnp.zeros(K, jnp.int32) if start is None else jnp.asarray(
        start, jnp.int32)

    # gather the K slots' cache rows, forward, scatter back where valid
    sub_cache = jax.tree.map(lambda c: c[slot_ids], cache,
                             is_leaf=lambda x: isinstance(x, jnp.ndarray))
    logits, new_sub = serve.apply({"params": params}, prompts, sub_cache,
                                  start)
    def _merge(old, new):
        return jnp.where(valid[:, None, None, None], new, old)
    merged = jax.tree.map(_merge, sub_cache, new_sub,
                          is_leaf=lambda x: isinstance(x, jnp.ndarray))
    cache = jax.tree.map(
        lambda c, m: c.at[slot_ids].set(m), cache, merged,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))

    # install the requests into the slot table
    L = state["tokens"].shape[1]
    arangeP = jnp.arange(P)
    tok_idx = jnp.clip(start[:, None] + arangeP[None], 0, L - 1)  # [K, P]
    in_prompt = (arangeP[None] < plens[:, None]) & valid[:, None]
    old_rows = state["tokens"][slot_ids[:, None], tok_idx]
    tokens = state["tokens"].at[slot_ids[:, None], tok_idx].set(
        jnp.where(in_prompt, prompts, old_rows))
    end = start + plens                                      # next write pos
    sel = lambda new, old: jnp.where(valid, new, old[slot_ids])
    state = state.update({
        "tokens": tokens,
        "length": state["length"].at[slot_ids].set(sel(end, state["length"])),
        "active": state["active"].at[slot_ids].set(
            sel(jnp.ones(K, bool), state["active"])),
        "done": state["done"].at[slot_ids].set(
            sel(jnp.zeros(K, bool), state["done"])),
        "gen_count": state["gen_count"].at[slot_ids].set(
            sel(jnp.zeros(K, jnp.int32), state["gen_count"])),
        "max_new": state["max_new"].at[slot_ids].set(
            sel(jnp.asarray(req["max_new"], jnp.int32), state["max_new"])),
        "min_tokens": state["min_tokens"].at[slot_ids].set(
            sel(jnp.asarray(req.get("min_tokens", jnp.zeros(K, jnp.int32)),
                            jnp.int32), state["min_tokens"])),
        "temperature": state["temperature"].at[slot_ids].set(
            sel(jnp.asarray(req["temperature"], jnp.float32),
                state["temperature"])),
        "top_k": state["top_k"].at[slot_ids].set(
            sel(jnp.asarray(req["top_k"], jnp.int32), state["top_k"])),
        "top_p": state["top_p"].at[slot_ids].set(
            sel(jnp.asarray(req["top_p"], jnp.float32), state["top_p"])),
        "min_p": state["min_p"].at[slot_ids].set(
            sel(jnp.asarray(req["min_p"], jnp.float32), state["min_p"])),
        "repetition_penalty": state["repetition_penalty"].at[slot_ids].set(
            sel(jnp.asarray(req["repetition_penalty"], jnp.float32),
                state["repetition_penalty"])),
        "stop": state["stop"].at[slot_ids].set(jnp.where(
            valid[:, None], jnp.asarray(req["stop"], jnp.int32),
            state["stop"][slot_ids])),
        "lps": state["lps"].at[slot_ids].set(jnp.where(
            valid[:, None], jnp.zeros_like(state["lps"][slot_ids]),
            state["lps"][slot_ids])),
    })

    if state.get("dfa_trans", None) is not None:
        # grammar constrains GENERATED tokens only: the DFA starts at
        # start_state after the prompt (the prompt is context, not output)
        ug = jnp.asarray(req.get("use_grammar", jnp.zeros(K, bool)), bool)
        state = state.update({
            "dfa_state": state["dfa_state"].at[slot_ids].set(
                sel(jnp.broadcast_to(state["dfa_start"], (K,)),
                    state["dfa_state"])),
            "grammar_on": state["grammar_on"].at[slot_ids].set(
                sel(ug, state["grammar_on"])),
        })

    if state.get("logit_bias", None) is not None:
        # requests without a bias RESET their slot's row (a reused slot
        # must not inherit the previous request's biases)
        new_bias = (jnp.asarray(req["logit_bias"], jnp.float32)
                    if "logit_bias" in req else
                    jnp.zeros((K, state["logit_bias"].shape[1]),
                              jnp.float32))
        lb = state["logit_bias"].at[slot_ids].set(jnp.where(
            valid[:, None], new_bias, state["logit_bias"][slot_ids]))
        state = state.set("logit_bias", lb)

    # prompt log-probs (teacher-forced scoring of the prompt itself, the
    # vLLM prompt_logprobs surface): logits at window position i-1 score
    # prompts[:, i]; window position 0 has no in-window context (scored 0)
    if P > 1:
        lp_all = jax.nn.log_softmax(jnp.asarray(logits[:, :-1], jnp.float32),
                                    -1)                       # [K, P-1, V]
        scored = jnp.take_along_axis(
            lp_all, prompts[:, 1:, None], -1)[..., 0]         # [K, P-1]
        write = in_prompt[:, 1:]
        old_plp = state["plps"][slot_ids[:, None], tok_idx[:, 1:]]
        plps = state["plps"].at[slot_ids[:, None], tok_idx[:, 1:]].set(
            jnp.where(write, scored, old_plp))
        zpos = state["plps"][slot_ids, tok_idx[:, 0]]
        plps = plps.at[slot_ids, tok_idx[:, 0]].set(
            jnp.where(valid, jnp.zeros(K), zpos))
        state = state.set("plps", plps)

    # sample each request's first token from the last valid prompt logit;
    # invalid (bucket-padding) rows are masked out of the append — their
    # slot may be mid-decode on another live request
    last = jnp.take_along_axis(
        logits, jnp.clip(plens - 1, 0, P - 1)[:, None, None], 1)[:, 0]
    tok, lp = sample_from_logits(last, state, key, slot_ids=slot_ids)
    state = _append_token(state, slot_ids, tok, lp, live_mask=valid)
    return cache, state


def decode_step(serve: ServeLM, params, cache, state: TDict, key):
    """One token for every slot: feed each slot's newest token (position
    ``length-1``), write its K/V, sample the next.  Inactive/done slots
    no-op (idempotent cache writes, masked state updates)."""
    S = state["tokens"].shape[0]
    p = jnp.clip(state["length"] - 1, 0, state["tokens"].shape[1] - 1)
    tok_in = state["tokens"][jnp.arange(S), p][:, None]          # [S, 1]
    logits, cache = serve.apply({"params": params}, tok_in, cache, p)
    tok, lp = sample_from_logits(logits[:, 0], state, key)
    state = _append_token(state, jnp.arange(S), tok, lp)
    return cache, state


def decode_chunk(serve: ServeLM, params, cache, state: TDict, key,
                 n_steps: int):
    """``n_steps`` decode steps under ``lax.scan`` — one device dispatch
    for a whole chunk (the tunnel/host round-trip amortizer; finished slots
    idle harmlessly until the host harvests them)."""

    def body(carry, k):
        cache, state = carry
        cache, state = decode_step(serve, params, cache, state, k)
        return (cache, state), None

    keys = jax.random.split(key, n_steps)
    (cache, state), _ = jax.lax.scan(body, (cache, state), keys)
    return cache, state
