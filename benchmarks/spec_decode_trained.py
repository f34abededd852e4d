"""Speculative decoding with TRAINED models: real acceptance rate.

The serving bench uses random-init models, where draft/target agreement is
accidental.  This measures the real thing: SFT the 10M-param target
(8L/d320) and a ~0.6M draft (2L/d128) on the same 3-digit-addition corpus,
then decode 512 prompts through the serving engine plain vs speculative
(greedy), asserting token-identical outputs (the accept/reject exactness
contract) and reporting the ACCEPTANCE RATE — tokens committed per verify
forward, the input to the standard speculative latency model.

Scope note: at 10M params behind this container's ~26 ms dispatch tunnel,
wall-clock numbers measure dispatch counts, not the latency win —
speculation pays off when a T=1 decode step is weight-bandwidth-bound
(large models, small batch), where a T=γ+1 verify costs the same wall
time as one step and acceptance ≈ a is an ≈a× latency win.  The
acceptance rate measured here is exactly that `a`.

Run serially on the chip::

    python benchmarks/spec_decode_trained.py [sft_iters=1500] [n=512]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_tpu.modules.transformer import TransformerLM
from rl_tpu.serve import ServingEngine

# char task: "abc+def=" -> zero-padded 4-digit sum + '$'
CHARS = "0123456789+=$_"
PAD = 13
V = 14
ND = 3
P_LEN, R_LEN = 2 * ND + 2, ND + 2


def encode(s):
    return np.asarray([CHARS.index(c) for c in s], np.int32)


def batch_tokens(rng, n):
    a = rng.integers(10 ** ND, size=n)
    b = rng.integers(10 ** ND, size=n)
    rows = [encode(f"{x:0{ND}d}+{y:0{ND}d}=" + f"{x + y:0{ND + 1}d}$")
            for x, y in zip(a, b)]
    return jnp.asarray(np.stack(rows))


def sft(lm, params, rng, iters, lr=3e-4, batch=512, stop_exact=0.97):
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def update(p, o, toks):
        def loss(q):
            logits = lm.apply({"params": q}, toks)
            lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), -1)
            pos = jnp.arange(R_LEN) + P_LEN - 1
            tgt = jax.lax.dynamic_slice_in_dim(toks, P_LEN, R_LEN, 1)
            return -jnp.take_along_axis(
                lp[:, pos, :], tgt[..., None], -1).mean()

        l, grads = jax.value_and_grad(loss)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, l

    @jax.jit
    def greedy_exact(p, toks):
        prompts, gold = toks[:, :P_LEN], toks[:, P_LEN:]
        t = jnp.concatenate(
            [prompts, jnp.full((toks.shape[0], R_LEN), PAD, jnp.int32)], 1)
        for i in range(R_LEN):
            logits = lm.apply({"params": p}, t)[:, P_LEN + i - 1]
            t = t.at[:, P_LEN + i].set(jnp.argmax(logits, -1))
        return (t[:, P_LEN:] == gold).all(-1).mean()

    for it in range(iters):
        params, opt, l = update(params, opt, batch_tokens(rng, batch))
        if it % 100 == 0 or it == iters - 1:
            acc = float(greedy_exact(params, batch_tokens(rng, 512)))
            print(f"  sft {it}: loss={float(l):.4f} exact={acc:.3f}",
                  flush=True)
            if acc >= stop_exact:
                break
    return params, acc


def run_engine(lm, params, prompts, draft=None, gamma=4):
    eng = ServingEngine(lm, params, n_slots=256, max_new_cap=R_LEN,
                        prefill_width=64, decode_chunk_len=R_LEN,
                        prompt_buckets=(P_LEN,), draft=draft, gamma=gamma)
    eng.generate([prompts[0]], max_new_tokens=R_LEN, temperature=0.0)  # warm
    t0 = time.perf_counter()
    reqs = eng.generate(prompts, max_new_tokens=R_LEN, temperature=0.0)
    dt = time.perf_counter() - t0
    toks = [tuple(r.tokens) for r in reqs]
    stats = dict(wall_s=round(dt, 3),
                 tokens_per_s=round(sum(map(len, toks)) / dt, 1),
                 decode_dispatches=(eng.decode_steps // eng._spec_rounds
                                    if draft else
                                    eng.decode_steps // eng.decode_chunk_len))
    if draft:
        stats["acceptance"] = round(eng.spec_acceptance, 3)
    eng.close()
    return toks, stats


def main(sft_iters=1500, n=512, seed=0):
    rng = np.random.default_rng(seed)
    target = TransformerLM(vocab_size=V, n_layers=8, d_model=320, n_heads=8,
                           max_len=P_LEN + R_LEN + 8, dtype=jnp.bfloat16)
    draft = TransformerLM(vocab_size=V, n_layers=2, d_model=128, n_heads=8,
                          max_len=P_LEN + R_LEN + 8, dtype=jnp.bfloat16)
    tp = target.init(jax.random.PRNGKey(seed),
                     jnp.zeros((1, 8), jnp.int32))["params"]
    dp = draft.init(jax.random.PRNGKey(seed + 1),
                    jnp.zeros((1, 8), jnp.int32))["params"]
    count = lambda p: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
    print(f"target {count(tp)/1e6:.1f}M / draft {count(dp)/1e6:.2f}M params",
          flush=True)
    print("SFT target:", flush=True)
    tp, t_acc = sft(target, tp, rng, sft_iters)
    print("SFT draft:", flush=True)
    dp, d_acc = sft(draft, dp, rng, sft_iters)

    prompts = []
    for _ in range(n):
        a, b = int(rng.integers(10 ** ND)), int(rng.integers(10 ** ND))
        prompts.append([int(t) for t in encode(f"{a:0{ND}d}+{b:0{ND}d}=")])

    plain_toks, plain = run_engine(target, tp, prompts)
    spec_toks, spec = run_engine(target, tp, prompts, draft=(draft, dp),
                                 gamma=4)
    assert plain_toks == spec_toks, "speculative output != plain greedy"
    out = dict(target_exact=round(t_acc, 3), draft_exact=round(d_acc, 3),
               plain=plain, speculative=spec,
               wall_speedup=round(plain["wall_s"] / spec["wall_s"], 2),
               dispatch_ratio=round(plain["decode_dispatches"]
                                    / max(spec["decode_dispatches"], 1), 2),
               outputs_identical=True, n_prompts=n)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    kw = dict(a.split("=", 1) for a in sys.argv[1:])
    main(**{k: int(v) for k, v in kw.items()})
