"""Benchmark: pixel-PPO end-to-end throughput on one chip.

Flagship pipeline: 4096 on-device Breakout (MinAtar-style) envs stepping in
lockstep with a conv policy, GAE, and 4 minibatch PPO updates — everything
one fused jit.  Prints ONE JSON line.

Beyond the headline 10x10 MinAtar number the line carries (VERDICT r2
item #9 — map the bench to BASELINE-class workloads):

* ``pixel84``: the same pipeline at 84x84x4 frames with the Nature-DQN
  conv stack (32/64/64, 8/4/3 strides) in bfloat16 — the Atari-Pong
  BASELINE shape — plus a collect/GAE/update phase breakdown in ms;
* ``host_bridge``: HalfCheetah host-pool collection env-steps/s through
  the io_callback bridge (the SAC/PPO MuJoCo BASELINE data path),
  skipped gracefully when MuJoCo is unavailable.

Baseline: the north star is >=1M env-steps/s aggregate on a 16-chip slice
(BASELINE.md) → 62.5k steps/s/chip; vs_baseline is measured per-chip
throughput over that target.  (For scale: the reference's headline Dreamer
collection is ~15.6k env-fps on an H200, sota-implementations/dreamer/
README.md:162.)
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

PER_CHIP_TARGET = 1_000_000 / 16
# v5e peak: 197 TFLOP/s bf16 (394 int8).  The matmul_calibration line in
# the JSON reports what fraction of this a pure 8k^3 bf16 matmul actually
# reaches on THIS chip, keeping the MFU denominator honest.
V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9  # bytes/s — the other roofline axis


def _xla_flops(jitfn, *args) -> float | None:
    """Per-call FLOPs as counted by XLA's own cost model (no hand math)."""
    f, _ = _xla_cost(jitfn, *args)
    return f


def _xla_cost(jitfn, *args) -> tuple[float | None, float | None]:
    """(flops, bytes accessed) from XLA's cost model — the two roofline
    axes.  Bytes feed the bandwidth-ceiling MFU (see bench JSON
    ``pixel84_mfu_roofline_ceiling``): a program whose arithmetic
    intensity sits below the v5e crossover (~240 FLOP/byte at 197 bf16
    TFLOP/s / 819 GB/s) can NEVER reach matmul-calibration MFU no matter
    how well it schedules — its ceiling is AI × BW / peak."""
    try:
        ca = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        b = ca.get("bytes accessed")
        return (float(f) if f else None), (float(b) if b else None)
    except Exception:
        return None, None


def bench_matmul_calibration(n=8192, iters=30):
    """Measured TFLOP/s of a bare bf16 matmul chain — the honest ceiling."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(key, (n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return out.astype(jnp.float32).mean()

    _sync(chain(a, b))
    t0 = time.perf_counter()
    r = chain(a, b)
    _sync(r)
    dt = time.perf_counter() - t0
    return 2.0 * n * n * n * iters / dt


def _sync(x) -> float:
    # value read — block_until_ready does not reliably fence on this
    # container's tunneled PJRT backend
    return float(x)


def build_ppo(env, obs_shape, *, num_envs, steps, channels, kernels,
              strides, n_actions, dtype=jnp.float32, pixel_key="pixels"):
    from rl_tpu.collectors import Collector
    from rl_tpu.data import TDict
    from rl_tpu.modules import (MLP, Categorical, ConvNet,
                                ProbabilisticActor, Seq, TDModule)
    from rl_tpu.objectives import GAE, ClipPPOLoss

    net = Seq(
        TDModule(ConvNet(channels=channels, kernel_sizes=kernels,
                         strides=strides, dtype=dtype),
                 [pixel_key], ["hidden"]),
        TDModule(MLP(out_features=n_actions, num_cells=(512,),
                     activation="relu", dtype=dtype), ["hidden"], ["logits"]),
    )
    actor = ProbabilisticActor(net, Categorical, dist_keys=["logits"])

    class SeqValue:
        in_keys = [pixel_key]
        out_keys = ["state_value"]

        def __init__(self, seq):
            self.seq = seq

        def init(self, key, td):
            return self.seq.init(key, td)

        def __call__(self, params, td, key=None):
            return self.seq(params, td, key=key)

    critic = SeqValue(Seq(
        TDModule(ConvNet(channels=channels, kernel_sizes=kernels,
                         strides=strides, dtype=dtype), [pixel_key], ["h2"]),
        TDModule(MLP(out_features=1, num_cells=(512,), activation="relu",
                     dtype=dtype), ["h2"], ["state_value"]),
    ))
    key = jax.random.PRNGKey(0)
    td0 = TDict(**{pixel_key: jnp.zeros((1,) + obs_shape)})
    params = TDict(actor=actor.init(key, td0), critic=critic.init(key, td0))

    # the policy also writes V(s_t) during collection so GAE can run in
    # `shifted` mode (reference advantages.py:1883): V(s_{t+1}) comes from
    # shifting the stored values + ONE critic call on the final next
    # state, replacing a full second critic pass over the batch
    def policy(p, td, k):
        td = actor(p["actor"], td, key=k)
        return critic(p["critic"], td)

    collector = Collector(env, policy, frames_per_batch=num_envs * steps)
    gae = GAE(0.99, 0.95, critic, average_gae=True, shifted=True)
    loss_mod = ClipPPOLoss(actor, critic)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    M = 4  # minibatches

    def mb_step(params, opt_state, mbt):
        (total, _), grads = jax.value_and_grad(
            lambda p: loss_mod(p, mbt), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def update_phase(params, opt_state, batch, k):
        # Minibatching for ONE epoch over a FRESH on-policy batch: the
        # fixed strided interleave (element j of minibatch i = flat[j*M+i])
        # already spreads time/env structure evenly, so no shuffle is
        # needed — the round-3 random roll materialized an extra copy of
        # the full pixel buffer and cost 9 ms of the 45 ms update phase
        # (measured on v5e).  Multi-epoch training (the real trainers)
        # keeps the roll to re-partition between epochs.
        # Minibatches are python-unrolled, not lax.scan: identical runtime
        # (measured) and XLA's cost model counts a scan body only ONCE, so
        # unrolling keeps the MFU accounting exact.
        flat = batch.apply(lambda x: x.reshape((-1,) + x.shape[2:]))
        n = flat["advantage"].shape[0]
        flat = flat.apply(lambda x: x.reshape((n // M, M) + x.shape[1:]))
        for i in range(M):
            mbt = flat.apply(lambda x: x[:, i])
            params, opt_state = mb_step(params, opt_state, mbt)
        return params, opt_state

    def train_step(params, opt_state, cstate, k):
        cstate, batch = collector._collect(params, cstate)
        batch = gae(params["critic"], batch)
        params, opt_state = update_phase(params, opt_state, batch, k)
        return params, opt_state, cstate, batch["next", "reward"].mean()

    return dict(collector=collector, params=params, opt_state=opt_state,
                train_step=train_step, gae=gae, update_phase=update_phase,
                loss_mod=loss_mod, tx=tx)


def bench_fused(built, *, num_envs, steps, iters=20, windows=3):
    collector = built["collector"]
    # donation invalidates the input buffers — work on copies so built's
    # params stay usable for bench_phases
    params = jax.tree.map(jnp.copy, built["params"])
    opt_state = jax.tree.map(jnp.copy, built["opt_state"])
    key = jax.random.PRNGKey(0)
    # copy: collector.init may alias leaves (e.g. shared zero buffers) and
    # donation rejects the same buffer appearing twice
    cstate = jax.tree.map(jnp.copy, collector.init(key))
    # donate the loop state: an undonated jit boundary copies every
    # pass-through buffer (22 ms/call measured on a 1M-slot storage)
    step = jax.jit(built["train_step"], donate_argnums=(0, 1, 2))
    params, opt_state, cstate, r = step(params, opt_state, cstate, key)
    _sync(r)
    best_dt = float("inf")
    for _ in range(windows):  # best-of-N: robust to host contention
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, cstate, r = step(params, opt_state, cstate, k)
        _sync(r)
        best_dt = min(best_dt, time.perf_counter() - t0)
    steps_per_s = iters * num_envs * steps / best_dt
    flops = pipeline_flops(built, num_envs=num_envs, steps=steps)
    flops_per_s = (flops * iters / best_dt) if flops else None
    return steps_per_s, flops_per_s


def pipeline_flops(built, *, num_envs, steps):
    """Per-train-iteration FLOPs with loop bodies counted at their TRUE
    trip counts.  XLA's cost model counts a scan/while body ONCE (verified:
    an unrolled 4-minibatch update reports 4x the scanned one), so the
    collect scan is probed at T=1 and multiplied by ``steps``, GAE is
    counted directly, and the update phase is python-unrolled so the count
    is already exact."""
    from rl_tpu.collectors import Collector

    try:
        key = jax.random.PRNGKey(0)
        coll = built["collector"]
        coll1 = Collector(coll.env, coll.policy, frames_per_batch=num_envs)
        f_step = _xla_flops(jax.jit(coll1._collect), built["params"],
                            coll1.init(key))
        collect_j = jax.jit(coll._collect)
        cstate = coll.init(key)
        _, batch = collect_j(built["params"], cstate)
        gae_j = jax.jit(lambda p, b: built["gae"](p["critic"], b))
        f_gae = _xla_flops(gae_j, built["params"], batch)
        gb = gae_j(built["params"], batch)
        f_upd = _xla_flops(jax.jit(built["update_phase"]), built["params"],
                           built["opt_state"], gb, key)
        if None in (f_step, f_gae, f_upd):
            return None
        return steps * f_step + f_gae + f_upd
    except Exception as e:
        print(f"[bench] WARN flop probe failed: {e!r}", file=sys.stderr)
        return None


def bench_phases(built, *, iters=10):
    """collect / GAE / update wall-ms per iteration, measured separately."""
    collector = built["collector"]
    params, opt_state = built["params"], built["opt_state"]
    key = jax.random.PRNGKey(0)
    cstate = collector.init(key)

    collect_j = jax.jit(collector._collect)
    gae_j = jax.jit(lambda p, b: built["gae"](p["critic"], b))
    upd_j = jax.jit(built["update_phase"])

    cstate, batch = collect_j(params, cstate)
    _sync(batch["next", "reward"].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        cstate, batch = collect_j(params, cstate)
    _sync(batch["next", "reward"].mean())
    t_collect = (time.perf_counter() - t0) / iters

    gbatch = gae_j(params, batch)
    _sync(gbatch["advantage"].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        gbatch = gae_j(params, batch)
    _sync(gbatch["advantage"].mean())
    t_gae = (time.perf_counter() - t0) / iters

    p, o = upd_j(params, opt_state, gbatch, key)
    _sync(jax.tree.leaves(p)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o = upd_j(params, opt_state, gbatch, key)
    _sync(jax.tree.leaves(p)[0].reshape(-1)[0])
    t_update = (time.perf_counter() - t0) / iters
    return {"collect_ms": round(t_collect * 1e3, 2),
            "gae_ms": round(t_gae * 1e3, 2),
            "update_ms": round(t_update * 1e3, 2)}


def build_ppo_shared(env, obs_shape, *, num_envs, steps, n_actions,
                     dtype=jnp.bfloat16, obs_cast=None):
    """Shared-trunk PPO (reference Atari architecture: one CNN feeds both
    heads, modules.ConvActorCritic).  Same objective as build_ppo — clipped
    surrogate + value loss + entropy — with half the conv FLOPs in the
    update."""
    from rl_tpu.modules import ConvActorCritic
    from rl_tpu.objectives.value.functional import (
        generalized_advantage_estimate)

    net = ConvActorCritic(n_actions=n_actions, dtype=dtype)
    if obs_cast is None:
        obs_cast = lambda px: px  # noqa: E731
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1,) + obs_shape, dtype))["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    M = 4

    def policy_step(params, td, k):
        logits, value = net.apply({"params": params}, obs_cast(td["pixels"]))
        a = jax.random.categorical(k, logits, -1)
        lp = jax.nn.log_softmax(logits, -1)
        lp_a = jnp.take_along_axis(lp, a[:, None], 1)[:, 0]
        return (td.set("action", a).set("sample_log_prob", lp_a)
                .set("state_value", value))

    def one_collect_step(params, env_state, td, k):
        k1, k2 = jax.random.split(k)
        td = policy_step(params, td, k1)
        env_state, full, nxt = env.step_and_maybe_reset(env_state, td, k2)
        return env_state, nxt, full

    def mb_update(params, opt_state, mb):
        def loss_fn(p):
            logits, value = net.apply({"params": p}, obs_cast(mb["px"]))
            lp = jax.nn.log_softmax(logits, -1)
            lpa = jnp.take_along_axis(lp, mb["a"][:, None], 1)[:, 0]
            ratio = jnp.exp(lpa - mb["oldlp"])
            l_pi = -jnp.minimum(ratio * mb["adv"],
                                jnp.clip(ratio, 0.8, 1.2) * mb["adv"]).mean()
            l_v = ((value[:, 0] - mb["vt"]) ** 2).mean()
            ent = -(jnp.exp(lp) * lp).sum(-1).mean()
            return l_pi + 0.5 * l_v - 0.01 * ent

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def value_tail(params, next_px_flat):
        _, next_v = net.apply({"params": params}, obs_cast(next_px_flat))
        return next_v

    def train_step(params, opt_state, env_state, root, k):
        def body(carry, kk):
            env_state, td = carry
            env_state, nxt, full = one_collect_step(params, env_state, td, kk)
            return (env_state, nxt), full

        ks = jax.random.split(k, steps + 2)
        (env_state, root), batch = jax.lax.scan(
            body, (env_state, root), ks[:steps])
        # shifted next-values: the collect scan already wrote V(s_t);
        # only the FINAL next frame needs a fresh forward (same trick as
        # GAE(shifted=True); terminated gates the boundary rows)
        v_last = value_tail(params, batch["next", "pixels"][-1])
        next_v = jnp.concatenate(
            [batch["state_value"][1:], v_last[None]], axis=0)
        adv, vt = generalized_advantage_estimate(
            0.99, 0.95, batch["state_value"], next_v,
            batch["next", "reward"], batch["next", "done"],
            batch["next", "terminated"])
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        flat = dict(px=batch["pixels"].reshape((-1,) + obs_shape),
                    a=batch["action"].reshape(-1),
                    oldlp=batch["sample_log_prob"].reshape(-1),
                    adv=adv.reshape(-1), vt=vt.reshape(-1))
        n = flat["adv"].shape[0]
        # fixed strided interleave, python-unrolled minibatches — same
        # rationale as build_ppo.update_phase (no shuffle needed for one
        # epoch over fresh data; unrolling keeps FLOP counting exact)
        flat = {kk: v.reshape((n // M, M) + v.shape[1:])
                for kk, v in flat.items()}
        for i in range(M):
            params, opt_state = mb_update(
                params, opt_state, {kk: v[:, i] for kk, v in flat.items()})
        return params, opt_state, env_state, root, batch["next", "reward"].mean()

    return dict(env=env, params=params, opt_state=opt_state,
                train_step=train_step, one_collect_step=one_collect_step,
                mb_update=mb_update, value_tail=value_tail)


def bench_fused_shared(built, env, *, num_envs, steps, iters=10, windows=2):
    key = jax.random.PRNGKey(0)
    # copy: reset/init trees can alias leaves, which donation rejects
    env_state, root = jax.tree.map(jnp.copy, env.reset(key))
    params = jax.tree.map(jnp.copy, built["params"])
    opt_state = jax.tree.map(jnp.copy, built["opt_state"])
    step = jax.jit(built["train_step"], donate_argnums=(0, 1, 2, 3))
    flops, byts = pipeline_flops_shared(built, env, num_envs=num_envs,
                                        steps=steps)
    params, opt_state, env_state, root, r = step(params, opt_state,
                                                 env_state, root, key)
    _sync(r)
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, env_state, root, r = step(
                params, opt_state, env_state, root, k)
        _sync(r)
        best_dt = min(best_dt, time.perf_counter() - t0)
    steps_per_s = iters * num_envs * steps / best_dt
    flops_per_s = (flops * iters / best_dt) if flops else None
    # bandwidth-roofline MFU ceiling of THIS program: its arithmetic
    # intensity (flops/bytes, both from XLA's cost model) times HBM
    # bandwidth, as a fraction of bf16 peak.  AI here sits far below the
    # ~240 FLOP/byte crossover, so this ceiling — not the 0.708 matmul
    # calibration — is the honest MFU bar (probe:
    # benchmarks/pixel84_update_probe.py; candidates tried and rejected
    # on-chip: scan-fused minibatches, f32 head, uint8 pixels, remat)
    ceiling = (round(flops / byts * V5E_HBM_BW / V5E_PEAK_BF16, 4)
               if flops and byts else None)
    return steps_per_s, flops_per_s, ceiling


def pipeline_flops_shared(built, env, *, num_envs, steps, M=4):
    """Shared-trunk analogue of :func:`pipeline_flops` — probe pieces are
    lowered on ShapeDtypeStructs so no giant buffer is materialized."""
    try:
        key = jax.random.PRNGKey(0)
        env_state, root = env.reset(key)
        step1 = jax.jit(built["one_collect_step"])
        f_step, b_step = _xla_cost(step1, built["params"], env_state, root,
                                   key)
        _, _, full = step1(built["params"], env_state, root, key)
        px = full["next", "pixels"]
        n = steps * num_envs
        # shifted next-values: the tail forward runs on the FINAL frame only
        px_spec = jax.ShapeDtypeStruct(px.shape, px.dtype)
        f_tail, b_tail = _xla_cost(jax.jit(built["value_tail"]),
                                   built["params"], px_spec)
        f32 = jnp.float32
        mb_spec = dict(
            px=jax.ShapeDtypeStruct((n // M,) + px.shape[1:], px.dtype),
            a=jax.ShapeDtypeStruct((n // M,), jnp.int32),
            oldlp=jax.ShapeDtypeStruct((n // M,), f32),
            adv=jax.ShapeDtypeStruct((n // M,), f32),
            vt=jax.ShapeDtypeStruct((n // M,), f32),
        )
        f_mb, b_mb = _xla_cost(jax.jit(built["mb_update"]), built["params"],
                               built["opt_state"], mb_spec)
        if None in (f_step, f_tail, f_mb):
            return None, None
        flops = steps * f_step + f_tail + M * f_mb
        byts = (None if None in (b_step, b_tail, b_mb)
                else steps * b_step + b_tail + M * b_mb)
        return flops, byts
    except Exception as e:
        print(f"[bench] WARN shared flop probe failed: {e!r}",
              file=sys.stderr)
        return None, None


def bench_llm_engine(B=256, P=12, R=12, n_layers=8, d_model=320, iters=10,
                     cached=False):
    """Generated tokens/s of the native 10M-param LLM engine (the
    vLLM-engine role: batched autoregressive decode, bf16, one chip).
    ``cached=False`` mirrors sota/grpo_10m.py's full-forward sampler;
    ``cached=True`` runs the KV-cached decode path (lm_generate_cached —
    the serving configuration).  Raw device rate with value-sync (the
    conversation stack on THIS container is tunnel-RTT-bound — see
    STATUS.md)."""
    from rl_tpu.modules.transformer import TransformerLM, lm_generate_cached

    lm = TransformerLM(vocab_size=32, n_layers=n_layers, d_model=d_model,
                       n_heads=8, max_len=P + R, dtype=jnp.bfloat16)
    params = lm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, P + R), jnp.int32))["params"]

    if cached:
        lm_dec = lm.copy(decode=True)
        generate = jax.jit(lambda p, prompts, k: lm_generate_cached(
            lm_dec, p, prompts, R, k)[0])
    else:
        @jax.jit
        def generate(p, prompts, k):
            n = prompts.shape[0]
            tokens = jnp.concatenate(
                [prompts, jnp.full((n, R), 0, jnp.int32)], 1)
            for t in range(R):
                logits = lm.apply({"params": p}, tokens)[:, P + t - 1]
                k, kk = jax.random.split(k)
                nxt = jax.random.categorical(
                    kk, jnp.asarray(logits, jnp.float32), -1)
                tokens = tokens.at[:, P + t].set(nxt)
            return tokens[:, P:]

    prompts = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0, 32)
    key = jax.random.PRNGKey(2)
    _sync(jnp.sum(generate(params, prompts, key)))  # compile + fence
    t0 = time.perf_counter()
    for i in range(iters):
        out = generate(params, prompts, jax.random.fold_in(key, i))
    _sync(jnp.sum(out))  # scalar value read fences the chain
    dt = time.perf_counter() - t0
    return B * R * iters / dt


def bench_serving(n_requests=512, n_slots=256, R=48, n_layers=8,
                  d_model=320, seed=0, speculative=False):
    """Continuous-batching serving throughput (rl_tpu.serve) on a
    mixed-length workload: prompts 4-12 tokens, max_new 4-R uniform.

    Reports USEFUL tokens/s (requested tokens only).  The static-lockstep
    comparison point runs the same workload through lm_generate_cached in
    fixed [batch, R] sweeps — every sequence pays the longest request's
    decode.  ``speculative=True`` adds a 2L/d128 draft (greedy), reporting
    the acceptance rate.  NOTE: each scheduler iteration costs host
    round-trips; on this container's tunneled backend (~60 ms RTT) the
    continuous number is RTT-bound, not chip-bound — the static engine
    runs its whole generation in one dispatch (context:
    host_bridge.device_roundtrip_ms).
    """
    from rl_tpu.modules.transformer import TransformerLM
    from rl_tpu.serve import ServingEngine

    V = 32
    lm = TransformerLM(vocab_size=V, n_layers=n_layers, d_model=d_model,
                       n_heads=8, max_len=16 + R + 8, dtype=jnp.bfloat16)
    params = lm.init(jax.random.PRNGKey(seed),
                     jnp.zeros((1, 8), jnp.int32))["params"]
    draft = None
    if speculative == "ngram":
        draft = "ngram"
    elif speculative:
        dlm = TransformerLM(vocab_size=V, n_layers=2, d_model=128,
                            n_heads=8, max_len=16 + R + 8,
                            dtype=jnp.bfloat16)
        dparams = dlm.init(jax.random.PRNGKey(seed + 1),
                           jnp.zeros((1, 8), jnp.int32))["params"]
        draft = (dlm, dparams)

    rng = np.random.RandomState(seed)
    prompts = [list(rng.randint(1, V, rng.randint(4, 13)))
               for _ in range(n_requests)]
    max_news = rng.randint(4, R + 1, n_requests)

    eng = ServingEngine(lm, params, n_slots=n_slots, max_new_cap=R,
                        prefill_width=min(64, n_slots),
                        decode_chunk_len=16, prompt_buckets=(16,),
                        draft=draft, gamma=4, seed=seed)
    # warm the jit caches (prefill bucket + decode chunk) off the clock
    eng.generate([prompts[0]], max_new_tokens=4,
                 temperature=0.0 if speculative else 1.0)
    t0 = time.perf_counter()
    for p, mn in zip(prompts, max_news):
        eng.submit(p, max_new_tokens=int(mn),
                   temperature=0.0 if speculative else 1.0)
    eng.run_until_complete()
    dt = time.perf_counter() - t0
    useful = int(max_news.sum())
    out = {"continuous_tokens_per_s": round(useful / dt, 1),
           "useful_tokens": useful, "wall_s": round(dt, 2),
           "decode_calls": eng.decode_steps}
    if speculative:
        out["spec_acceptance"] = round(eng.spec_acceptance, 3)
        return out

    # static-lockstep comparison: same workload, fixed [n_slots, R] sweeps
    # through the KV-cached sampler — every sequence decodes the full R
    from rl_tpu.modules.transformer import lm_generate_cached

    lm_dec = lm.copy(decode=True)
    gen = jax.jit(lambda p, pr, k: lm_generate_cached(lm_dec, p, pr, R, k)[0])
    padded = np.stack([[1] * (12 - len(p)) + p for p in prompts])
    key = jax.random.PRNGKey(seed)
    _sync(jnp.sum(gen(params, padded[:n_slots], key)))   # compile
    t0 = time.perf_counter()
    o = None
    for i in range(0, n_requests, n_slots):
        batch = padded[i: i + n_slots]
        if len(batch) < n_slots:
            batch = np.concatenate(
                [batch, np.ones((n_slots - len(batch), 12), np.int64)])
        o = gen(params, batch, jax.random.fold_in(key, i))
    _sync(jnp.sum(o))
    out["static_lockstep_tokens_per_s"] = round(
        useful / (time.perf_counter() - t0), 1)
    return out


def bench_dreamer_optim(B=16, T=64, obs_dim=64, act_dim=6, iters=20):
    """Dreamer world-model+actor+value optimizer throughput.

    The only absolute perf numbers the reference commits are Dreamer ones
    (sota-implementations/dreamer/README.md:163: ~7.0 optim steps/s FP32
    on one H200, and 2.9–3.5 steps/s at 50k batch async).  This measures
    the rl_tpu Dreamer-v1 fused update (model reco/reward/KL + imagination
    actor + value, one jit) at a comparable scale: RSSM deter 512 /
    stoch 32 / hidden 512, batch 16x64 VECTOR observations (the reference
    trains on IsaacLab states+depth; config delta noted in the JSON).
    """
    import optax as _optax

    from rl_tpu.data import TDict
    from rl_tpu.modules.world_model import ObsDecoder, ObsEncoder, RSSM
    from rl_tpu.objectives.dreamer import (DreamerActorLoss,
                                           DreamerModelLoss,
                                           DreamerValueLoss)
    import flax.linen as nn

    rssm = RSSM(action_dim=act_dim, stoch_dim=32, deter_dim=512, hidden=512)
    encoder = ObsEncoder(embed_dim=512, hidden=512)
    decoder = ObsDecoder(obs_dim=obs_dim, hidden=512)
    model_loss = DreamerModelLoss(encoder, decoder, rssm)
    actor_net = nn.Sequential([nn.Dense(512), nn.elu, nn.Dense(act_dim),
                               jnp.tanh])
    value_net = nn.Sequential([nn.Dense(512), nn.elu, nn.Dense(1)])

    def actor_fn(p, h, z, k):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        return actor_net.apply({"params": p}, jnp.concatenate([h, z], -1))

    def value_fn(p, h, z):
        p = p.to_dict() if hasattr(p, "to_dict") else p
        return value_net.apply({"params": p}, jnp.concatenate([h, z], -1))

    actor_loss = DreamerActorLoss(rssm, actor_fn, value_fn,
                                  imagination_horizon=15)
    value_loss = DreamerValueLoss(value_fn)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    is_init = jnp.zeros((T, B, 1), bool).at[0].set(True)
    batch = TDict(
        observation=jax.random.normal(ks[0], (T, B, obs_dim)),
        action=jax.random.uniform(ks[1], (T, B, act_dim), minval=-1,
                                  maxval=1),
        is_init=is_init,
        next=TDict(
            observation=jax.random.normal(ks[2], (T, B, obs_dim)),
            reward=jax.random.normal(ks[3], (T, B, 1)),
            done=jnp.zeros((T, B, 1), bool),
            terminated=jnp.zeros((T, B, 1), bool),
        ),
    )
    params = model_loss.init(key, batch)
    hz = jnp.concatenate([jnp.zeros((1, rssm.deter_dim)),
                          jnp.zeros((1, rssm.stoch_dim))], -1)
    all_params = TDict(
        encoder=params["encoder"], decoder=params["decoder"],
        rssm=params["rssm"],
        actor=actor_net.init(key, hz)["params"],
        value=value_net.init(key, hz)["params"],
    )
    tx = _optax.adam(3e-4)
    opt_state = tx.init(all_params)

    def optim_step(p, opt_state, key):
        k_m, k_a, k_v = jax.random.split(key, 3)

        def total(p):
            m = model_loss.loss(p, batch, k_m)
            post = model_loss.observe(
                jax.tree_util.tree_map(jax.lax.stop_gradient, p), batch, k_m)
            start = TDict(h=post["h"], z=post["z"])
            a = actor_loss.loss(p, start, k_a)
            sg = jax.lax.stop_gradient
            returns, imag, _ = actor_loss.imagined_lambda_returns(
                jax.tree_util.tree_map(sg, p),
                sg(post["h"]).reshape(-1, rssm.deter_dim),
                sg(post["z"]).reshape(-1, rssm.stoch_dim), k_v)
            v = value_loss.loss(p, TDict(h=sg(imag["h"]), z=sg(imag["z"]),
                                         lambda_target=sg(returns)))
            return (m["loss_model_reco"] + m["loss_model_reward"]
                    + m["loss_model_kl"] + a["loss_actor"] + v["loss_value"])

        loss, grads = jax.value_and_grad(total)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return _optax.apply_updates(p, updates), opt_state, loss

    step = jax.jit(optim_step, donate_argnums=(0, 1))
    all_params, opt_state, loss = step(all_params, opt_state, key)
    _sync(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        all_params, opt_state, loss = step(all_params, opt_state,
                                           jax.random.fold_in(key, i))
    _sync(loss)
    return iters / (time.perf_counter() - t0)


def make_pixel84_env(num_envs, dtype=jnp.bfloat16):
    """Breakout upscaled to 84x84x4 — the Atari-class pixel shape (the
    BASELINE Pong config; ALE itself is not in this image).

    ``dtype=jnp.uint8`` stores frames as bytes (exact for the 0/1 MinAtar
    channels; the standard Atari frame-buffer practice) — halves the byte
    volume of every [T,B,84,84,4] batch the HBM-bound collect scan stacks
    and the update re-reads; consumers cast at the net input."""
    from rl_tpu.envs import BatchedEnv
    from rl_tpu.envs.minatar import BreakoutEnv

    class Breakout84(BreakoutEnv):
        @property
        def observation_spec(self):
            from rl_tpu.data import Composite, Unbounded

            return Composite(pixels=Unbounded((84, 84, 4), dtype))

        def _upscale(self, px):
            big = jnp.repeat(jnp.repeat(px, 8, axis=0), 8, axis=1)  # 80x80
            out = jnp.pad(big, ((2, 2), (2, 2), (0, 0)))
            return out.astype(dtype)

        def _reset(self, key):
            state, td = super()._reset(key)
            return state, td.set("pixels", self._upscale(td["pixels"]))

        def _step(self, state, td, key):
            state, out = super()._step(state, td, key)
            return state, out.set("pixels", self._upscale(out["pixels"]))

    return BatchedEnv(Breakout84(), num_envs)


def bench_host_bridge(steps=300, num_envs=8, budget_s=240.0):
    """HalfCheetah host↔device bridge — the SAC/PPO MuJoCo data path.

    Three measurements (reference harness shape:
    benchmarks/ecosystem/gym_env_throughput.py):

    * ``raw_pool``:  HostEnvPool stepped host-side only (no device) — the
      MuJoCo ceiling on this host;
    * ``serial``:    io_callback rollout — [host step] → [device policy]
      strictly alternating;
    * ``pipelined``: PipelinedHostCollector — device compute of one env
      group overlaps host stepping of the other.

    Runs under a watchdog per phase: on the tunneled TPU backend an
    io_callback chain can wedge for minutes; the bench must never lose the
    other results to one stuck phase.  Missing fields are reported null
    WITH a warning on stderr (VERDICT r3 weak #3 — no silent nulls).
    """
    import threading

    import numpy as np

    out: dict = {"raw_pool": None, "serial": None, "pipelined": None}

    def guard(name, fn, timeout):
        th = threading.Thread(target=fn, daemon=True)
        th.start()
        th.join(timeout=timeout)
        if out[name] is None:
            print(f"[bench] WARN host_bridge.{name} unavailable "
                  f"(timeout {timeout}s or import failure) — reported null",
                  file=sys.stderr, flush=True)

    def raw_pool():
        try:
            import gymnasium

            from rl_tpu.envs.libs.gym import HostEnvPool

            pool = HostEnvPool([lambda: gymnasium.make("HalfCheetah-v4")
                                for _ in range(num_envs)])
            pool.reset(np.arange(num_envs))
            act = np.zeros((num_envs, 6), np.float32)
            seeds = np.arange(num_envs)
            for _ in range(5):
                pool.step_and_reset(act, seeds)
            t0 = time.perf_counter()
            for _ in range(steps):
                pool.step_and_reset(act, seeds)
            out["raw_pool"] = round(num_envs * steps /
                                    (time.perf_counter() - t0), 1)
            pool.close()
        except Exception as e:
            print(f"[bench] WARN raw_pool failed: {e!r}", file=sys.stderr)

    def pipelined():
        try:
            import gymnasium

            from rl_tpu.collectors.pipelined import PipelinedHostCollector
            from rl_tpu.data import TDict

            def policy(p, td, k):
                h = jnp.tanh(td["observation"] @ p["w1"])
                return td.set("action", jnp.tanh(h @ p["w2"]))

            key = jax.random.PRNGKey(0)
            params = TDict(
                w1=jax.random.normal(key, (17, 256), jnp.float32) * 0.05,
                w2=jax.random.normal(key, (256, 6), jnp.float32) * 0.05,
            )
            coll = PipelinedHostCollector(
                lambda: gymnasium.make("HalfCheetah-v4"), num_envs, policy,
                frames_per_batch=num_envs * 32)
            coll.collect(params, key)  # warmup (compiles both group jits)
            n_batches = max(steps // 32, 1)
            t0 = time.perf_counter()
            for i in range(n_batches):
                coll.collect(params, jax.random.PRNGKey(i + 1))
            out["pipelined"] = round(n_batches * num_envs * 32 /
                                     (time.perf_counter() - t0), 1)
            coll.close()
        except Exception as e:
            print(f"[bench] WARN pipelined bridge failed: {e!r}",
                  file=sys.stderr)

    # RTT first (a wedged bridge phase poisons later device ops in this
    # process): on this container the TPU is behind a TCP tunnel with
    # ~60 ms RTT, so ANY per-step bridge caps at ~num_envs/RTT regardless
    # of design — co-located hardware has microsecond dispatch
    try:
        f = jax.jit(lambda x: x + 1.0)
        _sync(f(jnp.zeros(())))
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(f(jnp.zeros(())))
        out["device_roundtrip_ms"] = round(
            (time.perf_counter() - t0) / 5 * 1e3, 1)
    except Exception:
        pass
    guard("raw_pool", raw_pool, budget_s / 3)
    # host-pool throughput swung 12.3k -> 10.1k -> 3.8k steps/s across
    # rounds purely with container CPU load (2 CPUs shared with training
    # jobs) — contextualize instead of letting the swing look like a
    # regression (VERDICT r4 weak #4)
    out["raw_pool_note"] = ("2-CPU host shared with concurrent jobs; "
                            "rate varies up to ~3x with load")
    guard("pipelined", pipelined, budget_s / 3)
    if out["pipelined"] and out["serial"]:
        out["pipelined_over_serial"] = round(out["pipelined"] / out["serial"], 2)
    return out


def bench_serial_bridge_subprocess(steps=300, num_envs=8, timeout_s=180.0):
    """The SERIAL io_callback bridge ([host env step] → [device policy],
    strictly alternating) measured in a CHILD process with a hard kill.

    On this container's tunneled TPU backend the serial chain is the known
    wedge mode (three rounds of bare nulls — VERDICT r4 missing #4): run
    in-process it leaves a watchdog thread holding the backend and aborts
    whatever device work comes next.  A child process owns its own TPU
    session, so a wedge dies WITH the child and the parent reports a
    structured ``{{serial: null, serial_wedged: true}}`` instead.

    MUST run before the parent claims the TPU grant (single-session
    tunnel): call this at the very top of main(), before any device op.
    """
    import json as _json
    import subprocess
    import textwrap

    code = textwrap.dedent(f"""
        import json, sys, time
        import jax
        from rl_tpu.envs.libs import GymEnv
        env = GymEnv("HalfCheetah-v4", num_envs={num_envs})
        @jax.jit
        def roll(key):
            _, ys, _ = env.rollout({steps}, key=key)
            return ys["next", "reward"].sum()
        float(roll(jax.random.PRNGKey(0)))   # value-read sync (CLAUDE.md)
        t0 = time.perf_counter()
        float(roll(jax.random.PRNGKey(1)))
        rate = round({num_envs} * {steps} / (time.perf_counter() - t0), 1)
        print("BRIDGE_RESULT " + json.dumps({{"serial": rate}}), flush=True)
        env.close()
    """)
    env_vars = dict(os.environ)
    env_vars["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                              + os.pathsep + env_vars.get("PYTHONPATH", ""))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env=env_vars)
        for line in proc.stdout.splitlines():
            if line.startswith("BRIDGE_RESULT "):
                return _json.loads(line[len("BRIDGE_RESULT "):])
        print(f"[bench] WARN serial bridge child exited rc={proc.returncode}"
              f" without a result: {proc.stderr[-300:]!r}", file=sys.stderr,
              flush=True)
        return {"serial": None, "serial_error": f"rc={proc.returncode}"}
    except subprocess.TimeoutExpired:
        print(f"[bench] WARN serial bridge WEDGED (killed child after "
              f"{timeout_s}s; known tunneled-backend io_callback failure "
              "mode) — letting the tunnel settle before the parent claims "
              "the grant", file=sys.stderr, flush=True)
        time.sleep(20.0)  # a killed TPU process can wedge the grant briefly
        return {"serial": None, "serial_wedged": True,
                "serial_timeout_s": timeout_s}


def main() -> None:
    smoke = "smoke" in sys.argv[1:]

    def note(msg):  # progress to stderr; stdout carries ONLY the JSON line
        print(msg, file=sys.stderr, flush=True)

    from rl_tpu.envs import BatchedEnv
    from rl_tpu.envs.minatar import BreakoutEnv

    def mfu(flops_per_s):
        return (round(flops_per_s / V5E_PEAK_BF16, 4)
                if flops_per_s else None)

    # serial host bridge FIRST, in a child process: it must run before this
    # process claims the single-session TPU grant, and a wedge (the known
    # tunneled io_callback failure mode) must die with the child instead of
    # poisoning everything below (VERDICT r4 missing #4 / next #6)
    note("[bench] serial host bridge (child process)…")
    bridge_serial = bench_serial_bridge_subprocess(
        steps=20 if smoke else 300, timeout_s=60.0 if smoke else 180.0)
    note(f"[bench] serial bridge: {bridge_serial}")

    # -- MXU calibration: what a bare bf16 matmul reaches on THIS chip
    cal_n = 1024 if smoke else 8192
    cal = bench_matmul_calibration(n=cal_n, iters=5 if smoke else 30)
    note(f"[bench] matmul calibration: {cal/1e12:.1f} TFLOP/s "
         f"({cal/V5E_PEAK_BF16:.0%} of v5e bf16 peak)")

    # -- headline: MinAtar pixels, fp32 (continuity with r01/r02 numbers)
    num_envs, steps = (64, 8) if smoke else (4096, 32)
    env = BatchedEnv(BreakoutEnv(), num_envs)
    built = build_ppo(env, (10, 10, 4), num_envs=num_envs, steps=steps,
                      channels=(16, 32), kernels=(3, 3), strides=(1, 1),
                      n_actions=3)
    headline, headline_fps = bench_fused(built, num_envs=num_envs,
                                         steps=steps,
                                         iters=3 if smoke else 20)
    note(f"[bench] headline MinAtar: {headline:,.0f} env-steps/s "
         f"(MFU {mfu(headline_fps)})")

    # -- representative: 84x84x4, Nature-DQN conv, bf16 compute
    n84, s84 = (16, 4) if smoke else (1024, 16)
    env84 = make_pixel84_env(n84)
    built84 = build_ppo(env84, (84, 84, 4), num_envs=n84, steps=s84,
                        channels=(32, 64, 64), kernels=(8, 4, 3),
                        strides=(4, 2, 1), n_actions=3,
                        dtype=jnp.bfloat16)
    pixel84, pixel84_fps = bench_fused(built84, num_envs=n84, steps=s84,
                                       iters=2 if smoke else 10, windows=2)
    note(f"[bench] pixel84: {pixel84:,.0f} env-steps/s "
         f"(MFU {mfu(pixel84_fps)})")
    phases84 = bench_phases(built84, iters=2 if smoke else 10)
    note(f"[bench] pixel84 phases: {phases84}")

    # shared conv trunk (the reference Atari architecture) — half the conv
    # FLOPs in the update phase.  Frames stored uint8 (exact for the 0/1
    # MinAtar channels; the standard Atari frame-buffer practice): the
    # HBM-bound pipeline moves 56.9 vs 87.8 GB/iter and runs +19% faster
    # than bf16 frames (measured A/B: benchmarks/pixel84_uint8_ab.py)
    env84s = make_pixel84_env(n84, dtype=jnp.uint8)
    built84s = build_ppo_shared(env84s, (84, 84, 4), num_envs=n84,
                                steps=s84, n_actions=3,
                                obs_cast=lambda px: px.astype(jnp.bfloat16))
    pixel84_shared, shared_fps, shared_ceiling = bench_fused_shared(
        built84s, env84s, num_envs=n84, steps=s84,
        iters=2 if smoke else 10, windows=2)
    note(f"[bench] pixel84 shared-trunk: {pixel84_shared:,.0f} env-steps/s "
         f"(MFU {mfu(shared_fps)} of a bandwidth-roofline ceiling "
         f"{shared_ceiling})")

    dreamer_ops = bench_dreamer_optim(
        B=4, T=8, iters=3) if smoke else bench_dreamer_optim()
    note(f"[bench] dreamer optim: {dreamer_ops:.1f} steps/s "
         f"(reference H200: ~7.0, dreamer/README.md:163)")

    llm_tps = (bench_llm_engine(B=16, R=4, n_layers=2, d_model=64, iters=3)
               if smoke else bench_llm_engine())
    llm_tps_cached = (bench_llm_engine(B=16, R=4, n_layers=2, d_model=64,
                                       iters=3, cached=True)
                      if smoke else bench_llm_engine(cached=True))
    note(f"[bench] llm engine: {llm_tps:,.0f} tokens/s full-forward, "
         f"{llm_tps_cached:,.0f} tokens/s KV-cached "
         f"(10M-param bf16 TransformerLM, batch 256)")

    serving = (bench_serving(n_requests=12, n_slots=4, R=8, n_layers=2,
                             d_model=64)
               if smoke else bench_serving())
    serving_spec = (bench_serving(n_requests=12, n_slots=4, R=8, n_layers=2,
                                  d_model=64, speculative=True)
                    if smoke else bench_serving(speculative=True))
    serving_ngram = (bench_serving(n_requests=12, n_slots=4, R=8, n_layers=2,
                                   d_model=64, speculative="ngram")
                     if smoke else bench_serving(speculative="ngram"))
    note(f"[bench] serving (continuous batching): {serving}; "
         f"speculative: {serving_spec}; ngram: {serving_ngram}")

    bridge = bench_host_bridge(steps=20 if smoke else 300,
                               budget_s=90.0 if smoke else 360.0)
    bridge.update(bridge_serial)
    if bridge.get("pipelined") and bridge.get("serial"):
        bridge["pipelined_over_serial"] = round(
            bridge["pipelined"] / bridge["serial"], 2)
    note(f"[bench] host bridge: {bridge}")

    print(json.dumps({
        "metric": "pixel_ppo_env_steps_per_s",
        "value": round(headline, 1),
        "unit": "env-steps/s (Breakout pixels: collect+GAE+4 PPO updates, 1 chip)",
        "vs_baseline": round(headline / PER_CHIP_TARGET, 3),
        "headline_mfu": mfu(headline_fps),
        "pixel84_env_steps_per_s": round(pixel84, 1),
        "pixel84_mfu": mfu(pixel84_fps),
        "pixel84_shared_trunk_env_steps_per_s": round(pixel84_shared, 1),
        "pixel84_shared_trunk_mfu": mfu(shared_fps),
        "pixel84_shared_trunk_frames": (
            "uint8 storage, cast-at-net-input (A/B vs bf16 frames: +19%, "
            "benchmarks/pixel84_uint8_ab.py)"),
        "pixel84_mfu_roofline_ceiling": shared_ceiling,
        "pixel84_mfu_roofline_note": (
            "this program's arithmetic intensity (XLA cost model: "
            "flops/bytes) is far below the v5e ~240 FLOP/byte crossover — "
            "it is HBM-bandwidth-bound, so its MFU ceiling is AI*BW/peak, "
            "NOT the matmul calibration; measured-vs-ceiling is the "
            "honest utilization (probe: benchmarks/pixel84_update_probe"
            ".py — scan-fusion, f32 head, uint8 px, remat all tried and "
            "rejected on-chip)"),
        "pixel84_phases": phases84,
        "pixel84_config": "84x84x4, Nature conv 32/64/64 bf16, 1024 envs",
        "dreamer_optim_steps_per_s": round(dreamer_ops, 1),
        "dreamer_optim_config": "RSSM 512d/32s, batch 16x64 vector obs, model+actor+value fused jit; reference H200 ~7.0 steps/s (dreamer/README.md:163, IsaacLab states)",
        "llm_engine_tokens_per_s": round(llm_tps, 1),
        "llm_engine_cached_tokens_per_s": round(llm_tps_cached, 1),
        "llm_engine_config": "10M-param bf16 TransformerLM (8L d320), batch 256 autoregressive decode (full-forward vs KV-cached); raw device rate (conversation stack is tunnel-RTT-bound in this container)",
        "llm_serving": {**serving,
                        "spec_acceptance": serving_spec.get("spec_acceptance"),
                        "speculative_tokens_per_s": serving_spec[
                            "continuous_tokens_per_s"],
                        "ngram_acceptance": serving_ngram.get(
                            "spec_acceptance"),
                        "ngram_tokens_per_s": serving_ngram[
                            "continuous_tokens_per_s"],
                        "trained_spec_acceptance":
                            "3.97/5.0 ceiling with SFT'd target+draft — "
                            "benchmarks/SPEC_DECODE_RESULTS.md (random-init "
                            "pairs here measure accidental agreement)"},
        "llm_serving_config": (
            "rl_tpu.serve continuous batching, 10M-param bf16 target, "
            "512 mixed-length requests (prompts 4-12, max_new 4-48), 256 "
            "slots; static-lockstep = same workload in fixed [256,48] "
            "KV-cached sweeps (generates ~1.8x the useful tokens as "
            "waste); every scheduler dispatch pays this container's "
            "tunnel RTT while the static engine is ONE dispatch, so the "
            "continuous number is RTT-bound here, not chip-bound (see "
            "host_bridge.device_roundtrip_ms; locally-attached dispatch "
            "is sub-ms)"),
        "matmul_calibration_tflops": round(cal / 1e12, 1),
        "matmul_calibration_frac_of_peak": round(cal / V5E_PEAK_BF16, 3),
        "mfu_denominator": "v5e bf16 peak 197 TFLOP/s; FLOPs from XLA cost_analysis with loop bodies counted at true trip counts (collect probed at T=1 and scaled; update unrolled)",
        "host_bridge_env_steps_per_s": bridge,
    }), flush=True)
    # a wedged bridge thread must not hang interpreter shutdown
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
