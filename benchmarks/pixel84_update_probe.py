"""Pixel84 update-phase MFU probe (VERDICT r4 next #4).

The shared-trunk 84x84 pipeline runs at MFU 0.17 vs a measured 0.708
matmul ceiling, and the update phase has been the dominant cycle cost for
two rounds (35.3 of 62.4 ms).  This probe isolates WHERE the update's
time goes and A/B-tests candidate fixes on the real chip:

* unrolled (current) vs lax.scan-fused minibatch loop with donated carry;
* bf16 vs f32 head math (log_softmax/entropy in half precision);
* XLA cost-analysis arithmetic intensity per minibatch — is the phase
  compute-bound or HBM-bound on a v5e (197 bf16 TFLOP/s, ~819 GB/s —
  roofline crossover ~240 FLOPs/byte);
* HLO op histogram of the compiled update — counts transpose/convert ops
  (the layout-induced-transpose check).

Run on the chip, serially:  python benchmarks/pixel84_update_probe.py
"""
import re
import sys
import time
from collections import Counter

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import build_ppo_shared, make_pixel84_env, _sync  # noqa: E402

V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9


def _scalar(tree):
    # value-read sync WITHOUT flattening a big tiled buffer (an eager
    # reshape(-1) of a bf16 [16k,4,84,84,4] view asks for a 124 GB layout
    # copy on v5e — observed; CLAUDE.md's float(big[0]) trap)
    return jnp.sum(jax.tree.leaves(tree)[0])


def timeit(fn, *args, iters=10, donate=None):
    j = jax.jit(fn, donate_argnums=donate or ())
    out = j(*args)
    _sync(_scalar(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = j(*args)
        _sync(_scalar(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, j


def main(num_envs=1024, steps=64, M=4):
    env = make_pixel84_env(num_envs)
    built = build_ppo_shared(env, (84, 84, 4), num_envs=num_envs,
                             steps=steps, n_actions=3)
    params, opt_state = built["params"], built["opt_state"]
    key = jax.random.PRNGKey(0)
    env_state, root = env.reset(key)

    # synthetic minibatch inputs: the update-phase timing only depends on
    # shapes/dtypes, and materializing a REAL collected batch eagerly
    # (collect scan output + flat reshape copies) exhausted the 16 GB HBM
    # alongside the probe's own buffers — the fused bench never holds both
    n = steps * num_envs

    @jax.jit
    def synth(k):
        px = jax.random.randint(k, (n // M, M, 84, 84, 4), 0, 255,
                                jnp.int32).astype(jnp.bfloat16) / 255.0
        return dict(
            px=px,
            a=jax.random.randint(k, (n // M, M), 0, 3, jnp.int32),
            oldlp=jnp.full((n // M, M), -1.1, jnp.float32),
            adv=jax.random.normal(k, (n // M, M), jnp.float32),
            vt=jnp.zeros((n // M, M), jnp.float32),
        )

    flat = synth(key)
    _sync(_scalar(flat["a"]))

    # -- A: current python-unrolled 4-minibatch update ---------------------
    def unrolled(params, opt_state, flat):
        for i in range(M):
            params, opt_state = built["mb_update"](
                params, opt_state, {k2: v[:, i] for k2, v in flat.items()})
        return params, opt_state

    t_unroll, _ = timeit(unrolled, params, opt_state, flat)
    print(f"update unrolled(M={M}): {t_unroll*1e3:.2f} ms", flush=True)

    # -- B: scan-fused minibatch loop --------------------------------------
    def scanned(params, opt_state, flat):
        def body(carry, i):
            p, o = carry
            p, o = built["mb_update"](
                p, o, {k2: jnp.take(v, i, axis=1)
                       for k2, v in flat.items()})
            return (p, o), 0.0

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), jnp.arange(M))
        return params, opt_state

    t_scan, _ = timeit(scanned, params, opt_state, flat)
    print(f"update scanned(M={M}):  {t_scan*1e3:.2f} ms", flush=True)

    # -- C: one minibatch alone (dispatch overhead estimate) ---------------
    mb0 = {k2: v[:, 0] for k2, v in flat.items()}
    t_one, jmb = timeit(built["mb_update"], params, opt_state, mb0)
    print(f"one minibatch:          {t_one*1e3:.2f} ms "
          f"(x{M} = {M*t_one*1e3:.2f})", flush=True)

    # -- roofline: flops + bytes of one minibatch --------------------------
    lowered = jax.jit(built["mb_update"]).lower(params, opt_state, mb0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    ai = flops / max(bytes_, 1)
    t_flops = flops / V5E_PEAK_BF16
    t_bytes = bytes_ / V5E_HBM_BW
    print(f"mb cost: {flops/1e9:.1f} GFLOP, {bytes_/1e9:.2f} GB, "
          f"AI={ai:.0f} FLOP/B (crossover ~240)\n"
          f"  compute floor {t_flops*1e3:.2f} ms vs HBM floor "
          f"{t_bytes*1e3:.2f} ms -> "
          f"{'COMPUTE' if t_flops > t_bytes else 'HBM'}-bound in theory; "
          f"measured {t_one*1e3:.2f} ms "
          f"= {max(t_flops, t_bytes)/t_one*100:.0f}% of its roofline",
          flush=True)

    # -- layout check: op histogram of the optimized HLO -------------------
    hlo = compiled.as_text()
    ops = Counter(re.findall(r"^\s*\S+ = \S+ (\w+)\(", hlo, re.M))
    interesting = {k2: v for k2, v in ops.most_common()
                   if k2 in ("transpose", "convert", "copy", "fusion",
                             "convolution", "dot", "custom-call",
                             "reduce", "all-reduce")}
    print(f"HLO op histogram (update mb): {interesting}", flush=True)

    # -- D: f32 head variant ----------------------------------------------
    import optax

    from rl_tpu.modules import ConvActorCritic

    net32 = ConvActorCritic(n_actions=3, dtype=jnp.bfloat16)

    def mb_update_f32head(params, opt_state, mb):
        tx = optax.adam(3e-4)

        def loss_fn(p):
            logits, value = net32.apply({"params": p}, mb["px"])
            logits = logits.astype(jnp.float32)
            value = value.astype(jnp.float32)
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

    t_f32, _ = timeit(mb_update_f32head, params, opt_state, mb0)
    print(f"one minibatch f32 head: {t_f32*1e3:.2f} ms", flush=True)

    # -- D2: uint8 pixel storage (convert-on-read) -------------------------
    # if the phase is HBM-bound, storing frames as uint8 (exact for the
    # 0/1-valued MinAtar channels) halves the pixel bytes each pass reads
    mb_u8 = dict(mb0, px=(mb0["px"] * 255).astype(jnp.uint8))

    def mb_update_u8(params, opt_state, mb):
        mb = dict(mb, px=mb["px"].astype(jnp.bfloat16) / 255.0)
        return built["mb_update"](params, opt_state, mb)

    t_u8, _ = timeit(mb_update_u8, params, opt_state, mb_u8)
    print(f"one minibatch uint8 px: {t_u8*1e3:.2f} ms", flush=True)

    # -- D3: remat'd trunk — with the phase HBM-bound (AI~115 < 240) and
    # compute floor ~half the bandwidth floor, recomputing forward
    # activations during backward can cut stored-activation traffic for
    # ~2 ms of extra (cheap) FLOPs
    def mb_update_remat(params, opt_state, mb):
        tx = optax.adam(3e-4)

        @jax.checkpoint
        def fwd(p, px):
            return net32.apply({"params": p}, px)

        def loss_fn(p):
            logits, value = fwd(p, mb["px"])
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

    t_remat, _ = timeit(mb_update_remat, params, opt_state, mb0)
    print(f"one minibatch remat:    {t_remat*1e3:.2f} ms", flush=True)
    lowered_r = jax.jit(mb_update_remat).lower(params, opt_state, mb0)
    car = lowered_r.compile().cost_analysis()
    car = car[0] if isinstance(car, list) else car
    print(f"remat cost: {car.get('flops',0)/1e9:.1f} GFLOP, "
          f"{car.get('bytes accessed',0)/1e9:.2f} GB", flush=True)

    # -- E: collect-phase single step roofline for context ------------------
    lowered_c = jax.jit(built["one_collect_step"]).lower(
        params, env_state, root, key)
    cac = lowered_c.compile().cost_analysis()
    cac = cac[0] if isinstance(cac, list) else cac
    cf, cb = cac.get("flops", 0.0), cac.get("bytes accessed", 0.0)
    print(f"collect step cost: {cf/1e9:.2f} GFLOP, {cb/1e9:.2f} GB, "
          f"AI={cf/max(cb,1):.0f} -> "
          f"{'COMPUTE' if cf/V5E_PEAK_BF16 > cb/V5E_HBM_BW else 'HBM'}-bound",
          flush=True)


if __name__ == "__main__":
    kw = dict(a.split("=") for a in sys.argv[1:])
    main(**{k: int(v) for k, v in kw.items()})
