"""A/B: bf16 vs uint8 frame storage for the fused pixel84 pipeline.

The roofline analysis (benchmarks/PIXEL84_MFU_ANALYSIS.md) puts the
collect phase at AI=21 FLOP/B — deeply HBM-bound, with the [T,B,84,84,4]
frame stream the dominant byte term.  uint8 frames (exact for the
0/1-valued MinAtar channels; the standard Atari frame-buffer practice)
halve that stream; the net casts at its input.  This measures the FUSED
pipeline both ways on the real chip.

Run serially on the chip: python benchmarks/pixel84_uint8_ab.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import (_sync, build_ppo_shared, make_pixel84_env,  # noqa: E402
                   pipeline_flops_shared)


def run(dtype, num_envs=1024, steps=64, iters=10, windows=2):
    env = make_pixel84_env(num_envs, dtype=dtype)
    cast = ((lambda px: px.astype(jnp.bfloat16)) if dtype == jnp.uint8
            else None)
    built = build_ppo_shared(env, (84, 84, 4), num_envs=num_envs,
                             steps=steps, n_actions=3, obs_cast=cast)
    key = jax.random.PRNGKey(0)
    env_state, root = jax.tree.map(jnp.copy, env.reset(key))
    params = jax.tree.map(jnp.copy, built["params"])
    opt_state = jax.tree.map(jnp.copy, built["opt_state"])
    step = jax.jit(built["train_step"], donate_argnums=(0, 1, 2, 3))
    flops, byts = pipeline_flops_shared(built, env, num_envs=num_envs,
                                        steps=steps)
    params, opt_state, env_state, root, r = step(params, opt_state,
                                                 env_state, root, key)
    _sync(r)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, env_state, root, r = step(
                params, opt_state, env_state, root, k)
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    name = jnp.dtype(dtype).name
    sps = num_envs * steps / best
    print(f"{name:>8}: {sps:,.0f} env-steps/s  ({best*1e3:.1f} ms/iter; "
          f"cost model {0 if not flops else flops/1e9:.0f} GFLOP, "
          f"{0 if not byts else byts/1e9:.1f} GB)", flush=True)
    return sps


if __name__ == "__main__":
    base = run(jnp.bfloat16)
    u8 = run(jnp.uint8)
    print(f"uint8 / bf16 = {u8 / base:.3f}x", flush=True)
