"""A/B: bf16 vs uint8 frames for the SPLIT (actor+critic) pixel84 pipeline.

Companion to benchmarks/pixel84_uint8_ab.py (shared trunk, +19%): the
split pipeline runs two Nature-CNN towers, so the frame stream is read
twice more per phase.  flax Conv casts inputs to its compute dtype, so
uint8 frames flow through build_ppo unchanged.

Run serially on the chip: python benchmarks/pixel84_split_uint8_ab.py

Measured (v5e, round 5): bf16 330,754 vs uint8 333,791 env-steps/s —
**+0.9%, not worth a layout change**: the split update re-runs BOTH conv
towers (forward+backward), so its arithmetic intensity is ~2x the shared
trunk's and the frame stream is no longer the binding byte term.  The
shared-trunk pipeline keeps the uint8 default (+19%); the split stays
bf16.
"""
import sys

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import bench_fused, build_ppo, make_pixel84_env  # noqa: E402


def run(dtype, num_envs=1024, steps=16):
    env = make_pixel84_env(num_envs, dtype=dtype)
    built = build_ppo(env, (84, 84, 4), num_envs=num_envs, steps=steps,
                      channels=(32, 64, 64), kernels=(8, 4, 3),
                      strides=(4, 2, 1), n_actions=3, dtype=jnp.bfloat16)
    sps, fps = bench_fused(built, num_envs=num_envs, steps=steps, iters=10,
                           windows=2)
    print(f"{jnp.dtype(dtype).name:>8}: {sps:,.0f} env-steps/s", flush=True)
    return sps


if __name__ == "__main__":
    base = run(jnp.bfloat16)
    u8 = run(jnp.uint8)
    print(f"uint8 / bf16 = {u8 / base:.3f}x", flush=True)
