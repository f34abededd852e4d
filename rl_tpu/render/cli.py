from __future__ import annotations

import argparse
import importlib

import jax
import numpy as np


def _resolve(path: str):
    module, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def render_checkpoint(checkpoint: str | None, env, policy=None, *,
                      steps: int = 500, seed: int = 0, out: str | None = None,
                      pixels_key=("next", "pixels")):
    """Rollout (optionally with checkpointed params) and dump frames/stats."""
    key = jax.random.PRNGKey(seed)
    params = None
    if checkpoint:
        from rl_tpu.checkpoint import load_pytree

        params = load_pytree(checkpoint)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]
    if policy is not None and params is not None:
        pol = lambda td, k: policy(params, td, k)
    elif policy is not None:
        pol = policy
    else:
        pol = None
    _, ys, _ = env.rollout(steps, pol, key=key)
    reward = np.asarray(ys["next", "reward"])
    stats = {
        "steps": steps,
        "reward_mean": float(reward.mean()),
        "reward_sum": float(reward.sum()),
        "episodes": int(np.asarray(ys["next", "done"]).sum()),
    }
    arrays = {"reward": reward}
    if pixels_key in ys:
        arrays["pixels"] = np.asarray(ys[pixels_key])
    if out:
        if out.endswith(".html"):
            if "pixels" not in arrays:
                raise ValueError(f"env wrote no {pixels_key} to render")
            px = arrays["pixels"]
            if px.ndim == 5:
                px = px[:, 0]
            if out.endswith(".view.html"):
                # interactive scrubber with per-step reward overlay
                from rl_tpu.record.video import write_trajectory_viewer

                r = reward[:, 0] if reward.ndim > 1 else reward
                stats["out"] = write_trajectory_viewer(
                    px, out, scalars={"reward": r.reshape(len(px), -1)[:, 0]})
            else:
                from rl_tpu.record.video import write_html

                stats["out"] = write_html(px, out)
        elif out.endswith(".ipynb"):
            # notebook export (reference rlrender notebook path): pure
            # JSON nbformat, pre-populated outputs — no toolchain needed
            from rl_tpu.record.video import write_notebook

            if "pixels" not in arrays:
                raise ValueError(f"env wrote no {pixels_key} to render")
            px = arrays["pixels"]
            if px.ndim == 5:
                px = px[:, 0]
            r = reward[:, 0] if reward.ndim > 1 else reward
            stats["out"] = write_notebook(
                px, out, scalars={"reward": r.reshape(len(px), -1)[:, 0]},
                stats=dict(stats))
        elif out.endswith((".gif", ".avi", ".mp4")):
            # video container output (reference rlrender mp4/gif path)
            if "pixels" not in arrays:
                raise ValueError(f"env wrote no {pixels_key} to render")
            from rl_tpu.record.video import write_video

            px = arrays["pixels"]
            if px.ndim == 5:  # [T, B, H, W, C] → first env
                px = px[:, 0]
            stats["out"] = write_video(px, out)
        else:
            np.savez(out, **arrays)
            stats["out"] = out
    return stats


def main(argv=None):
    p = argparse.ArgumentParser("rl_tpu.render", description=__doc__)
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint path")
    p.add_argument("--env", required=True,
                   help="dotted env class path, e.g. rl_tpu.envs.minatar.BreakoutEnv")
    p.add_argument("--num-envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write .npz of frames/rewards")
    args = p.parse_args(argv)

    env_cls = _resolve(args.env)
    env = env_cls()
    if args.num_envs > 1:
        from rl_tpu.envs import BatchedEnv

        env = BatchedEnv(env, args.num_envs)
    stats = render_checkpoint(args.checkpoint, env, steps=args.steps,
                              seed=args.seed, out=args.out)
    print(stats)
    return stats


if __name__ == "__main__":
    main()
