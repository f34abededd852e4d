"""sota-check: run every sota script with tiny smoke settings and report
pass/fail (counterpart of ``/root/reference/sota-check/`` — there, sbatch
scripts that run each sota implementation with its default config before a
release and log to a common dashboard; here, an in-process serial runner
with per-script timeouts).  Run::

    python sota/sota_check.py [filter_substring]

Exit status is non-zero if any script fails.  Runs on CPU by default
(RLTPU_DEVICE=cpu) so it is safe to run alongside TPU jobs.
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# script → tiny-override argv (keep each under ~2 min on CPU)
SMOKE = {
    "a2c_cartpole.py": ["total_frames=4096", "frames_per_batch=2048"],
    "bandits_dqn.py": ["iters=50"],
    "cql_online_pendulum.py": [
        "total_frames=2000", "init_random_frames=500", "num_random=4"],
    "cql_pendulum_offline.py": [
        "gradient_steps=200", "dataset_frames=3000"],
    "crossq_pendulum.py": ["total_frames=2000", "init_random_frames=500"],
    "diffusion_bc_pendulum.py": [
        "gradient_steps=200", "dataset_frames=3000"],
    "discrete_sac_cartpole.py": ["total_frames=2000",
                                 "init_random_frames=500"],
    "dpo_pairs.py": ["iters=10", "sft_iters=10", "batch=16", "pairs=128"],
    "dqn_spaceinvaders.py": ["total_frames=1024", "num_envs=16",
                             "frames_per_batch=128",
                             "buffer_capacity=5000"],
    "dreamer_pendulum.py": ["iters=3", "seq_len=8", "horizon=5"],
    "dt_pendulum_offline.py": ["gradient_steps=100", "traj_steps=100",
                               "eval_steps=20"],
    "expert_iteration_arithmetic.py": ["iters=20"],
    "gail_pendulum.py": ["iters=10", "expert_frames=2000"],
    "grpo_arithmetic.py": ["iters=20"],
    "grpo_chat.py": ["iters=5", "num_prompts=4"],
    "grpo_gpt2.py": ["iters=3", "sft_iters=3", "num_prompts=2",
                     "group_size=4", "logger=none"],
    "grpo_countdown.py": ["iters=5", "num_prompts=4", "group_size=4",
                          "sft_iters=3", "sft_batch=32"],
    # tiny-model pass through the FULL grpo_10m stack, driven by the
    # continuous-batching ServingEngine (rl_tpu.serve) as the engine
    "grpo_10m.py": ["iters=2", "num_prompts=2", "group_size=2",
                    "num_workers=2", "d_model=32", "n_layers=1",
                    "n_heads=2", "engine=serving", "logger=none",
                    "eval_every=0"],
    "iql_online_pendulum.py": ["total_frames=2000",
                               "init_random_frames=500"],
    "multiagent_iddpg.py": ["total_frames=2000"],
    "multiagent_mappo.py": ["total_frames=4096", "frames_per_batch=2048"],
    "multiagent_pettingzoo.py": ["total_frames=3200",
                                 "frames_per_batch=1600", "num_envs=4",
                                 "max_cycles=50"],
    "multiagent_qmix.py": ["total_frames=2000"],
    "multiagent_sac.py": ["total_frames=2000"],
    "offline_to_online_pendulum.py": [
        "dataset_frames=2000", "pretrain_steps=200", "total_frames=2000"],
    "pilco_pendulum.py": ["rounds=1", "fit_points=100", "opt_steps=20"],
    "ppo_async_pendulum.py": ["updates=30", "frames_per_batch=256",
                              "batch_size=512"],
    "redq_pendulum.py": ["total_frames=2000", "init_random_frames=500"],
    "reinforce_pendulum.py": ["total_frames=4096", "frames_per_batch=2048"],
    "rnd_mountaincar.py": ["total_frames=4096", "frames_per_batch=2048"],
    "td3_bc_pendulum_offline.py": [
        "gradient_steps=200", "dataset_frames=3000"],
    "vla_grpo_toy.py": ["iters=20"],
}
TRAINER_YAMLS = {
    "ppo_trainer.yaml": ["trainer.total_frames=2048",
                         "trainer.frames_per_batch=1024"],
    "a2c_trainer.yaml": ["trainer.total_frames=2048",
                         "trainer.frames_per_batch=1024"],
    "reinforce_trainer.yaml": ["trainer.total_frames=2048",
                               "trainer.frames_per_batch=1024"],
    "sac_trainer.yaml": ["trainer.total_frames=1024",
                         "trainer.init_random_frames=0"],
    "ddpg_trainer.yaml": ["trainer.total_frames=1024",
                          "trainer.init_random_frames=0"],
    "td3_trainer.yaml": ["trainer.total_frames=1024",
                         "trainer.init_random_frames=0"],
    "dqn_trainer.yaml": ["trainer.total_frames=1024"],
    "iql_trainer.yaml": ["trainer.gradient_steps=200",
                         "trainer.dataset.frames=2000"],
    "multiagent_trainer.yaml": ["trainer.total_frames=4096"],
    "cql_trainer.yaml": ["trainer.gradient_steps=200",
                         "trainer.dataset.frames=2000"],
}


def run_one(argv, timeout_s=300):
    env = dict(os.environ)
    env["RLTPU_DEVICE"] = env.get("RLTPU_DEVICE", "cpu")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        proc = subprocess.run(argv, capture_output=True, text=True,
                              timeout=timeout_s, env=env, cwd=REPO)
        ok = proc.returncode == 0
        err = "" if ok else proc.stderr.strip().splitlines()[-1:]
    except subprocess.TimeoutExpired:
        ok, err = False, ["timeout"]
    return ok, time.time() - t0, err


def main(pattern: str = ""):
    jobs = [(name, [sys.executable, os.path.join(HERE, name), *ov])
            for name, ov in sorted(SMOKE.items())]
    jobs += [(f"train.py {y}", [sys.executable, os.path.join(HERE, "train.py"),
                                os.path.join(HERE, "configs", y), *ov])
             for y, ov in sorted(TRAINER_YAMLS.items())]
    failures = []
    for name, argv in jobs:
        if pattern and pattern not in name:
            continue
        ok, dt, err = run_one(argv)
        print(f"{'PASS' if ok else 'FAIL'}  {name:42s} {dt:6.1f}s"
              + ("" if ok else f"  {err}"))
        sys.stdout.flush()
        if not ok:
            failures.append(name)
    print(f"\n{len(failures)} failure(s)"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else ""))
