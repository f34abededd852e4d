"""Zoo-completion transform tests: action transforms, env-control
transforms, key ops, RND, replay-side transforms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import TransformedEnv
from rl_tpu.envs.classic.pendulum import PendulumEnv
from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy
from rl_tpu.envs.transforms import (
    ActionChunkTransform,
    ActionDiscretizer,
    BatchSizeTransform,
    ConditionalPolicySwitch,
    DiscreteActionProjection,
    EndOfLifeTransform,
    FlattenAction,
    FlattenTensorDict,
    Hash,
    NextStateReconstructor,
    PolicyAgeFilter,
    RandomTruncationTransform,
    RemoveEmptySpecs,
    RNDTransform,
    Stack,
    StepCounter,
    TerminateTransform,
    gSDENoise,
    make_conditional_skip_env,
    make_multi_action_env,
)
from rl_tpu.objectives import RNDLoss


def roll(env, steps, key, policy=CountingEnvCountPolicy):
    _, ys, _ = env.rollout(steps, policy, key=key)
    return ys


class TestActionTransforms:
    def test_discrete_action_projection(self, key):
        t = DiscreteActionProjection(num_actions_effective=18, max_actions=4)
        td = t.inv(TDict(), TDict(action=jnp.asarray([0, 5, 17])))
        assert td["action"].tolist() == [0, 1, 1]

    def test_action_discretizer(self, key):
        t = ActionDiscretizer(num_intervals=4, low=[-2.0], high=[2.0])
        td = t.inv(TDict(), TDict(action=jnp.asarray([[0], [3]])))
        np.testing.assert_allclose(np.asarray(td["action"]),
                                   [[-1.5], [1.5]])
        env = TransformedEnv(PendulumEnv(), ActionDiscretizer(
            num_intervals=5, low=[-2.0], high=[2.0]))
        spec = env.full_action_spec["action"]
        assert spec.n == 5

    def test_flatten_action(self):
        t = FlattenAction({"a1": (2,), "a2": (3,)})
        td = t.inv(TDict(), TDict(action=jnp.arange(5.0)))
        assert td["a1"].tolist() == [0.0, 1.0]
        assert td["a2"].tolist() == [2.0, 3.0, 4.0]
        assert t.transform_action_spec(None)["action"].shape == (5,)

    def test_action_chunk(self):
        t = ActionChunkTransform(chunk_len=3)
        ts, _ = t.reset(None, None, TDict())
        chunk = jnp.arange(6.0).reshape(3, 2)
        for i in range(3):
            out = t.inv(ts, TDict(action=chunk))
            assert out["action"].tolist() == chunk[i].tolist()
            ts, _ = t.step(ts, TDict())

    def test_multi_action_env(self, key):
        env = make_multi_action_env(CountingEnv(max_steps=100), num_actions=3)
        state, td = env.reset(key)
        td = td.set("action", jnp.ones((3,), jnp.int32))
        state, out = env.step(state, td, key)
        # three inner steps: counts 1,2,3 -> obs 3, reward 1+2+3
        assert float(out["next", "observation"][0]) == 3.0
        assert float(out["next", "reward"][0]) == 6.0

    def test_gsde_noise(self, key):
        env = TransformedEnv(CountingEnv(max_steps=5),
                             gSDENoise(noise_dim=4, action_dim=2))
        state, td = env.reset(key)
        assert td["_eps_gSDE"].shape == (4, 2)
        assert float(jnp.std(td["_eps_gSDE"])) > 0.1


class TestControlTransforms:
    def test_terminate_transform(self, key):
        env = TransformedEnv(
            CountingEnv(max_steps=100),
            TerminateTransform(lambda td: jnp.asarray(td["observation"])[..., 0] >= 3),
        )
        ys = roll(env, 6, key)
        term = np.asarray(ys["next", "terminated"]).squeeze(-1)
        # terminates at count 3, auto-resets, terminates again at 3
        assert term.tolist() == [False, False, True, False, False, True]

    def test_random_truncation(self, key):
        env = TransformedEnv(
            CountingEnv(max_steps=10_000),
            [StepCounter(), RandomTruncationTransform(min_horizon=1, max_horizon=4,
                                                      prob=1.0)],
        )
        ys = roll(env, 12, key)
        trunc = np.asarray(ys["next", "truncated"]).squeeze(-1)
        counts = np.asarray(ys["next", "step_count"]).squeeze(-1)
        assert trunc.any()
        assert counts[trunc].max() <= 4

    def test_end_of_life(self, key):
        class LivesEnv(CountingEnv):
            def _reset(self, k):
                state, td = super()._reset(k)
                return state, td.set("lives", jnp.asarray(3, jnp.int32))

            def _step(self, state, td, k):
                state, out = super()._step(state, td, k)
                lives = jnp.where(state["count"][0] >= 2, 2, 3).astype(jnp.int32)
                return state, out.set("lives", lives)

        env = TransformedEnv(LivesEnv(max_steps=100), EndOfLifeTransform())
        ys = roll(env, 4, key)
        eol = np.asarray(ys["next", "eol"]).squeeze(-1)
        assert eol.tolist() == [False, True, False, True]

    def test_conditional_skip(self, key):
        # skip every step where count is odd -> counter stalls on odd counts
        env = make_conditional_skip_env(
            CountingEnv(max_steps=100),
            lambda td: jnp.asarray(td["observation"])[..., 0] % 2 == 1,
        )
        ys = roll(env, 6, key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        # step1: 0->1; step2 skipped (1 odd) held at 1 reward 0 ...
        assert obs[0] == 1.0
        assert (obs == 1.0).all()
        r = np.asarray(ys["next", "reward"]).squeeze(-1)
        assert r[1] == 0.0

    def test_conditional_policy_switch(self, key):
        main = lambda td, k: td.set("action", jnp.ones((), jnp.int32))
        alt = lambda td, k: td.set("action", jnp.zeros((), jnp.int32))
        pol = ConditionalPolicySwitch(
            main, alt, lambda td: jnp.asarray(td["observation"])[..., 0] >= 2
        )
        env = CountingEnv(max_steps=100)
        _, ys, _ = env.rollout(5, pol, key=key)
        obs = np.asarray(ys["next", "observation"]).squeeze(-1)
        # increments until 2, then alt policy (action 0) freezes the count
        assert obs.tolist() == [1, 2, 2, 2, 2]


class TestKeyOps:
    def test_stack(self, key):
        t = Stack(["a", "b"], "ab", axis=0)
        ts, td = t.reset(key, None, TDict(a=jnp.zeros((3,)), b=jnp.ones((3,)),
                                          done=jnp.zeros((1,), bool)))
        assert td["ab"].shape == (2, 3)
        assert "a" not in td

    def test_hash_deterministic(self, key):
        t = Hash(["observation"], ["obs_hash"])
        td1 = TDict(observation=jnp.arange(8.0))
        h1 = t._apply(td1)["obs_hash"]
        h2 = t._apply(TDict(observation=jnp.arange(8.0)))["obs_hash"]
        h3 = t._apply(TDict(observation=jnp.arange(8.0) + 1))["obs_hash"]
        assert int(h1) == int(h2)
        assert int(h1) != int(h3)

    def test_hash_batched(self):
        t = Hash(["x"], ["h"])
        out = t._apply(TDict(x=jnp.stack([jnp.arange(4.0), jnp.arange(4.0) + 1])))
        h = out["h"]
        assert h.shape == (2,)
        assert int(h[0]) != int(h[1])

    def test_remove_empty_specs(self, key):
        t = RemoveEmptySpecs()
        _, td = t.reset(key, None, TDict(observation=jnp.zeros((1,)),
                                         empty=TDict(),
                                         done=jnp.zeros((1,), bool)))
        assert "empty" not in td

    def test_batch_size_transform(self, key):
        from rl_tpu.envs import BatchedEnv

        env = TransformedEnv(BatchedEnv(CountingEnv(max_steps=50), 6),
                             BatchSizeTransform((2, 3)))
        state, td = env.reset(key)
        assert td["observation"].shape == (2, 3, 1)


class TestRND:
    def test_intrinsic_reward_decreases_with_training(self, key):
        import optax

        t = RNDTransform(out_dim=16, hidden=(32,), intrinsic_weight=0.5)
        env = TransformedEnv(CountingEnv(max_steps=5), t)
        state, td = env.reset(key)
        # collect a few steps
        _, ys, _ = env.rollout(8, CountingEnvCountPolicy, key=key)
        ir = np.asarray(ys["next", "intrinsic_reward"])
        assert ir.shape[-1] == 1 and (ir >= 0).all() and ir.max() > 0

        # train the predictor on the visited obs; loss must drop
        tstate = state["t", "0"]
        loss_mod = RNDLoss(t, target_params=tstate["params", "target"],
                           stats=tstate["stats"])
        params = tstate["params", "predictor"]
        batch = TDict(observation=ys["next", "observation"].reshape(-1, 1))
        opt = optax.adam(1e-2)
        ostate = opt.init(params)
        first = None
        for _ in range(60):
            (l, _), g = jax.value_and_grad(
                lambda p: loss_mod(p, batch), has_aux=True)(params)
            upd, ostate = opt.update(g, ostate)
            params = optax.apply_updates(params, upd)
            first = first if first is not None else float(l)
        assert float(l) < first * 0.5

        # pushing refreshed predictor params back into env state
        state2 = t.replace_predictor(state, params)
        assert state2["t", "0", "params", "predictor"] is not None

    def test_reward_mixing(self, key):
        t = RNDTransform(out_dim=8, hidden=(16,), intrinsic_weight=1.0)
        env = TransformedEnv(CountingEnv(max_steps=10), t)
        _, ys, _ = env.rollout(3, CountingEnvCountPolicy, key=key)
        r = np.asarray(ys["next", "reward"]).squeeze(-1)
        ir = np.asarray(ys["next", "intrinsic_reward"]).squeeze(-1)
        np.testing.assert_allclose(r, np.asarray([1.0, 2.0, 3.0]) + ir, rtol=1e-5)


class TestRBTransforms:
    def test_flatten_tensordict(self):
        batch = TDict(x=jnp.zeros((4, 8, 3)))
        out = FlattenTensorDict()(batch)
        assert out["x"].shape == (32, 3)

    def test_next_state_reconstructor(self):
        traj = jnp.asarray([0, 0, 0, 1, 1])
        obs = jnp.arange(5.0)
        batch = TDict({"observation": obs, ("collector", "traj_ids"): traj})
        out = NextStateReconstructor()(batch)
        nxt = np.asarray(out["next", "observation"])
        np.testing.assert_allclose(nxt[:2], [1.0, 2.0])
        assert np.isnan(nxt[2])          # traj boundary
        np.testing.assert_allclose(nxt[3], 4.0)
        assert np.isnan(nxt[4])          # batch end

    def test_policy_age_filter(self):
        batch = TDict({"x": jnp.zeros((4,)),
                       ("collector", "policy_version"): jnp.asarray([9, 5, 10, 2])})
        out = PolicyAgeFilter(current_version=10, max_policy_lag=2)(batch)
        assert out["mask"].tolist() == [True, False, True, False]
