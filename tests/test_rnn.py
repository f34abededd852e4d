"""Recurrent module tests: step/sequence parity, reset masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict
from rl_tpu.envs import BatchedEnv, TransformedEnv
from rl_tpu.envs.testing import CountingEnv, CountingEnvCountPolicy
from rl_tpu.envs.transforms import Compose, InitTracker, TensorDictPrimer
from rl_tpu.modules.rnn import GRUModule, LSTMModule, recurrent_mode, set_recurrent_mode


@pytest.mark.parametrize("cls", [GRUModule, LSTMModule], ids=["gru", "lstm"])
class TestRNNModules:
    def make(self, cls, key, B=4, T=6, D=3, H=8):
        mod = cls(D, H, in_key="observation")
        x = jax.random.normal(key, (T, B, D))
        is_init = jnp.zeros((T, B, 1), bool).at[0].set(True)
        td_seq = TDict(observation=x, is_init=is_init)
        params = mod.init(key, TDict(observation=x[0]))
        return mod, params, td_seq

    def test_step_vs_sequence_parity(self, cls, key):
        """Stepping one-by-one == scanning the sequence (the reference's
        core RNN correctness check)."""
        mod, params, td_seq = self.make(cls, key)
        with set_recurrent_mode(True):
            out_seq = mod(params, td_seq)
        # manual stepping
        td = TDict(observation=td_seq["observation"][0],
                   is_init=td_seq["is_init"][0])
        outs = []
        for t in range(td_seq["observation"].shape[0]):
            td = td.set("observation", td_seq["observation"][t]).set(
                "is_init", td_seq["is_init"][t]
            )
            td = mod.step(params, td)
            outs.append(td["embed"])
            # promote updated state to the next step's root (step_mdp's job)
            for n in mod.state_names:
                td = td.set(("recurrent_state", n), td["next", "recurrent_state", n])
        manual = jnp.stack(outs)
        np.testing.assert_allclose(
            np.asarray(out_seq["embed"]), np.asarray(manual), rtol=2e-4, atol=1e-5
        )

    def test_reset_mask_restarts_state(self, cls, key):
        mod, params, td_seq = self.make(cls, key, T=8)
        # mark a mid-sequence reset at t=4
        is_init = np.zeros((8, 4, 1), bool)
        is_init[0] = True
        is_init[4] = True
        td_a = td_seq.set("is_init", jnp.asarray(is_init))
        with set_recurrent_mode(True):
            out_a = mod(params, td_a)["embed"]
        # a fresh run starting at t=4 must match the reset run's tail
        td_tail = TDict(
            observation=td_seq["observation"][4:],
            is_init=jnp.asarray(is_init[:4]),
        )
        with set_recurrent_mode(True):
            out_tail = mod(params, td_tail)["embed"]
        np.testing.assert_allclose(
            np.asarray(out_a[4:]), np.asarray(out_tail), rtol=2e-4, atol=1e-5
        )

    def test_state_keys_written(self, cls, key):
        mod, params, td_seq = self.make(cls, key)
        td = TDict(observation=td_seq["observation"][0],
                   is_init=td_seq["is_init"][0])
        out = mod.step(params, td)
        for n in mod.state_names:
            assert ("next", "recurrent_state", n) in out
            assert out["next", "recurrent_state", n].shape == (4, 8)

    def test_primer_spec(self, cls, key):
        mod, params, _ = self.make(cls, key)
        primer = mod.make_primer()
        for n in mod.state_names:
            assert ("recurrent_state", n) in primer

    def test_jit_and_grads(self, cls, key):
        mod, params, td_seq = self.make(cls, key)

        @jax.jit
        def loss(p):
            with set_recurrent_mode(True):
                out = mod(p, td_seq)
            return (out["embed"] ** 2).sum()

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


class TestRNNInEnvLoop:
    def test_gru_policy_with_primer(self, key):
        """RNN policy collecting through a TransformedEnv with InitTracker +
        primer — the reference's recommended wiring (rnn.py docstring)."""
        mod = GRUModule(1, 4, in_key="observation")
        env = TransformedEnv(
            BatchedEnv(CountingEnv(max_steps=3), 2),
            Compose(InitTracker(), TensorDictPrimer(mod.make_primer())),
        )
        params = mod.init(key, TDict(observation=jnp.zeros((2, 1))))

        def policy(td, k):
            td = mod.step(params, td)
            return CountingEnvCountPolicy(td)

        _, ys, _ = env.rollout(6, policy, key=key)
        assert ("next", "recurrent_state", "h") in ys
        h = np.asarray(ys["next", "recurrent_state", "h"])
        assert h.shape == (6, 2, 4)
        assert (np.abs(h) > 0).any()
