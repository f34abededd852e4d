"""Module-layer additions: masked dists, 3D/DDPG nets, actor wrappers."""
import jax
import jax.numpy as jnp
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.specs import Bounded
from rl_tpu.modules import (
    Conv3dNet,
    DdpgCnnActor,
    DdpgCnnQNet,
    DdpgMlpActor,
    DdpgMlpQNet,
    DecisionTransformerInferenceWrapper,
    LLMMaskedCategorical,
    MaskedOneHotCategorical,
    MultiStepActorWrapper,
    SafeModule,
    TDModule,
    VmapModule,
)
from rl_tpu.modules.transformer import DecisionTransformer


class TestMaskedDists:
    def test_one_hot_masked(self, key):
        logits = jnp.zeros((4, 5))
        mask = jnp.array([True, True, False, False, False])
        d = MaskedOneHotCategorical(logits=logits, mask=mask)
        s = d.sample(key)
        assert s.shape == (4, 5)
        assert jnp.all(s[:, 2:] == 0)  # masked classes never sampled
        assert jnp.allclose(s.sum(-1), 1.0)
        lp = d.log_prob(s)
        assert jnp.all(jnp.isfinite(lp))
        assert d.mode.shape == (4, 5)

    def test_llm_masked(self, key):
        B, T, V = 2, 6, 11
        logits = jax.random.normal(key, (B, T, V))
        mask = jnp.array([[0, 0, 1, 1, 1, 0], [0, 1, 1, 1, 1, 1]], bool)
        d = LLMMaskedCategorical(logits, mask)
        tok = d.sample(key)
        assert tok.shape == (B, T)
        assert jnp.all(tok[~mask] == 0)
        lp = d.log_prob(tok)
        # masked positions contribute exactly 0 to sequence sums
        assert jnp.all(lp[~mask] == 0.0)
        assert jnp.all(lp[mask] < 0.0)
        ent = d.entropy()
        assert jnp.all(ent[~mask] == 0.0)
        assert jnp.all(ent[mask] > 0.0)


class TestNets:
    def test_conv3d(self, key):
        net = Conv3dNet(channels=(8, 16), kernel_sizes=(3, 3), strides=(2, 1))
        x = jnp.ones((2, 4, 10, 10, 3))  # [B, D, H, W, C]
        params = net.init(key, x)["params"]
        y = net.apply({"params": params}, x)
        assert y.ndim == 2 and y.shape[0] == 2

    def test_ddpg_mlp(self, key):
        actor = DdpgMlpActor(action_dim=3, num_cells=(16, 16))
        obs = jnp.ones((5, 7))
        pa = actor.init(key, obs)["params"]
        a = actor.apply({"params": pa}, obs)
        assert a.shape == (5, 3)
        qnet = DdpgMlpQNet(num_cells=(16, 16))
        pq = qnet.init(key, obs, a)["params"]
        q = qnet.apply({"params": pq}, obs, a)
        assert q.shape == (5, 1)

    def test_ddpg_cnn(self, key):
        pix = jnp.ones((2, 84, 84, 4))
        actor = DdpgCnnActor(action_dim=2, num_cells=(32,))
        pa = actor.init(key, pix)["params"]
        a = actor.apply({"params": pa}, pix)
        assert a.shape == (2, 2)
        qnet = DdpgCnnQNet(num_cells=(32,))
        pq = qnet.init(key, pix, a)["params"]
        assert qnet.apply({"params": pq}, pix, a).shape == (2, 1)


class _ChunkPolicy:
    """Deterministic chunk policy: chunk[i] = base + i (testable arith)."""

    in_keys = ["observation"]
    out_keys = ["action_chunk"]

    def __init__(self, n, act_dim=1):
        self.n, self.act_dim = n, act_dim

    def init(self, key, td):
        return TDict()

    def __call__(self, params, td, key=None):
        obs = jnp.asarray(td["observation"], jnp.float32)
        base = obs[..., :1]
        chunk = base[..., None, :] + jnp.arange(self.n, dtype=jnp.float32)[
            :, None
        ]
        return td.set("action_chunk", jnp.broadcast_to(
            chunk, obs.shape[:-1] + (self.n, self.act_dim)
        ))


class TestMultiStepActorWrapper:
    def test_chunk_playback(self):
        n = 3
        wrapper = MultiStepActorWrapper(_ChunkPolicy(n), n)
        td = TDict(observation=jnp.array([[10.0], [20.0]]))
        actions = []
        for t in range(2 * n):
            out = wrapper(TDict(), td)
            actions.append(out["action"][:, 0])
            # promote carried state like step_mdp would
            td = td.set("action_buffer", out["next", "action_buffer"]).set(
                "chunk_counter", out["next", "chunk_counter"]
            )
        acts = jnp.stack(actions)  # [2n, B]
        # plays 10,11,12 then re-queries: 10,11,12 again (obs unchanged)
        assert jnp.allclose(acts[:, 0], jnp.array([10, 11, 12, 10, 11, 12.0]))
        assert jnp.allclose(acts[:, 1], jnp.array([20, 21, 22, 20, 21, 22.0]))

    def test_is_init_refresh(self):
        n = 3
        wrapper = MultiStepActorWrapper(_ChunkPolicy(n), n)
        td = TDict(observation=jnp.array([[5.0]]))
        out = wrapper(TDict(), td)
        td = td.set("action_buffer", out["next", "action_buffer"]).set(
            "chunk_counter", out["next", "chunk_counter"]
        )
        # mid-chunk reset: is_init forces a refresh → restart at base
        td = td.set("observation", jnp.array([[7.0]])).set(
            "is_init", jnp.array([[True]])
        )
        out = wrapper(TDict(), td)
        assert float(out["action"][0, 0]) == 7.0


class TestDTInferenceWrapper:
    def test_rolling_context(self, key):
        OBS, ACT, L = 4, 2, 5
        dt = DecisionTransformer(state_dim=OBS, action_dim=ACT, n_layers=1,
                                 n_heads=2, d_model=16, max_len=L)
        wrap = DecisionTransformerInferenceWrapper(dt, context_len=L)
        td = TDict(
            observation=jnp.ones((3, OBS)),
            return_to_go=jnp.full((3, 1), 90.0),
        )
        params = wrap.init(key, td)
        out = wrap(params, td, key)
        assert out["action"].shape == (3, ACT)
        assert out["next", "dt_obs_ctx"].shape == (3, L, OBS)
        # newest obs sits in the last context slot
        assert jnp.allclose(out["next", "dt_obs_ctx"][:, -1], 1.0)
        assert jnp.allclose(out["next", "dt_rtg_ctx"][:, -1, 0], 90.0)
        # feeding state back advances the window
        td2 = TDict(
            observation=2 * jnp.ones((3, OBS)),
            return_to_go=jnp.full((3, 1), 80.0),
            dt_obs_ctx=out["next", "dt_obs_ctx"],
            dt_act_ctx=out["next", "dt_act_ctx"],
            dt_rtg_ctx=out["next", "dt_rtg_ctx"],
        )
        out2 = wrap(params, td2, key)
        assert jnp.allclose(out2["next", "dt_obs_ctx"][:, -2], 1.0)
        assert jnp.allclose(out2["next", "dt_obs_ctx"][:, -1], 2.0)


class TestVmapSafe:
    def test_vmap_module(self, key):
        from rl_tpu.modules import MLP

        mod = TDModule(MLP(out_features=2, num_cells=(8,)),
                       in_keys=["observation"], out_keys=["out"])
        vm = VmapModule(mod, vmap_dim=1)  # vmap over an agent dim
        td = TDict(observation=jnp.ones((4, 3, 5)))  # [B, n_agents, obs]
        params = vm.init(key, td)
        out = vm(params, td)
        assert out["out"].shape == (4, 3, 2)

    def test_safe_module_projects(self, key):
        mod = TDModule(lambda x: x * 10.0, in_keys=["observation"],
                       out_keys=["action"])
        spec = {"action": Bounded(low=-1.0, high=1.0, shape=(3,))}
        safe = SafeModule(mod, spec)
        td = TDict(observation=jnp.ones((2, 3)))
        out = safe(TDict(), td)
        assert jnp.all(out["action"] <= 1.0)
        assert jnp.all(out["action"] >= -1.0)


class TestConvActorCritic:
    def test_shared_trunk_shapes_and_grads(self, key):
        import jax.numpy as jnp
        import jax

        from rl_tpu.modules import ConvActorCritic

        m = ConvActorCritic(n_actions=5, dtype=jnp.bfloat16)
        p = m.init(key, jnp.zeros((2, 84, 84, 4)))
        logits, value = m.apply(p, jnp.zeros((3, 84, 84, 4)))
        assert logits.shape == (3, 5) and logits.dtype == jnp.float32
        assert value.shape == (3, 1)

        # one trunk: exactly one ConvNet parameter subtree
        top = list(p["params"].keys())
        assert sum(1 for k in top if k.startswith("ConvNet")) == 1

        def loss(pp):
            l, v = m.apply(pp, jnp.ones((2, 84, 84, 4)))
            return l.sum() + v.sum()

        g = jax.grad(lambda pp: loss(pp))(p)
        # both heads' gradients flow into the shared trunk
        gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(
            g["params"]["ConvNet_0"]))
        assert gsum > 0
