"""Imitation/model-based additions: ACT, diffusion BC, PILCO/GP/RBF."""
import jax
import jax.numpy as jnp
import optax
import pytest

from rl_tpu.data import TDict
from rl_tpu.modules import (
    ACTModel,
    DDPM,
    DiffusionActor,
    GPWorldModel,
    RBFController,
    unscented_transform,
)
from rl_tpu.objectives import (
    ACTLoss,
    DiffusionBCLoss,
    ExponentialQuadraticCost,
    PILCOLoss,
)

OBS, ACT, CHUNK = 5, 2, 4


class TestACT:
    def test_shapes_and_training_step(self, key):
        model = ACTModel(action_dim=ACT, chunk_size=CHUNK, latent_dim=8,
                         d_model=32, n_heads=2, n_encoder_layers=1,
                         n_decoder_layers=1)
        td = TDict(
            observation=jnp.ones((6, OBS)),
            action_chunk=0.5 * jnp.ones((6, CHUNK, ACT)),
        )
        loss_mod = ACTLoss(model, kl_weight=1.0)
        params = loss_mod.init(key, td)

        def total(p):
            t, _ = loss_mod(p, td, key)
            return t

        val, grads = jax.value_and_grad(total)(params)
        assert jnp.isfinite(val)
        assert any(
            jnp.any(g != 0) for g in jax.tree_util.tree_leaves(grads)
        )

    def test_inference_mode_no_chunk(self, key):
        model = ACTModel(action_dim=ACT, chunk_size=CHUNK, latent_dim=8,
                         d_model=32, n_heads=2, n_encoder_layers=1,
                         n_decoder_layers=1)
        td = TDict(observation=jnp.ones((3, OBS)),
                   action_chunk=jnp.ones((3, CHUNK, ACT)))
        params = ACTLoss(model).init(key, td)
        p = params.to_dict() if hasattr(params, "to_dict") else params
        pred, mu, log_var = model.apply({"params": p}, td["observation"])
        assert pred.shape == (3, CHUNK, ACT)
        assert jnp.all(mu == 0)  # prior mean at inference

    def test_loss_decreases(self, key):
        model = ACTModel(action_dim=ACT, chunk_size=CHUNK, latent_dim=4,
                         d_model=16, n_heads=2, n_encoder_layers=1,
                         n_decoder_layers=1)
        td = TDict(
            observation=jnp.ones((8, OBS)),
            action_chunk=0.3 * jnp.ones((8, CHUNK, ACT)),
        )
        loss_mod = ACTLoss(model, kl_weight=0.1)
        params = loss_mod.init(key, td)
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(p, s, k):
            (t, _), g = jax.value_and_grad(
                lambda q: loss_mod(q, td, k), has_aux=True)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, t

        k = key
        first = None
        for _ in range(20):
            k, sub = jax.random.split(k)
            params, state, t = step(params, state, sub)
            first = first if first is not None else float(t)
        assert float(t) < first


class TestDiffusionBC:
    def test_ddpm_add_noise_bounds(self, key):
        ddpm = DDPM(action_dim=ACT, num_steps=10)
        clean = jnp.ones((4, ACT))
        noisy, noise = ddpm.add_noise(
            key, clean, jnp.zeros((4,), jnp.int32)
        )
        # at t=0 almost no corruption
        assert jnp.allclose(noisy, clean, atol=0.05)

    def test_loss_and_sampling(self, key):
        actor = DiffusionActor(action_dim=ACT, num_steps=8)
        td = TDict(
            observation=jnp.ones((6, OBS)),
            action=0.2 * jnp.ones((6, ACT)),
        )
        loss_mod = DiffusionBCLoss(actor)
        params = loss_mod.init(key, td)

        def total(p):
            t, _ = loss_mod(p, td, key)
            return t

        val, grads = jax.value_and_grad(total)(params)
        assert jnp.isfinite(val)
        assert any(jnp.any(g != 0) for g in jax.tree_util.tree_leaves(grads))
        out = actor(params, td, key)
        assert out["action"].shape == (6, ACT)
        assert jnp.all(jnp.isfinite(out["action"]))

    def test_deterministic_chain_reproducible(self, key):
        actor = DiffusionActor(action_dim=ACT, num_steps=6,
                               deterministic=True)
        td = TDict(observation=jnp.ones((2, OBS)))
        params = actor.init(key, td)
        a1 = actor(params, td, jax.random.PRNGKey(1))["action"]
        a2 = actor(params, td, jax.random.PRNGKey(2))["action"]
        # initial latent differs but the chain injects no noise; outputs
        # still differ through x_T — so only check determinism per key
        a3 = actor(params, td, jax.random.PRNGKey(1))["action"]
        assert jnp.allclose(a1, a3)


class TestPILCO:
    def test_gp_fit_predict_interpolates(self, key):
        gp = GPWorldModel(state_dim=1, action_dim=1, noise_var=1e-6)
        X = jnp.linspace(-1, 1, 20)[:, None]
        Xa = jnp.concatenate([X, jnp.zeros_like(X)], -1)
        Y = jnp.sin(3 * X)
        fitted = gp.fit(Xa, Y)
        mean, var = gp.predict(Xa, fitted)
        assert jnp.allclose(mean, Y, atol=1e-3)
        assert jnp.all(var < 1e-3)

    def test_unscented_matches_linear(self):
        # linear fn: UT is exact
        m = jnp.array([1.0, 2.0])
        S = jnp.array([[0.5, 0.1], [0.1, 0.3]])
        A = jnp.array([[2.0, 0.0], [1.0, 1.0]])

        def fn(x):
            return A @ x, jnp.zeros(2)

        m2, S2 = unscented_transform(m, S, fn)
        assert jnp.allclose(m2, A @ m, atol=1e-4)
        assert jnp.allclose(S2, A @ S @ A.T, atol=1e-3)

    def test_expected_cost_properties(self):
        cost = ExponentialQuadraticCost()
        D = 2
        at_target = cost.expected_cost(jnp.zeros(D), 1e-8 * jnp.eye(D))
        far = cost.expected_cost(10 * jnp.ones(D), 1e-8 * jnp.eye(D))
        assert float(at_target) < 0.01
        assert float(far) > 0.99

    def test_pilco_loss_grads(self, key):
        gp = GPWorldModel(state_dim=2, action_dim=1)
        k1, k2 = jax.random.split(key)
        X = jax.random.normal(k1, (15, 3))
        Y = 0.1 * jax.random.normal(k2, (15, 2))
        gp.fit(X, Y)
        ctrl = RBFController(state_dim=2, action_dim=1, n_centers=4)
        params = ctrl.init(key)
        loss_mod = PILCOLoss(gp, ctrl, ExponentialQuadraticCost(), horizon=4)
        td = TDict(observation=jnp.array([0.5, -0.5]))

        def total(p):
            t, _ = loss_mod(p, td)
            return t

        val, grads = jax.value_and_grad(total)(params)
        assert jnp.isfinite(val)
        assert any(jnp.any(g != 0) for g in jax.tree_util.tree_leaves(grads))

    def test_rbf_controller_bounded(self, key):
        ctrl = RBFController(state_dim=3, action_dim=2, n_centers=5,
                             u_max=2.0)
        params = ctrl.init(key)
        # squash_sin peaks at 9+1)/8? max |(9 sin f + sin 3f)/8| = 1.0 at f=pi/2
        a = ctrl(params, 100 * jax.random.normal(key, (32, 3)))
        assert jnp.all(jnp.abs(a) <= 2.0 + 1e-5)
