"""Transformer backbone, Decision Transformer losses, and the LLM stack
(History, ChatEnv, GRPO/SFT) — including a GRPO learning smoke test on a
toy next-token task with a real (tiny) causal LM."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.llm import History, Message
from rl_tpu.envs.llm import ChatEnv, DatasetChatEnv
from rl_tpu.modules.transformer import CausalTransformer, DecisionTransformer, TransformerLM
from rl_tpu.objectives.decision_transformer import DTLoss, OnlineDTLoss
from rl_tpu.objectives.llm import (
    CISPOLoss,
    DAPO,
    GRPOLoss,
    MCAdvantage,
    SFTLoss,
    grpo_loss,
    mc_advantage,
)


class TestCausalTransformer:
    def test_causality(self, key):
        """Changing future inputs must not affect past outputs."""
        net = CausalTransformer(n_layers=2, d_model=32, n_heads=2)
        x = jax.random.normal(key, (2, 8, 4))
        params = net.init(key, x)["params"]
        out1 = net.apply({"params": params}, x)
        x2 = x.at[:, 5:].add(10.0)
        out2 = net.apply({"params": params}, x2)
        np.testing.assert_allclose(
            np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), rtol=1e-4, atol=1e-5
        )
        assert not np.allclose(np.asarray(out1[:, 5:]), np.asarray(out2[:, 5:]))

    def test_lm_shapes(self, key):
        lm = TransformerLM(vocab_size=50, n_layers=1, d_model=32)
        toks = jnp.zeros((3, 7), jnp.int32)
        params = lm.init(key, toks)["params"]
        logits = lm.apply({"params": params}, toks)
        assert logits.shape == (3, 7, 50)


class TestDecisionTransformer:
    def make_batch(self, key, B=4, T=6, S=5, A=2):
        ks = jax.random.split(key, 3)
        return TDict(
            observation=jax.random.normal(ks[0], (B, T, S)),
            action=jax.random.uniform(ks[1], (B, T, A), minval=-1, maxval=1),
            return_to_go=jax.random.normal(ks[2], (B, T, 1)),
        )

    def test_deterministic_dt_loss(self, key):
        dt = DecisionTransformer(state_dim=5, action_dim=2, n_layers=1, d_model=32)

        class Actor:
            def init(self, k, td):
                return dt.init(
                    k, td["observation"], td["action"], td["return_to_go"]
                )["params"]

            def __call__(self, params, td, key=None):
                if hasattr(params, "to_dict"):
                    params = params.to_dict()
                pred = dt.apply(
                    {"params": params}, td["observation"], td["action"], td["return_to_go"]
                )
                return td.set("pred_action", pred)

        loss = DTLoss(Actor())
        td = self.make_batch(key)
        params = loss.init(key, td)
        total, m = loss(params, td)
        assert np.isfinite(float(total))
        g = jax.grad(lambda p: loss(p, td)[0])(params)
        assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g))

    def test_online_dt_loss(self, key):
        dt = DecisionTransformer(state_dim=5, action_dim=2, n_layers=1, d_model=32,
                                 stochastic=True)

        class Actor:
            def init(self, k, td):
                return dt.init(
                    k, td["observation"], td["action"], td["return_to_go"]
                )["params"]

            def __call__(self, params, td, key=None):
                if hasattr(params, "to_dict"):
                    params = params.to_dict()
                loc, scale = dt.apply(
                    {"params": params}, td["observation"], td["action"], td["return_to_go"]
                )
                return td.set("loc", loc).set("scale", scale)

        loss = OnlineDTLoss(Actor(), action_dim=2)
        td = self.make_batch(key)
        params = loss.init(key, td)
        metrics = loss.loss(params, td)
        for k in ("loss_log_likelihood", "loss_entropy", "loss_alpha"):
            assert k in metrics


class TestHistory:
    def test_append_immutable(self):
        h = History().append("system", "be nice").append("user", "hi")
        h2 = h.append("assistant", "hello!")
        assert len(h) == 2 and len(h2) == 3
        assert h2.last.role == "assistant"

    def test_chats_roundtrip(self):
        chats = [{"role": "user", "content": "2+2?"}]
        h = History.from_chats(chats)
        assert h.to_chats() == chats

    def test_render_and_tokens(self):
        h = History().append("user", "hello")
        text = h.render()
        assert "<|im_start|>user" in text and text.endswith("assistant\n")

        def fake_tokenizer(s):
            return [ord(c) % 97 for c in s[:10]]

        td = h.to_tokens(fake_tokenizer, max_len=16)
        assert td["tokens"].shape == (16,)
        assert td["attention_mask"].sum() == 10


class TestChatEnv:
    def test_reset_step_reward(self):
        env = DatasetChatEnv([("2+2?", "4"), ("3+3?", "6")], seed=0)
        h = env.reset(0)
        assert h.last.content == "2+2?"
        h2, r, done, _ = env.step(h, "the answer is 4")
        assert r == 1.0 and done
        h3, r0, _, _ = env.step(h, "i think 5")
        assert r0 == 0.0

    def test_rollout_group(self):
        env = DatasetChatEnv([("2+2?", "4")])

        def engine(history):
            return "4", [1, 2], [-0.1, -0.2]

        group = env.rollout_group(engine, group_size=4, idx=0)
        assert len(group) == 4
        assert all(g["reward"] == 1.0 for g in group)


class TestGRPOKernels:
    def test_mc_advantage_group_relative(self):
        rewards = jnp.array([1.0, 0.0, 1.0, 1.0, 0.0, 0.0])
        gid = jnp.array([0, 0, 0, 1, 1, 1])
        adv = mc_advantage(rewards, gid, 2, std_normalize=False)
        np.testing.assert_allclose(
            np.asarray(adv), [1 / 3, -2 / 3, 1 / 3, 2 / 3, -1 / 3, -1 / 3], rtol=1e-5
        )

    def test_uniform_rewards_zero_advantage(self):
        adv = mc_advantage(jnp.ones(6), jnp.array([0, 0, 0, 1, 1, 1]), 2)
        np.testing.assert_allclose(np.asarray(adv), 0.0, atol=1e-6)

    def test_grpo_loss_zero_at_old_policy_zero_adv(self, key):
        lp = jax.random.normal(key, (4, 6))
        mask = jnp.ones((4, 6), bool)
        loss, m = grpo_loss(lp, lp, jnp.zeros(4), mask)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(m["ESS"]), 1.0, rtol=1e-5)

    def test_kl_to_ref_positive(self, key):
        k1, k2 = jax.random.split(key)
        lp = jax.random.normal(k1, (4, 6))
        ref = jax.random.normal(k2, (4, 6))
        mask = jnp.ones((4, 6), bool)
        _, m = grpo_loss(lp, lp, jnp.ones(4), mask, ref_log_probs=ref, kl_coeff=0.1)
        assert float(m["kl_to_ref"]) > 0

    def test_mask_excludes_prompt_tokens(self, key):
        lp_new = jax.random.normal(key, (2, 4))
        # prompt region (cols 0-1) has shifted old log-probs, response equal
        shift = jnp.array([[5.0, 5.0, 0.0, 0.0]] * 2)
        lp_old = lp_new - shift
        mask = jnp.array([[0, 0, 1, 1], [0, 0, 1, 1]], bool)
        loss_masked, _ = grpo_loss(lp_new, lp_old, jnp.ones(2), mask)
        loss_full, _ = grpo_loss(lp_new, lp_old, jnp.ones(2), jnp.ones((2, 4), bool))
        # masked: on-policy response only -> surrogate = adv = 1 -> loss -1
        np.testing.assert_allclose(float(loss_masked), -1.0, rtol=1e-5)
        assert float(loss_masked) != float(loss_full)

    def test_variants_run(self, key):
        td = TDict(
            log_probs=jax.random.normal(key, (4, 6)),
            sample_log_prob=jax.random.normal(key, (4, 6)),
            advantage=jnp.ones(4),
            response_mask=jnp.ones((4, 6), bool),
        )
        for cls in (GRPOLoss, DAPO, CISPOLoss, SFTLoss):
            total, m = cls()(None, td)
            assert np.isfinite(float(total))


@pytest.mark.slow
class TestGRPOLearning:
    def test_next_token_task(self, key):
        """GRPO teaches a tiny LM to output prompt_token+1 (reward 1/0)."""
        V, GROUPS, GSIZE = 16, 8, 8
        lm = TransformerLM(vocab_size=V, n_layers=1, n_heads=2, d_model=32)
        toks0 = jnp.zeros((1, 1), jnp.int32)
        params = lm.init(key, toks0)["params"]
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        def sample_batch(params, k):
            kp, ks = jax.random.split(k)
            prompts = jax.random.randint(kp, (GROUPS,), 0, V - 1)
            prompts = jnp.repeat(prompts, GSIZE)  # groups of identical prompts
            logits = lm.apply({"params": params}, prompts[:, None])[:, -1]
            actions = jax.random.categorical(ks, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(len(prompts)), actions]
            reward = (actions == prompts + 1).astype(jnp.float32)
            gid = jnp.arange(len(prompts)) // GSIZE
            adv = mc_advantage(reward, gid, GROUPS)
            return prompts, actions, logp, adv, reward

        @jax.jit
        def step(params, opt, k):
            prompts, actions, old_logp, adv, reward = sample_batch(params, k)

            def loss_fn(p):
                logits = lm.apply({"params": p}, prompts[:, None])[:, -1]
                logp = jax.nn.log_softmax(logits)[jnp.arange(len(prompts)), actions]
                loss, _ = grpo_loss(
                    logp[:, None], old_logp[:, None], adv,
                    jnp.ones((len(prompts), 1), bool),
                )
                return loss

            g = jax.grad(loss_fn)(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, reward.mean()

        rewards = []
        k = key
        for i in range(150):
            k, kk = jax.random.split(k)
            params, opt, r = step(params, opt, kk)
            rewards.append(float(r))
        early, late = np.mean(rewards[:10]), np.mean(rewards[-10:])
        assert late > early + 0.3, f"GRPO no learning: {early:.2f} -> {late:.2f}"
