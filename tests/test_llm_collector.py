"""LLM collector layer (VERDICT r2 item #5).

Reference counterparts: ``torchrl/collectors/llm/base.py:26``
(``LLMCollector``) and ``torchrl/collectors/_async_batched.py:118``
(``AsyncBatchedCollector``)."""
import numpy as np
import pytest

from rl_tpu.collectors import AsyncBatchedCollector, LLMCollector
from rl_tpu.envs.llm import ChatEnv


def make_env(max_turns=1, seed=0):
    return ChatEnv(
        ["What is 2+2?", "Name a color.", "Say hi."],
        reward_fn=lambda h, r: float(len(r)) / 10.0,
        max_turns=max_turns,
        seed=seed,
    )


def mock_engine(state):
    prompt = state.messages[-1].content
    text = f"ans:{len(prompt)}"
    tokens = np.arange(len(text)) % 7
    log_probs = -0.1 * np.ones(len(text))
    return text, tokens, log_probs


class TestLLMCollector:
    def test_step_batches(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=4,
                         total_dialog_turns=12, max_tokens=16)
        batches = list(c)
        assert len(batches) == 3
        for b in batches:
            assert len(b) == 4
            s = b[0]
            assert s["tokens"].shape == (16,)
            assert s["log_probs"].shape == (16,)
            assert s["attention_mask"].sum() == len(s["response"])
            assert s["done"]  # single-turn conversations
            assert s["reward"] > 0

    def test_multi_turn_trajectories(self):
        c = LLMCollector(make_env(max_turns=3), mock_engine,
                         yield_completed_trajectories=True,
                         total_dialog_turns=9)
        trajs = list(c)
        assert len(trajs) == 3
        for traj in trajs:
            assert len(traj) == 3
            assert [s["turn"] for s in traj] == [0, 1, 2]
            assert [s["done"] for s in traj] == [False, False, True]
            assert len({s["traj_id"] for s in traj}) == 1

    def test_yield_only_last_steps(self):
        c = LLMCollector(make_env(max_turns=3), mock_engine,
                         yield_only_last_steps=True, total_dialog_turns=9)
        trajs = list(c)
        assert len(trajs) == 3
        for traj in trajs:
            assert len(traj) == 1 and traj[0]["done"] and traj[0]["turn"] == 2

    def test_replay_buffer_sink(self):
        sink = []

        class Buf:
            def extend(self, items):
                sink.extend(items)

        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=2,
                         total_dialog_turns=6, replay_buffer=Buf())
        assert list(c) == []
        assert len(sink) == 6

    def test_policy_version_stamping(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=1,
                         total_dialog_turns=3)
        it = iter(c)
        b0 = next(it)
        c.update_policy_weights_()
        b1 = next(it)
        assert b0[0]["policy_version"] == 0
        assert b1[0]["policy_version"] == 1

    def test_rollout_group_same_prompt(self):
        c = LLMCollector(make_env(), mock_engine, max_tokens=16)
        group = c.rollout_group(group_size=5, idx=1)
        assert len(group) == 5
        assert len({s["prompt"] for s in group}) == 1

    def test_postproc(self):
        c = LLMCollector(make_env(), mock_engine, dialog_turns_per_batch=2,
                         total_dialog_turns=4,
                         postproc=lambda b: [{**s, "tagged": True} for s in b])
        for b in c:
            assert all(s["tagged"] for s in b)


class TestAsyncBatchedCollector:
    def test_out_of_order_completion(self):
        c = AsyncBatchedCollector(
            None, mock_engine, num_workers=3,
            env_factory=lambda: make_env(max_turns=2),
            total_dialog_turns=12)
        trajs = list(c)
        c.async_shutdown()
        # >= because each in-flight worker finishes its conversation
        assert len(trajs) * 2 >= 12
        all_ids = sorted({s["traj_id"] for t in trajs for s in t})
        assert len(all_ids) == len(trajs)  # unique conversation ids

    def test_buffer_sink_and_shutdown(self):
        sink = []

        class Buf:
            def extend(self, items):
                sink.extend(items)

        c = AsyncBatchedCollector(
            None, mock_engine, num_workers=2,
            env_factory=lambda: make_env(max_turns=1),
            total_dialog_turns=8, replay_buffer=Buf())
        c.start()
        import time

        deadline = time.monotonic() + 30
        while len(sink) < 8 and time.monotonic() < deadline:
            time.sleep(0.01)
        c.async_shutdown()
        assert len(sink) >= 8


class TestGRPOEndToEnd:
    def test_chatenv_collector_grpo_two_epochs_with_versions(self):
        """ChatEnv -> LLMCollector -> grpo_loss, >=2 training epochs, with
        policy-version stamping asserted across the weight pushes
        (VERDICT r3 next #9)."""
        import jax
        import jax.numpy as jnp
        import optax

        from rl_tpu.envs.llm import ChatEnv
        from rl_tpu.modules.transformer import TransformerLM
        from rl_tpu.objectives.llm import grpo_loss, mc_advantage

        CHARS = "01+=$_"
        P_LEN, R_LEN, V = 4, 2, 6

        def enc(s):
            return np.asarray([CHARS.index(c) for c in s], np.int32)

        def env_prompt(rng):
            a, b = int(rng.randint(2)), int(rng.randint(2))
            return f"{a}+{b}="

        def reward_fn(history, response):
            # dense per-char reward so GRPO group advantages are nonzero
            # even while the random-init model never matches exactly
            p = next(m.content for m in history.messages if m.role == "user")
            a, b = int(p[0]), int(p[2])
            gold = f"{(a + b) % 2}$"
            n = min(len(response), len(gold))
            return float(np.mean([response[i] == gold[i]
                                  for i in range(n)]) if n else 0.0)

        lm = TransformerLM(vocab_size=V, n_layers=1, d_model=32)
        key = jax.random.PRNGKey(0)
        params = lm.init(key, jnp.zeros((1, P_LEN + R_LEN), jnp.int32))[
            "params"]
        state = {"params": params, "key": key}

        def engine(history):
            prompt = history.messages[-1].content
            toks = jnp.asarray(enc(prompt))[None]
            full = jnp.concatenate(
                [toks, jnp.full((1, R_LEN), CHARS.index("_"), jnp.int32)], 1)
            lps = np.zeros(R_LEN, np.float32)
            for t in range(R_LEN):
                logits = lm.apply({"params": state["params"]}, full)[
                    :, P_LEN + t - 1]
                state["key"], k = jax.random.split(state["key"])
                nxt = jax.random.categorical(k, logits, -1)
                lp = jax.nn.log_softmax(logits, -1)
                lps[t] = float(lp[0, int(nxt[0])])
                full = full.at[:, P_LEN + t].set(nxt)
            resp = np.asarray(full[0, P_LEN:])
            return "".join(CHARS[i] for i in resp), resp, lps

        env = ChatEnv(env_prompt, reward_fn=reward_fn, max_turns=1, seed=0)
        coll = LLMCollector(env, engine, max_tokens=R_LEN)
        coll.on_weights = lambda p: state.update(params=p)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        G, NP = 4, 4
        seen_versions = []
        for epoch in range(2):
            groups = [coll.rollout_group(group_size=G) for _ in range(NP)]
            steps = [s for g in groups for s in g]
            seen_versions.extend(s["policy_version"] for s in steps)
            prompts = [next(m.content for m in s["history"].messages
                            if m.role == "user") for s in steps]
            toks = jnp.asarray(np.stack(
                [np.concatenate([enc(p), s["tokens"]])
                 for p, s in zip(prompts, steps)]))
            rew = jnp.asarray([s["reward"] for s in steps], jnp.float32)
            mask = jnp.asarray(np.stack([s["attention_mask"] for s in steps]))
            old_lp = jnp.asarray(np.stack([s["log_probs"] for s in steps]))
            gid = jnp.repeat(jnp.arange(NP), G)
            adv = mc_advantage(rew, gid, NP)

            def lp_of(q):
                logits = lm.apply({"params": q}, toks)
                lp = jax.nn.log_softmax(logits, -1)
                pos = jnp.arange(R_LEN) + P_LEN - 1
                tgt = jax.lax.dynamic_slice_in_dim(toks, P_LEN, R_LEN, 1)
                return jnp.take_along_axis(
                    lp[:, pos, :], tgt[..., None], -1)[..., 0]

            (l, m), grads = jax.value_and_grad(
                lambda q: grpo_loss(lp_of(q), old_lp, adv, mask),
                has_aux=True)(state["params"])
            assert np.isfinite(float(l))
            updates, opt = tx.update(grads, opt, state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            coll.update_policy_weights_(new_params)

        # epoch-0 rollouts stamped version 0, epoch-1 stamped version 1,
        # and the engine really received the pushed weights
        assert sorted(set(seen_versions)) == [0, 1], seen_versions
        assert seen_versions[: NP * G] == [0] * NP * G
        assert seen_versions[NP * G:] == [1] * NP * G
        assert coll.policy_version == 2
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(params),
                            jax.tree.leaves(state["params"])))
        assert changed, "pushed weights never reached the engine"

