"""LLM stack breadth: LLMEnv, KL transforms, tool execution, reward scorers,
policy versioning, top-k selection.

Mirrors the reference LLM env/transform tests (test/llm/)."""
import numpy as np
import pytest

from rl_tpu.data.llm import History, TopKRewardSelector
from rl_tpu.envs.llm import (
    BrowserTransform,
    GSM8KRewardScorer,
    IFEvalScorer,
    KLRewardTransform,
    LLMEnv,
    PolicyVersion,
    PythonInterpreterTransform,
    RetrieveKL,
    extract_gsm8k_answer,
)


class TestLLMEnv:
    def test_text_mode_concat(self):
        env = LLMEnv(dataloader=["Once upon", "The quick"], max_steps=2)
        obs = env.reset()
        assert obs["text"] == "Once upon"
        obs, r, done, _ = env.step(obs, " a time")
        assert obs["text"] == "Once upon a time"
        assert obs["text_response"] == " a time"
        assert not done
        obs, r, done, _ = env.step(obs, " there was")
        assert done  # max_steps

    def test_token_mode_eos_and_attention(self):
        env = LLMEnv(dataloader=[np.array([1, 2, 3])], from_text=False,
                     eos_token_id=0, vocab_size=10)
        obs = env.reset()
        np.testing.assert_array_equal(obs["attention_mask"], [1, 1, 1])
        obs, r, done, _ = env.step(obs, np.array([4, 5]))
        np.testing.assert_array_equal(obs["tokens"], [1, 2, 3, 4, 5])
        assert not done
        obs, r, done, _ = env.step(obs, np.array([6, 0]))
        assert done  # eos seen

    def test_vocab_check(self):
        env = LLMEnv(dataloader=[np.array([1])], from_text=False,
                     vocab_size=5)
        obs = env.reset()
        with pytest.raises(ValueError):
            env.step(obs, np.array([7]))

    def test_dataloader_cycles(self):
        env = LLMEnv(dataloader=["a", "b"])
        assert env.reset()["text"] == "a"
        assert env.reset()["text"] == "b"
        assert env.reset()["text"] == "a"

    def test_assign_reward_and_transform_hook(self):
        kl = KLRewardTransform(coef=0.5, log_prob_key="log_probs",
                               ref_key="ref_log_prob")
        env = LLMEnv(dataloader=[np.array([1])], from_text=False,
                     assign_reward=True, transforms=[])
        obs = env.reset()
        obs, r, done, _ = env.step(obs, np.array([2, 3]))
        np.testing.assert_array_equal(r, np.zeros(2, np.float32))


class TestKL:
    def test_retrieve_kl_k3_nonnegative(self):
        lp = np.log(np.array([[0.5, 0.25]]))
        ref = np.log(np.array([[0.4, 0.3]]))
        out = RetrieveKL()( {"log_probs": lp, "ref_log_prob": ref} )
        assert (out["kl_penalty"] >= 0).all()

    def test_identical_dists_zero_kl(self):
        lp = np.log(np.array([[0.5, 0.25]]))
        out = RetrieveKL()({"log_probs": lp, "ref_log_prob": lp.copy()})
        np.testing.assert_allclose(out["kl_penalty"], 0.0, atol=1e-7)

    def test_kl_reward_scalar_subtracts_sum(self):
        lp = np.zeros((3,))
        ref = np.full((3,), -1.0)
        batch = {"log_probs": lp, "ref_log_prob": ref, "reward": 1.0}
        out = KLRewardTransform(coef=2.0)(batch)
        kl = np.exp(-1.0) + 1.0 - 1.0  # e^d - d - 1, d=-1
        np.testing.assert_allclose(out["reward"], 1.0 - 2.0 * 3 * kl,
                                   rtol=1e-6)

    def test_kl_reward_per_token(self):
        lp = np.zeros((4,))
        ref = np.full((4,), -0.5)
        batch = {"log_probs": lp, "ref_log_prob": ref,
                 "reward": np.ones((4,), np.float32)}
        out = KLRewardTransform(coef=1.0)(batch)
        assert out["reward"].shape == (4,)
        assert (out["reward"] < 1.0).all()

    def test_ref_model_callable(self):
        t = RetrieveKL(ref_model=lambda toks: np.zeros((len(toks),)))
        out = t({"tokens": [1, 2], "log_probs": np.zeros((2,))})
        assert "ref_log_prob" in out

    def test_missing_ref_raises(self):
        with pytest.raises(KeyError):
            RetrieveKL()({"log_probs": np.zeros((2,))})


class TestPolicyVersion:
    def test_int_versioning(self):
        pv = PolicyVersion("int")
        assert pv({"x": 1})["policy_version"] == 0
        pv.increment_version()
        assert pv({"x": 1})["policy_version"] == 1

    def test_uuid_versioning(self):
        pv = PolicyVersion("uuid")
        v0 = pv.version
        v1 = pv.increment_version()
        assert v0 != v1 and isinstance(v1, str)

    def test_bad_type(self):
        with pytest.raises(ValueError):
            PolicyVersion("float")


class TestPythonInterpreter:
    def test_executes_code_block(self):
        h = History().append("user", "compute").append(
            "assistant", "```python\nprint(2 + 3)\n```")
        out = PythonInterpreterTransform()(h)
        assert out.messages[-1].role == "tool"
        assert out.messages[-1].content.strip() == "5"

    def test_no_code_noop(self):
        h = History().append("assistant", "no code here")
        out = PythonInterpreterTransform()(h)
        assert out.messages[-1].content == "no code here"

    def test_error_captured(self):
        h = History().append("assistant", "```python\n1/0\n```")
        out = PythonInterpreterTransform()(h)
        assert "ZeroDivisionError" in out.messages[-1].content

    def test_import_blocked(self):
        h = History().append("assistant", "```python\nimport os\n```")
        out = PythonInterpreterTransform()(h)
        assert "ImportError" in out.messages[-1].content

    def test_allowed_module(self):
        h = History().append(
            "assistant", "```python\nimport math\nprint(math.floor(3.7))\n```")
        out = PythonInterpreterTransform(allowed_modules=("math",))(h)
        assert out.messages[-1].content.strip() == "3"

    def test_output_truncated(self):
        h = History().append(
            "assistant", "```python\nprint('x' * 10000)\n```")
        out = PythonInterpreterTransform(max_output_chars=100)(h)
        assert len(out.messages[-1].content) <= 100


class TestBrowser:
    def test_fetch_via_injected_fetcher(self):
        pages = {"https://a.com": "hello page"}
        h = History().append("assistant", "```browse\nhttps://a.com\n```")
        out = BrowserTransform(pages.__getitem__)(h)
        assert out.messages[-1].content == "hello page"

    def test_scheme_blocked(self):
        h = History().append("assistant", "```browse\nfile:///etc/passwd\n```")
        out = BrowserTransform(lambda u: "x")(h)
        assert "not allowed" in out.messages[-1].content

    def test_fetcher_error_captured(self):
        def boom(u):
            raise ConnectionError("refused")

        h = History().append("assistant", "```browse\nhttps://x.com\n```")
        out = BrowserTransform(boom)(h)
        assert "ConnectionError" in out.messages[-1].content


class TestGSM8K:
    def test_extract_marker(self):
        assert extract_gsm8k_answer("blah #### 1,234") == "1234"

    def test_extract_last_number(self):
        assert extract_gsm8k_answer("2 + 3 is 5") == "5"

    @pytest.mark.parametrize("resp,expected,lo,hi", [
        ("The answer is #### 42", "#### 42", 0.99, 1.01),     # formatted
        ("I think it's 42", "#### 42", 0.85, 0.95),           # unformatted
        ("maybe 41?", "#### 42", 0.05, 0.15),                 # wrong number
        ("no idea", "#### 42", -0.01, 0.01),                  # no number
    ])
    def test_graded(self, resp, expected, lo, hi):
        r = GSM8KRewardScorer()(resp, expected)
        assert lo <= r <= hi


class TestIFEval:
    def test_fraction_satisfied(self):
        s = IFEvalScorer([("contains", {"substring": "hello"}),
                          ("min_words", {"n": 3}),
                          ("max_words", {"n": 5})])
        assert s("hello big wide world") == 1.0
        # "hello": contains ok, min_words fails, max_words ok -> 2/3
        assert abs(s("hello") - 2 / 3) < 1e-9

    def test_bullets_and_json(self):
        s = IFEvalScorer([("num_bullets", {"n": 2})])
        assert s("- a\n- b") == 1.0
        assert s("- a") == 0.0
        s2 = IFEvalScorer([("json_format", {})])
        assert s2('{"a": 1}') == 1.0
        assert s2("not json") == 0.0

    def test_unknown_constraint(self):
        with pytest.raises(ValueError):
            IFEvalScorer([("teleport", {})])


class TestTopKSelector:
    def test_releases_topk_per_prompt(self):
        sel = TopKRewardSelector(total_dialog_turns=4, topk_size=2)
        out = []
        for i in range(8):
            prompt = f"p{i // 4}"
            out += sel({"text": prompt, "reward": float(i % 4)})
        assert len(out) == 4  # 2 groups x top2
        rewards = sorted(x["reward"] for x in out)
        assert rewards == [2.0, 2.0, 3.0, 3.0]

    def test_per_token_rewards_summed(self):
        sel = TopKRewardSelector(total_dialog_turns=2, topk_size=1)
        out = sel([{"text": "p", "reward": np.array([1.0, 1.0])},
                   {"text": "p", "reward": np.array([0.5, 0.1])}])
        assert len(out) == 1
        np.testing.assert_array_equal(out[0]["reward"], [1.0, 1.0])

    def test_flush(self):
        sel = TopKRewardSelector(total_dialog_turns=10, topk_size=1)
        sel({"text": "p", "reward": 1.0})
        sel({"text": "p", "reward": 5.0})
        out = sel.flush()
        assert len(out) == 1 and out[0]["reward"] == 5.0

    def test_bad_sizes(self):
        with pytest.raises(ValueError):
            TopKRewardSelector(2, 3)
