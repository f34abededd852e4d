"""VLA stack: containers, tokenizers, TinyVLA, ToyVLAEnv, tokenizer transform."""
import jax
import jax.numpy as jnp
import pytest

from rl_tpu.data import (
    TDict,
    UniformActionTokenizer,
    VLAAction,
    VLAImages,
    VLAObservation,
    VocabTailActionTokenizer,
)
from rl_tpu.envs import ToyVLAEnv, check_env_specs
from rl_tpu.envs.transforms import ActionTokenizerTransform
from rl_tpu.modules import TinyVLA, hash_instruction


class TestTokenizers:
    def test_uniform_roundtrip(self):
        tok = UniformActionTokenizer(256, low=-1.0, high=1.0)
        a = jnp.array([-1.0, -0.3, 0.0, 0.7, 1.0])
        t = tok.encode(a)
        assert int(t[0]) == 0 and int(t[-1]) == 255
        # round-trip error bounded by half a bin width
        assert jnp.max(jnp.abs(tok.decode(t) - a)) <= 1.0 / 256

    def test_vocab_tail(self):
        tok = VocabTailActionTokenizer(256, vocab_size=32000, low=-1.0,
                                       high=1.0)
        a = jnp.array([0.0])
        t = tok.encode(a)
        assert int(t[0]) >= 32000 - 256  # lands in the vocab tail
        assert tok.vocab_size == 32000
        assert jnp.abs(tok.decode(t) - a)[0] <= 1.0 / 256

    def test_per_dim_bounds(self):
        tok = UniformActionTokenizer(
            10, low=jnp.array([0.0, -2.0]), high=jnp.array([1.0, 2.0])
        )
        a = jnp.array([[0.5, 0.0]])
        d = tok.decode(tok.encode(a))
        assert jnp.max(jnp.abs(d - a)) <= 0.21

    def test_containers(self):
        obs = VLAObservation(
            images=VLAImages(image=jnp.zeros((2, 8, 8, 3))),
            state=jnp.zeros((2, 5)),
        )
        assert obs["images", "image"].shape == (2, 8, 8, 3)
        act = VLAAction(chunk=jnp.zeros((2, 4, 7)))
        assert act["chunk"].shape == (2, 4, 7)


class TestTinyVLA:
    def test_continuous_head(self, key):
        m = TinyVLA(action_dim=3, chunk_size=4, hidden_dim=32)
        img = jnp.zeros((2, 16, 16, 3), jnp.uint8)
        st = jnp.zeros((2, 6))
        idx = jnp.array([hash_instruction("pick"), hash_instruction("place")])
        params = m.init(key, img, st, idx)["params"]
        out = m.apply({"params": params}, img, st, idx)
        assert out.shape == (2, 4, 3)
        assert jnp.all(jnp.abs(out) <= 1.0)

    def test_token_head(self, key):
        m = TinyVLA(action_dim=2, chunk_size=3, action_head="tokens",
                    vocab_size=16, hidden_dim=32)
        img = jnp.zeros((2, 16, 16, 3), jnp.uint8)
        params = m.init(key, img)["params"]
        logits = m.apply({"params": params}, img)
        assert logits.shape == (2, 3, 2, 16)

    def test_language_conditioning(self, key):
        m = TinyVLA(action_dim=2, chunk_size=1, hidden_dim=32)
        img = jnp.zeros((1, 16, 16, 3), jnp.uint8)
        st = jnp.zeros((1, 4))
        i1 = jnp.array([hash_instruction("pick up the red block")])
        i2 = jnp.array([hash_instruction("open the drawer")])
        params = m.init(key, img, st, i1)["params"]
        o1 = m.apply({"params": params}, img, st, i1)
        o2 = m.apply({"params": params}, img, st, i2)
        assert not jnp.allclose(o1, o2)  # genuinely language-conditioned


class TestToyVLAEnv:
    def test_specs_echo(self, key):
        check_env_specs(ToyVLAEnv(action_dim=2, state_dim=4), key=key)

    def test_state_echoes_action(self, key):
        env = ToyVLAEnv(action_dim=2, state_dim=4)
        state, _ = env._reset(key)
        a = jnp.array([0.3, -0.4])
        state, out = env._step(state, TDict(action=a), key)
        assert jnp.allclose(out["state"][:2], a)
        assert float(out["reward"][0]) == pytest.approx(
            -float(jnp.linalg.norm(a)), abs=1e-5
        )

    def test_tracking_mode_success(self, key):
        env = ToyVLAEnv(action_dim=2, state_dim=4, success_steps=2,
                        success_tol=0.1)
        state, obs = env._reset(key)
        target = obs["state"][2:4]
        # oracle: play the target exactly; success after 2 consecutive hits
        state, out = env._step(state, TDict(action=target), key)
        assert not bool(out["success"][0])
        state, out = env._step(state, TDict(action=target), key)
        assert bool(out["success"][0])
        assert bool(out["terminated"][0])

    def test_tracking_miss_resets_counter(self, key):
        env = ToyVLAEnv(action_dim=2, state_dim=4, success_steps=2,
                        success_tol=0.05)
        state, obs = env._reset(key)
        target = obs["state"][2:4]
        state, out = env._step(state, TDict(action=target), key)
        # a miss zeroes the consecutive-hit counter
        state, out = env._step(
            state, TDict(action=jnp.clip(target + 0.5, -1, 1)), key
        )
        state, out = env._step(state, TDict(action=target), key)
        assert not bool(out["success"][0])


class TestActionTokenizerTransform:
    def test_encode_mode(self):
        tok = UniformActionTokenizer(16, low=-1.0, high=1.0)
        tr = ActionTokenizerTransform(tok)
        td = TDict(action=jnp.array([0.5, -0.5]))
        _, out = tr.step(TDict(), td)
        assert ("vla_action", "tokens") in out
        # inverse: policy-emitted tokens decode back to env actions
        td2 = TDict({("vla_action", "tokens"): out["vla_action", "tokens"]})
        dec = tr.inv(TDict(), td2)
        assert jnp.max(jnp.abs(dec["action"] - td["action"])) <= 1.0 / 16

    def test_decode_mode(self):
        tok = UniformActionTokenizer(16, low=-1.0, high=1.0)
        tr = ActionTokenizerTransform(tok, mode="decode")
        td = TDict({("vla_action", "tokens"): jnp.array([0, 15])})
        _, out = tr.step(TDict(), td)
        assert "action" in out
        assert float(out["action"][0]) < 0 < float(out["action"][1])
