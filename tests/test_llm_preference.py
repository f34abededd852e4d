"""Preference-learning stack: PairwiseDataset, KL controllers,
Bradley-Terry reward-model loss, DPO loss.

Reference behavior: /root/reference/torchrl/data/llm/reward.py (pairwise
data), data/llm/utils.py:35,70 (KL controllers).  The RM/DPO learning tests
train tiny models end-to-end on a synthetic preference rule and assert the
ranking is learned.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rl_tpu.data.llm import (
    AdaptiveKLController,
    ConstantKLController,
    PairwiseDataset,
    tokenize_batch,
)
from rl_tpu.objectives.llm import dpo_loss, preference_loss


def char_tok(t):
    return [ord(c) % 31 for c in t]


class TestPairwiseDataset:
    rows = [{"prompt": "q1", "chosen": "good", "rejected": "bad"},
            {"prompt": "q2", "chosen": "yes", "rejected": "no"}]

    def test_validation(self):
        with pytest.raises(ValueError):
            PairwiseDataset([{"prompt": "p", "chosen": "c"}])

    def test_tokenize_shapes(self):
        ds = PairwiseDataset(self.rows)
        b = ds.tokenize(char_tok, 8)
        assert b["chosen_tokens"].shape == (2, 8)
        assert b["rejected_mask"].dtype == bool
        # prompt+completion concatenated, right padded
        assert b["chosen_mask"][0].sum() == len("q1good")

    def test_truncation(self):
        ids, mask = tokenize_batch(["abcdefgh"], char_tok, 4)
        assert ids.shape == (1, 4) and mask.all()

    def test_jsonl_round_trip(self, tmp_path):
        import json
        p = tmp_path / "prefs.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in self.rows))
        ds = PairwiseDataset.from_jsonl(p)
        assert len(ds) == 2 and ds[1]["chosen"] == "yes"

    def test_batches_shuffled_and_full(self):
        ds = PairwiseDataset(self.rows * 5)  # 10 rows
        batches = list(ds.batches(4, seed=0))
        assert len(batches) == 2 and all(len(b) == 4 for b in batches)


class TestKLControllers:
    def test_constant_reasserts(self):
        class T:
            coef = None
        t = T()
        c = ConstantKLController(coef=0.2, transform=t)
        t.coef = 999.0
        assert c.update() == 0.2 and t.coef == 0.2

    def test_adaptive_direction(self):
        up = AdaptiveKLController(init_coef=0.1, target=1.0, horizon=10)
        assert up.update([5.0] * 5) > 0.1      # KL above target -> tighten
        down = AdaptiveKLController(init_coef=0.1, target=1.0, horizon=10)
        assert down.update([0.0] * 5) < 0.1    # below target -> relax

    def test_adaptive_error_clipped(self):
        c = AdaptiveKLController(init_coef=1.0, target=1.0, horizon=10)
        # huge KL: proportional error clips at +0.2 -> coef *= 1 + 0.2*5/10
        assert c.update([1e6] * 5) == pytest.approx(1.1)

    def test_adaptive_pushes_to_transform(self):
        class T:
            coef = None
        t = T()
        c = AdaptiveKLController(init_coef=0.5, target=1.0, horizon=10,
                                 transform=t)
        assert t.coef == 0.5
        c.update([2.0])
        assert t.coef == c.coef != 0.5

    def test_adaptive_validates(self):
        with pytest.raises(ValueError):
            AdaptiveKLController(init_coef=0.1, target=0.0, horizon=10)
        c = AdaptiveKLController(init_coef=0.1, target=1.0, horizon=10)
        with pytest.raises(ValueError):
            c.update([])


def test_reward_model_learns_ranking():
    """Tiny bag-of-tokens reward model on a synthetic rule (chosen contains
    token 7) reaches >0.9 pair accuracy via preference_loss."""
    rng = np.random.RandomState(0)
    V, L, N = 16, 8, 128

    def make_pair():
        base = rng.randint(1, V, size=L)
        chosen = base.copy(); chosen[rng.randint(L)] = 7
        rejected = base.copy(); rejected[rejected == 7] = 1
        return chosen, rejected

    pairs = [make_pair() for _ in range(N)]
    c_ids = jnp.asarray(np.stack([p[0] for p in pairs]))
    r_ids = jnp.asarray(np.stack([p[1] for p in pairs]))

    emb = jax.random.normal(jax.random.PRNGKey(0), (V,)) * 0.01

    def score(w, ids):
        return w[ids].sum(-1)

    tx = optax.adam(1e-1)
    opt = tx.init(emb)

    @jax.jit
    def step(w, opt):
        def total(w):
            return preference_loss(score(w, c_ids), score(w, r_ids))
        (l, acc), g = jax.value_and_grad(total, has_aux=True)(w)
        u, opt = tx.update(g, opt, w)
        return optax.apply_updates(w, u), opt, acc

    acc = 0.0
    for _ in range(60):
        emb, opt, acc = step(emb, opt)
    assert float(acc) > 0.9


def test_dpo_loss_properties():
    # preferring chosen lowers the loss; beta scales the margin
    lo, _ = dpo_loss(jnp.array([-1.0]), jnp.array([-9.0]),
                     jnp.array([-3.0]), jnp.array([-3.0]))
    hi, _ = dpo_loss(jnp.array([-9.0]), jnp.array([-1.0]),
                     jnp.array([-3.0]), jnp.array([-3.0]))
    assert float(lo) < float(np.log(2)) < float(hi)
    # symmetric start: loss = log 2, accuracy counts margin>0
    mid, m = dpo_loss(jnp.array([-2.0]), jnp.array([-2.0]),
                      jnp.array([-2.0]), jnp.array([-2.0]))
    assert float(mid) == pytest.approx(np.log(2), rel=1e-5)
    assert float(m["accuracy"]) == 0.0


def test_dpo_learns_preference():
    """Logits-as-params toy: DPO pushes policy seq log-probs of chosen above
    rejected while staying anchored to the reference."""
    key = jax.random.PRNGKey(1)
    n = 32
    ref_c = jax.random.normal(key, (n,)) - 4.0
    ref_r = jax.random.normal(jax.random.fold_in(key, 1), (n,)) - 4.0
    params = jnp.zeros((2, n))  # additive offsets to ref log-probs

    tx = optax.adam(5e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt):
        def total(p):
            l, m = dpo_loss(ref_c + p[0], ref_r + p[1], ref_c, ref_r,
                            beta=0.5)
            return l, m
        (l, m), g = jax.value_and_grad(total, has_aux=True)(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), opt, m

    for _ in range(100):
        params, opt, m = step(params, opt)
    assert float(m["accuracy"]) == 1.0
    assert float(m["reward_chosen"]) > 0 > float(m["reward_rejected"])
