"""Spec system tests (port of reference test_specs.py patterns)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import (
    Binary,
    Bounded,
    Categorical,
    Choice,
    Composite,
    MultiCategorical,
    MultiOneHot,
    NonTensor,
    OneHot,
    TDict,
    Unbounded,
    make_composite_from_td,
    consolidate_spec,
)

ALL_LEAF_SPECS = [
    Bounded(-1.0, 1.0, (3,)),
    Bounded(0, 5, (2, 2), dtype=jnp.int32),
    Unbounded((4,)),
    Unbounded((2,), dtype=jnp.int32),
    Categorical(7),
    Categorical(4, (2,)),
    MultiCategorical([3, 4, 5]),
    OneHot(5),
    MultiOneHot([2, 3]),
    Binary(4),
]


@pytest.mark.parametrize("spec", ALL_LEAF_SPECS, ids=lambda s: repr(s))
class TestLeafSpecContract:
    def test_rand_is_in(self, spec, key):
        sample = spec.rand(key)
        assert sample.shape == spec.shape
        assert spec.is_in(sample), f"{spec}: rand sample not in spec"

    def test_rand_batched(self, spec, key):
        sample = spec.rand(key, (10,))
        assert sample.shape == (10,) + spec.shape
        assert spec.is_in(sample)

    def test_zero_one(self, spec, key):
        z = spec.zero((2,))
        assert z.shape == (2,) + spec.shape
        assert not jnp.any(jnp.asarray(z, jnp.float32) != 0)

    def test_project_idempotent_on_valid(self, spec, key):
        sample = spec.rand(key)
        proj = spec.project(sample)
        np.testing.assert_array_equal(np.asarray(proj), np.asarray(sample))

    def test_project_fixes_invalid(self, spec, key):
        bad = jnp.asarray(spec.rand(key), jnp.float32) * 1e6
        fixed = spec.project(bad.astype(spec.dtype) if spec.dtype != jnp.bool_ else bad > 0)
        assert spec.is_in(fixed)

    def test_expand(self, spec, key):
        ex = spec.expand(5)
        assert ex.shape == (5,) + spec.shape
        assert ex.is_in(ex.rand(key))

    def test_rand_jittable(self, spec, key):
        jitted = jax.jit(spec.rand)
        assert spec.is_in(jitted(key))


class TestSpecificDomains:
    def test_bounded_limits(self, key):
        spec = Bounded(2.0, 3.0, (100,))
        s = spec.rand(key)
        assert float(s.min()) >= 2.0 and float(s.max()) <= 3.0
        assert not spec.is_in(jnp.full((100,), 5.0))

    def test_categorical_range(self, key):
        spec = Categorical(3)
        assert not spec.is_in(jnp.array(3))
        assert spec.is_in(jnp.array(2))
        assert int(spec.project(jnp.array(7))) == 2

    def test_onehot_project_and_encode(self):
        spec = OneHot(4)
        proj = spec.project(jnp.array([0.1, 3.0, 0.2, 0.1]))
        assert spec.is_in(proj) and int(jnp.argmax(proj)) == 1
        enc = spec.encode(jnp.array(2))
        assert spec.is_in(enc) and int(jnp.argmax(enc)) == 2

    def test_onehot_categorical_roundtrip(self, key):
        oh = OneHot(6)
        cat = oh.to_categorical_spec()
        assert cat.n == 6
        assert cat.to_one_hot_spec().n == 6

    def test_multionehot_groups(self, key):
        spec = MultiOneHot([2, 3])
        s = spec.rand(key)
        assert s.shape == (5,)
        assert int(jnp.asarray(s[:2], jnp.int32).sum()) == 1
        assert int(jnp.asarray(s[2:], jnp.int32).sum()) == 1

    def test_choice(self, key):
        spec = Choice([Bounded(0, 1, (2,)), Bounded(5, 6, (2,))])
        assert spec.is_in(spec.rand(key))

    def test_nontensor(self):
        spec = NonTensor(example="hello")
        assert spec.rand() == "hello"
        assert spec.is_in("anything")


class TestComposite:
    def make(self):
        return Composite(
            {
                "observation": Bounded(-1, 1, (3,)),
                "nested": {"state": Unbounded((2,))},
            },
            action=Categorical(4),
        )

    def test_access(self):
        c = self.make()
        assert c["observation"].shape == (3,)
        assert c["nested", "state"].shape == (2,)
        assert ("nested", "state") in c

    def test_rand_returns_tdict(self, key):
        c = self.make()
        td = c.rand(key, (5,))
        assert isinstance(td, TDict)
        assert td["observation"].shape == (5, 3)
        assert td["nested", "state"].shape == (5, 2)
        assert c.is_in(td[0])

    def test_zero(self):
        c = self.make()
        td = c.zero((2,))
        assert td["action"].shape == (2,)

    def test_is_in_rejects_out_of_domain(self, key):
        c = self.make()
        td = c.rand(key)
        bad = td.set("observation", jnp.full((3,), 9.0))
        assert not c.is_in(bad)

    def test_project(self, key):
        c = self.make()
        td = c.rand(key).set("observation", jnp.full((3,), 9.0))
        assert c.is_in(c.project(td))

    def test_expand(self, key):
        c = self.make().expand(4)
        td = c.rand(key)
        assert td["observation"].shape == (4, 3)

    def test_update_clone_exclude(self):
        c = self.make()
        c2 = c.clone()
        c2.update(Composite({"extra": Unbounded(())}))
        assert "extra" in c2 and "extra" not in c
        c3 = c2.exclude("extra", ("nested", "state"))
        assert "extra" not in c3
        assert ("nested", "state") not in c3

    def test_eq(self):
        assert self.make() == self.make()
        other = self.make()
        other["action"] = Categorical(5)
        assert self.make() != other

    def test_make_composite_from_td(self, key):
        td = TDict({"a": jnp.zeros((3,)), "n": {"b": jnp.zeros((2,), jnp.int32)}})
        c = make_composite_from_td(td)
        assert c["a"].shape == (3,)
        assert c["n", "b"].dtype == jnp.int32
        assert c.is_in(td)

    def test_consolidate_spec(self):
        a = Composite({"x": Unbounded((3,))})
        b = Composite({"x": Unbounded((5,)), "y": Unbounded(())})
        c = consolidate_spec([a, b])
        assert c["x"].shape == (5,)
        assert "y" in c
