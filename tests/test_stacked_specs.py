"""Ragged/heterogeneous stacked specs: pad+mask semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import Bounded, Categorical, Composite, Unbounded
from rl_tpu.data.stacked_specs import Stacked, StackedComposite


class TestStacked:
    def test_homogeneous(self, key):
        s = Stacked(Unbounded((3,)), Unbounded((3,)))
        assert s.shape == (2, 3)
        v = s.rand(key)
        assert v.shape == (2, 3)
        assert s.is_in(v)
        assert bool(s.mask().all())

    def test_ragged_padding(self, key):
        s = Stacked(Bounded(-1, 1, (3,)), Bounded(-1, 1, (5,)))
        assert s.shape == (2, 5)
        v = s.rand(key)
        assert v.shape == (2, 5)
        # padded region of the smaller spec is zero
        np.testing.assert_array_equal(np.asarray(v[0, 3:]), 0.0)
        assert s.is_in(v)

    def test_mask_marks_valid(self):
        s = Stacked(Unbounded((3,)), Unbounded((5,)))
        m = np.asarray(s.mask())
        np.testing.assert_array_equal(m[0], [1, 1, 1, 0, 0])
        np.testing.assert_array_equal(m[1], [1, 1, 1, 1, 1])

    def test_is_in_checks_valid_region_only(self, key):
        s = Stacked(Bounded(0, 1, (2,)), Bounded(0, 1, (4,)))
        v = s.rand(key)
        # corrupting the PAD region doesn't affect membership
        v_pad = v.at[0, 3].set(99.0)
        assert s.is_in(v_pad)
        # corrupting a VALID region does
        v_bad = v.at[0, 0].set(99.0)
        assert not s.is_in(v_bad)

    def test_batched_rand(self, key):
        s = Stacked(Unbounded((3,)), Unbounded((5,)))
        v = s.rand(key, (7,))
        assert v.shape == (7, 2, 5)
        assert s.is_in(v)


class TestStackedComposite:
    def make(self):
        a = Composite(observation=Unbounded((3,)), action=Categorical(2))
        b = Composite(observation=Unbounded((5,)), action=Categorical(2),
                      extra=Unbounded((2,)))
        return StackedComposite(a, b)

    def test_union_of_keys(self):
        sc = self.make()
        keys = {k for k in sc.keys()}
        assert ("observation",) in keys and ("extra",) in keys

    def test_rand_with_masks(self, key):
        sc = self.make()
        td = sc.rand(key)
        assert td["observation"].shape == (2, 5)
        m = np.asarray(td["masks", "observation"])
        np.testing.assert_array_equal(m[0], [1, 1, 1, 0, 0])
        assert sc.is_in(td)

    def test_missing_key_padded(self, key):
        sc = self.make()
        td = sc.rand(key)
        # agent 0 has no "extra": its mask row marks only the scalar pad slot
        m = np.asarray(td["masks", "extra"])
        assert m[1].sum() == 2  # agent 1's true (2,) region
        assert m[0].sum() <= 1  # agent 0 contributes at most a unit slot
