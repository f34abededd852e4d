"""TDict container tests (the TensorDict replacement)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_tpu.data import TDict


def make_td():
    return TDict(
        {
            "obs": jnp.arange(12.0).reshape(4, 3),
            "action": jnp.ones((4, 2)),
            "next": {"reward": jnp.full((4, 1), 2.0), "done": jnp.zeros((4, 1), bool)},
        }
    )


class TestBasics:
    def test_get_flat_and_nested(self):
        td = make_td()
        assert td["obs"].shape == (4, 3)
        assert td["next", "reward"].shape == (4, 1)
        assert td["next"]["done"].dtype == jnp.bool_

    def test_missing_key_raises(self):
        td = make_td()
        with pytest.raises(KeyError):
            td["nope"]
        with pytest.raises(KeyError):
            td["next", "nope"]
        assert td.get("nope", None) is None

    def test_set_returns_new(self):
        td = make_td()
        td2 = td.set(("next", "terminated"), jnp.ones((4, 1), bool))
        assert ("next", "terminated") not in td
        assert td2["next", "terminated"].all()
        # original subtree untouched
        assert td2["next", "reward"] is td["next", "reward"]

    def test_immutable(self):
        td = make_td()
        with pytest.raises(AttributeError):
            td.foo = 1

    def test_contains(self):
        td = make_td()
        assert "obs" in td
        assert ("next", "reward") in td
        assert ("next", "nope") not in td

    def test_keys_nested(self):
        td = make_td()
        leaves = set(td.keys(include_nested=True, leaves_only=True))
        assert leaves == {"obs", "action", ("next", "reward"), ("next", "done")}

    def test_update_merges_recursively(self):
        td = make_td()
        other = TDict({"next": {"terminated": jnp.zeros((4, 1), bool)}, "extra": jnp.ones(4)})
        td2 = td.update(other)
        assert ("next", "reward") in td2  # preserved
        assert ("next", "terminated") in td2
        assert "extra" in td2

    def test_exclude_select(self):
        td = make_td()
        assert "obs" not in td.exclude("obs")
        assert ("next", "reward") not in td.exclude(("next", "reward"))
        sel = td.select("obs", ("next", "done"))
        assert set(sel.keys(True, True)) == {"obs", ("next", "done")}
        with pytest.raises(KeyError):
            td.select("nope")
        assert td.select("nope", strict=False).is_empty()

    def test_flatten_unflatten_keys(self):
        td = make_td()
        flat = td.flatten_keys()
        assert "next.reward" in flat
        rt = flat.unflatten_keys()
        assert ("next", "reward") in rt

    def test_rename(self):
        td = make_td().rename_key("obs", "observation")
        assert "observation" in td and "obs" not in td


class TestBatchOps:
    def test_int_index(self):
        td = make_td()
        row = td[0]
        assert row["obs"].shape == (3,)
        assert row["next", "reward"].shape == (1,)

    def test_slice_and_array_index(self):
        td = make_td()
        assert td[1:3]["obs"].shape == (2, 3)
        idx = jnp.array([0, 2])
        assert td[idx]["action"].shape == (2, 2)

    def test_stack_cat(self):
        td = make_td()
        st = TDict.stack([td, td])
        assert st["obs"].shape == (2, 4, 3)
        ct = TDict.cat([td, td])
        assert ct["obs"].shape == (8, 3)

    def test_common_shape(self):
        td = make_td()
        assert td.common_shape() == (4,)

    def test_reshape_batch(self):
        td = TDict({"x": jnp.zeros((6, 3)), "y": jnp.zeros((6,))})
        r = td.reshape_batch(1, (2, 3))
        assert r["x"].shape == (2, 3, 3)
        assert r["y"].shape == (2, 3)


class TestPytree:
    def test_jit_through(self):
        td = make_td()

        @jax.jit
        def f(t):
            return t.set("obs", t["obs"] * 2)

        out = f(td)
        np.testing.assert_allclose(out["obs"], np.asarray(td["obs"]) * 2)

    def test_scan_carry(self):
        td = TDict({"count": jnp.zeros(()), "nested": {"v": jnp.ones(3)}})

        def body(carry, _):
            carry = carry.set("count", carry["count"] + 1)
            return carry, carry["count"]

        out, ys = jax.lax.scan(body, td, None, length=5)
        assert out["count"] == 5
        assert ys.shape == (5,)

    def test_vmap(self):
        td = make_td()
        f = jax.vmap(lambda t: t["obs"].sum() + t["next", "reward"].sum())
        assert f(td).shape == (4,)

    def test_tree_map_preserves_structure(self):
        td = make_td()
        doubled = jax.tree.map(lambda x: x * 2, td)
        assert isinstance(doubled, TDict)
        assert set(doubled.keys(True, True)) == set(td.keys(True, True))

    def test_key_path(self):
        td = make_td()
        flat, _ = jax.tree_util.tree_flatten_with_path(td)
        paths = {jax.tree_util.keystr(p) for p, _ in flat}
        assert "['next']['reward']" in paths


class TestPickle:
    def test_roundtrip(self):
        import pickle

        td = TDict(a=jnp.ones((2,)), nested=TDict(b=jnp.zeros((3,))))
        out = pickle.loads(pickle.dumps(jax.device_get(td)))
        assert np.asarray(out["a"]).shape == (2,)
        assert np.asarray(out["nested", "b"]).shape == (3,)
