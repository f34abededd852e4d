"""Property tests: the trajectory query DSL vs a pandas oracle
(VERDICT r4 next #10 — reference replay_buffers/query.py:29,157)."""
import numpy as np
import pandas as pd
import pytest

from rl_tpu.data import TDict
from rl_tpu.data.query import field, query_trajectories, trajectory_metadata

RNG = np.random.RandomState(0)


def random_meta(n=64):
    return TDict(
        length=RNG.randint(1, 200, n).astype(np.int32),
        episode_return=RNG.randn(n).astype(np.float32) * 100,
        mean_reward=RNG.randn(n).astype(np.float32),
        terminated=RNG.rand(n) < 0.5,
    )


def as_df(meta):
    return pd.DataFrame({k: np.asarray(v) for k, v in meta.items()})


OPS = [
    (lambda f, v: f > v, lambda s, v: s > v),
    (lambda f, v: f >= v, lambda s, v: s >= v),
    (lambda f, v: f < v, lambda s, v: s < v),
    (lambda f, v: f <= v, lambda s, v: s <= v),
    (lambda f, v: f == v, lambda s, v: s == v),
    (lambda f, v: f != v, lambda s, v: s != v),
]


class TestQueryVsPandasOracle:
    @pytest.mark.parametrize("op_i", range(len(OPS)))
    @pytest.mark.parametrize("col", ["length", "episode_return",
                                     "mean_reward"])
    def test_single_predicate(self, op_i, col):
        dsl_op, pd_op = OPS[op_i]
        meta, df = random_meta(), None
        df = as_df(meta)
        thresh = float(np.median(df[col]))
        got = np.asarray(query_trajectories(meta, dsl_op(field(col), thresh)))
        want = df.index[pd_op(df[col], thresh)].to_numpy()
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("trial", range(20))
    def test_random_composite(self, trial):
        """Random 2-3 clause and/or/not compositions match pandas."""
        rng = np.random.RandomState(100 + trial)
        meta = random_meta()
        df = as_df(meta)

        def rand_clause():
            col = rng.choice(["length", "episode_return", "mean_reward"])
            i = rng.randint(len(OPS))
            v = float(np.percentile(df[col], rng.randint(10, 91)))
            return OPS[i][0](field(col), v), OPS[i][1](df[col], v)

        q, m = rand_clause()
        for _ in range(rng.randint(1, 3)):
            q2, m2 = rand_clause()
            if rng.rand() < 0.5:
                q, m = q & q2, m & m2
            else:
                q, m = q | q2, m | m2
        if rng.rand() < 0.3:
            q, m = ~q, ~m
        got = np.asarray(query_trajectories(meta, q))
        np.testing.assert_array_equal(got, df.index[m].to_numpy())

    def test_field_vs_field(self):
        meta = random_meta()
        df = as_df(meta)
        got = np.asarray(query_trajectories(
            meta, field("episode_return") > field("mean_reward")))
        want = df.index[df.episode_return > df.mean_reward].to_numpy()
        np.testing.assert_array_equal(got, want)

    def test_metadata_matches_pandas_groupwise(self):
        """trajectory_metadata's masked stats vs pandas on the unpadded
        rows."""
        B, T = 8, 20
        rng = np.random.RandomState(3)
        lengths = rng.randint(1, T + 1, B)
        mask = np.arange(T)[None, :] < lengths[:, None]
        r = rng.randn(B, T, 1).astype(np.float32)
        term = np.zeros((B, T, 1), bool)
        term[np.arange(B), lengths - 1, 0] = rng.rand(B) < 0.5
        trajs = TDict({"mask": mask, ("next", "reward"): r,
                       ("next", "terminated"): term})
        meta = trajectory_metadata(trajs)
        rows = []
        for b in range(B):
            rr = r[b, : lengths[b], 0]
            rows.append(dict(length=lengths[b], episode_return=rr.sum(),
                             mean_reward=rr.mean(),
                             terminated=bool(term[b, : lengths[b]].any())))
        df = pd.DataFrame(rows)
        np.testing.assert_array_equal(np.asarray(meta["length"]), df.length)
        np.testing.assert_allclose(np.asarray(meta["episode_return"]),
                                   df.episode_return, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(meta["mean_reward"]),
                                   df.mean_reward, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(meta["terminated"]),
                                      df.terminated)
