"""Native host segment tree tests (vs numpy reference semantics)."""
import numpy as np
import pytest

pytest.importorskip("ctypes")

from rl_tpu.data.replay.host_segment_tree import (
    MinSegmentTreeFp32,
    MinSegmentTreeFp64,
    SumSegmentTreeFp32,
    SumSegmentTreeFp64,
)


@pytest.mark.parametrize("cls", [SumSegmentTreeFp32, SumSegmentTreeFp64],
                         ids=["f32", "f64"])
class TestSumTree:
    def test_update_get_total(self, cls):
        t = cls(10)
        t[3] = 5.0
        t[7] = 2.0
        assert t[3] == 5.0
        assert t.total() == 7.0

    def test_batch_update(self, cls):
        t = cls(100)
        idx = np.arange(0, 100, 7)
        vals = np.arange(len(idx), dtype=np.float64) + 1
        t[idx] = vals
        np.testing.assert_allclose(t[idx], vals)
        assert abs(t.total() - vals.sum()) < 1e-4

    def test_query_ranges(self, cls):
        t = cls(16)
        vals = np.arange(16, dtype=np.float64)
        t[np.arange(16)] = vals
        for l, r in [(0, 16), (3, 9), (5, 6), (0, 1), (15, 16)]:
            assert abs(t.query(l, r) - vals[l:r].sum()) < 1e-4

    def test_scan_lower_bound_matches_searchsorted(self, cls):
        rng = np.random.RandomState(0)
        n = 64
        t = cls(n)
        p = rng.rand(n).astype(np.float64)
        t[np.arange(n)] = p
        cdf = np.cumsum(p)
        us = rng.rand(100) * cdf[-1]
        got = t.scan_lower_bound(us.astype(np.float64))
        expected = np.searchsorted(cdf, us, side="right")
        expected = np.clip(expected, 0, n - 1)
        np.testing.assert_array_equal(got, expected)

    def test_inverse_cdf_sampling_distribution(self, cls):
        t = cls(4)
        t[np.arange(4)] = np.array([1.0, 1.0, 1.0, 97.0])
        us = np.random.RandomState(1).rand(20000) * t.total()
        idx = t.scan_lower_bound(us)
        assert abs((idx == 3).mean() - 0.97) < 0.01

    def test_capacity_not_power_of_two(self, cls):
        t = cls(10)
        t[np.arange(10)] = np.ones(10)
        assert abs(t.total() - 10) < 1e-5
        assert t.scan_lower_bound(9.5) == 9


@pytest.mark.parametrize("cls", [MinSegmentTreeFp32, MinSegmentTreeFp64],
                         ids=["f32", "f64"])
class TestMinTree:
    def test_min_query(self, cls):
        t = cls(8)
        vals = np.array([5, 3, 8, 1, 9, 2, 7, 4], dtype=np.float64)
        t[np.arange(8)] = vals
        assert t.total() == 1.0
        assert t.query(0, 3) == 3.0
        assert t.query(4, 8) == 2.0

    def test_update_changes_min(self, cls):
        t = cls(4)
        t[np.arange(4)] = np.array([4.0, 3.0, 2.0, 1.0])
        assert t.total() == 1.0
        t[3] = 10.0
        assert t.total() == 2.0


class TestHostPrioritizedSampler:
    def test_proportional_sampling(self):
        from rl_tpu.data.replay.samplers import HostPrioritizedSampler

        s = HostPrioritizedSampler(8, alpha=1.0, beta=1.0)
        s.extend(None, np.arange(4))
        s.update_priority(None, np.arange(4), np.array([1.0, 1.0, 1.0, 97.0]))
        rng = np.random.RandomState(0)
        _, idx, info = s.sample(None, 4, 10000, rng=rng)
        assert abs((idx == 3).mean() - 0.97) < 0.01
        w = info["_weight"]
        # rarest item has weight 1 (normalized by min-prob item)
        np.testing.assert_allclose(w[idx != 3].max(), 1.0, rtol=1e-4)

    def test_new_items_max_priority(self):
        from rl_tpu.data.replay.samplers import HostPrioritizedSampler

        s = HostPrioritizedSampler(8)
        s.extend(None, np.arange(2))
        s.update_priority(None, [0], [50.0])
        s.extend(None, [2])
        # item 2 seeded with current max priority (50)
        assert s._sum_tree[2] == pytest.approx((50.0 + s.eps) ** s.alpha, rel=1e-3)
