"""Benchmarks-as-tests (VERDICT r2 item #6).

Mirrors the reference's continuously-tracked micro-benchmarks
(``benchmarks/test_collectors_benchmark.py:340-377``,
``test_replaybuffer_benchmark.py``, ``test_objectives_benchmarks.py``):
every hot path is timed against a committed baseline
(``benchmarks/baselines.json``) and fails on structural slowdowns.

The tolerance is deliberately loose (6x): shared CI boxes are noisy, and
the guard exists to catch order-of-magnitude regressions — a replay
retrace, an accidental O(capacity^2) sampler, a lost buffer donation —
not 20% jitter.  Refresh after intentional changes::

    python benchmarks/micro.py update
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import micro  # noqa: E402

TOLERANCE = 6.0

_baselines = micro.load_baselines().get("results", {})


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(micro.BENCHMARKS))
def test_benchmark_within_tolerance(name):
    if name not in _baselines:
        pytest.skip(f"no committed baseline for {name}")
    measured = micro.BENCHMARKS[name]()
    baseline = _baselines[name]
    assert measured < baseline * TOLERANCE, (
        f"{name}: {measured * 1e3:.2f} ms vs baseline "
        f"{baseline * 1e3:.2f} ms (> {TOLERANCE}x) — if intentional, run "
        f"`python benchmarks/micro.py update`"
    )
