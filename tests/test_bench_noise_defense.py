"""r8 (r7 verdict item 2): bench.py defends itself against dirty
sessions. BENCH_r07.json shipped with noise_spread 2.631 vs the repo's
<0.6 clean bar, and every apparent regression in it was a measurement
artifact — the official record must cool down, re-measure, and stamp
noise_clean so a polluted payload is self-describing. Pure-Python test
via the injected measure/sleep hooks; no Spark."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_clean_first_try_no_retry():
    bench = _bench()
    calls, slept = [], []
    payload = bench.run_with_noise_defense(
        lambda: calls.append(1) or {"noise_spread": 0.2},
        bar=0.6,
        retries=2,
        cooldown_sec=99,
        sleep=slept.append,
        log=lambda m: None,
    )
    assert len(calls) == 1 and slept == []
    assert payload["noise_clean"] is True
    assert payload["noise_attempts"] == [0.2]
    assert payload["noise_clean_bar"] == 0.6


def test_dirty_then_clean_retries_with_cooldown():
    bench = _bench()
    spreads = iter([2.6, 1.1, 0.4])
    slept = []
    payload = bench.run_with_noise_defense(
        lambda: {"noise_spread": next(spreads)},
        bar=0.6,
        retries=2,
        cooldown_sec=120,
        sleep=slept.append,
        log=lambda m: None,
    )
    assert slept == [120, 120]  # cooled down before each re-measure
    assert payload["noise_clean"] is True
    assert payload["noise_attempts"] == [2.6, 1.1, 0.4]
    assert payload["noise_spread"] == 0.4  # final payload is the clean pass


def test_never_clean_is_stamped_dirty():
    bench = _bench()
    payload = bench.run_with_noise_defense(
        lambda: {"noise_spread": 3.0},
        bar=0.6,
        retries=2,
        cooldown_sec=1,
        sleep=lambda s: None,
        log=lambda m: None,
    )
    assert payload["noise_clean"] is False
    assert payload["noise_attempts"] == [3.0, 3.0, 3.0]  # bounded retries


def test_headline_list_unchanged_by_refactor():
    """The measure() extraction must not have dropped headline coverage."""
    bench = _bench()
    assert len(bench.HEADLINE) == 28
    assert bench.HEADLINE[0] == "q1_pricing_summary"
