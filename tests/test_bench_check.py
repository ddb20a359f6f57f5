"""The bench regression gate's pure logic (scripts/bench_check.check),
r8 verdict item 8 + ADVICE: the portfolio lens alone passes a uniform
slowdown silently and crashes on anchor-less payloads — the r9 gate
adds a whole-portfolio drift check, an absolute per-query lens (both
noise_clean-gated), and guards the anchor header. No Spark needed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from bench_check import check  # noqa: E402


def payload(p50: dict, *, clean: bool = True, anchor: bool = True) -> dict:
    d = {"queries_p50": dict(p50), "noise_clean": clean}
    if anchor and "q1_pricing_summary" in p50:
        d["anchor"] = {
            "query": "q1_pricing_summary",
            "p50_sec": p50["q1_pricing_summary"],
        }
    return d


BASE = {"q1_pricing_summary": 0.3, "join_asof": 0.6, "dedup_semdedup": 1.1}


def test_flat_rounds_pass():
    r = check(payload(BASE), payload(BASE))
    assert not r["fail"]
    assert r["portfolio_drift"] == 1.0


def test_uniform_slowdown_flagged_when_both_clean():
    slow = {q: v * 2.0 for q, v in BASE.items()}
    r = check(payload(BASE), payload(slow))
    assert r["fail"]  # portfolio factors are all 1.0 — drift must catch it
    assert not r["portfolio_regressions"]
    assert r["portfolio_drift"] == 2.0


def test_uniform_slowdown_warns_only_when_noisy():
    slow = {q: v * 2.0 for q, v in BASE.items()}
    r = check(payload(BASE), payload(slow, clean=False))
    assert not r["fail"]
    assert any("WARN" in ln for ln in r["lines"])


def test_absolute_regression_flagged_despite_flat_portfolio():
    # the dominant query regresses 2x while the small ones regress in
    # proportion enough to keep every portfolio share ~flat is hard to
    # fake exactly; instead: ALL queries regress 1.8x (shares exactly
    # flat) -> each query's absolute lens fires alongside drift.
    slow = {q: v * 1.8 for q, v in BASE.items()}
    r = check(payload(BASE), payload(slow))
    assert r["fail"]
    assert len(r["absolute_regressions"]) == 3
    assert not r["portfolio_regressions"]


def test_absolute_lens_respects_noise_gate():
    slow = dict(BASE, join_asof=BASE["join_asof"] * 1.8)
    r = check(payload(BASE, clean=False), payload(slow))
    assert not r["both_clean"]
    assert not r["fail"]  # informational WARN only
    assert r["absolute_regressions"] == [("join_asof", 1.8)]


def test_portfolio_regression_still_fails_regardless_of_noise():
    slow = dict(BASE, join_asof=BASE["join_asof"] * 4.0)
    r = check(payload(BASE, clean=False), payload(slow, clean=False))
    assert r["fail"]
    assert r["portfolio_regressions"]


def test_anchorless_payload_does_not_crash():
    no_anchor_base = {"join_asof": 0.6, "dedup_semdedup": 1.1}
    r = check(
        payload(no_anchor_base, anchor=False), payload(no_anchor_base, anchor=False)
    )
    assert not r["fail"]
    assert "anchor absent" in r["lines"][0]
