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
    """The lens's target case: the DOMINANT query regresses enough to
    inflate the portfolio denominator and mask itself from lens 1
    (factor 1.23 < 1.5) while the drift (1.4) stays under lens 2 —
    the leave-one-out correction (other queries flat -> loo drift 1.0)
    exposes the genuine 1.73x move."""
    slow = dict(BASE, dedup_semdedup=1.9)  # 1.1 -> 1.9
    r = check(payload(BASE), payload(slow))
    assert r["fail"]
    assert r["absolute_regressions"] == [("dedup_semdedup", 1.727)]
    assert not r["portfolio_regressions"]


def test_uniform_drift_under_bar_fires_no_absolute_lens():
    """r10 correction, pinned by a measured session: a uniform 1.4x
    box slowdown (noise_clean both sides, drift under lens 2's 1.5 bar)
    previously fired ABS-REGRESSION on every query whose portfolio
    factor exceeded 1.5/1.4 — 10 false FAILs on real r10 data. The
    loo-corrected criterion sees every left-out sum move by the same
    1.4x and corrects each factor to ~1.0."""
    slow = {q: v * 1.4 for q, v in BASE.items()}
    r = check(payload(BASE), payload(slow))
    assert not r["fail"]
    assert r["absolute_regressions"] == []
    assert r["portfolio_drift"] == 1.4


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


def test_zero_portfolio_sum_fails_readably():
    """ADVICE r9: an all-zero shared set must not ZeroDivisionError."""
    zeros = {q: 0.0 for q in BASE}
    r = check(payload(zeros), payload(BASE))
    assert r["fail"]
    assert any("degenerate payload" in ln for ln in r["lines"])
    r2 = check(payload(BASE), payload(zeros))
    assert r2["fail"]


def _with_aria(d: dict, txn: dict) -> dict:
    aria = {}
    for tag, v in txn.items():
        if tag == "drain150":
            aria["txn_per_sec"] = v
        else:
            key = {
                "batch200": "batch200",
                "contended": "batch200_contended",
                "multibatch": "stream_multibatch",
                "sustained": "stream_sustained",
                "probe_path": "stream_probe_path",
                "flush_path": "stream_flush_path",
            }[tag]
            aria[key] = {"txn_per_sec": v}
    return dict(d, aria=aria)


def test_aria_throughput_regression_fails_when_both_clean():
    """r9 verdict item 2: batch200 647->487 txn/s clean-to-clean had no
    lens watching — a >threshold txn/s drop must now FAIL."""
    old = _with_aria(payload(BASE), {"drain150": 160.0, "batch200": 647.0})
    new = _with_aria(payload(BASE), {"drain150": 158.0, "batch200": 400.0})
    r = check(old, new)
    assert r["fail"]
    assert r["aria_regressions"] == [("batch200", 1.617)]


def test_aria_lens_respects_noise_gate():
    old = _with_aria(payload(BASE), {"batch200": 647.0})
    new = _with_aria(payload(BASE, clean=False), {"batch200": 400.0})
    r = check(old, new)
    assert not r["fail"]
    assert r["aria_regressions"] == [("batch200", 1.617)]
    assert any("aria-warn" in ln for ln in r["lines"])


def test_aria_lens_tolerates_missing_section():
    r = check(payload(BASE), payload(BASE))
    assert r["aria_regressions"] == []
    assert not r["fail"]


def test_aria_slowdown_explained_by_portfolio_drift_passes():
    """r10: the aria probes slow with the box like everything else —
    a 1.4x txn/s drop in a session whose query portfolio also drifted
    1.4x is the box, not the code (drift-corrected slowdown ~1.0)."""
    slow = {q: v * 1.4 for q, v in BASE.items()}
    old = _with_aria(payload(BASE), {"batch200": 647.0})
    new = _with_aria(payload(slow), {"batch200": 462.0})
    r = check(old, new)
    assert not r["fail"]
    assert r["aria_regressions"] == []


def test_aria_speedup_never_flags():
    old = _with_aria(payload(BASE), {"sustained": 500.0})
    new = _with_aria(payload(BASE), {"sustained": 900.0})
    r = check(old, new)
    assert not r["fail"]
    assert r["aria_regressions"] == []
