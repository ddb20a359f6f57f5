"""Round-over-round bench regression gate (r5 verdict item 7; r9: two
independent lenses, r8 verdict item 8 + ADVICE).

Compares two bench payloads (the lossless ``BENCH_LOCAL*.json`` files
``bench.py`` writes) with FOUR checks:

1. PORTFOLIO-RELATIVE p50 (the r8 primary): for every query present in
   both rounds, factor = (p50_new / sum_new) / (p50_old / sum_old) with
   sum = the shared queries' p50 sum in the SAME session. Absolute
   seconds swing 1.5-2x between sessions on this box (measured
   noise_probe history, r5 verdict), so both payloads need a
   same-session denominator; the ~20 s portfolio sum is ~10x more
   stable than the sub-second q1 anchor r5-r7 used (the q1 denominator
   produced a wholesale false alarm in r8: q1 swung 0.501 -> 0.342 s,
   inflating every ratio ~1.46x against a flat 21.18 -> 21.13 s
   portfolio). Any breach FAILS.
2. WHOLE-PORTFOLIO drift (ADVICE r8): the portfolio lens is blind to a
   uniform slowdown by construction, so sum_n/sum_o itself is checked.
   FAILS only when BOTH payloads are noise_clean (a cold/noisy session
   legitimately moves the whole sum); otherwise prints a WARN.
3. ABSOLUTE per-query p50 (r8 verdict item 8; r10 correction): the raw
   factor pn[q]/po[q] is printed for every query, but the FAIL
   criterion is the LEAVE-ONE-OUT-drift-corrected factor —
   abs_factor / ((sum_n - pn[q]) / (sum_o - po[q])). Rationale:
   abs_factor ≡ portfolio_factor × drift by construction, so on a
   session whose whole portfolio drifts (an r10 session measured a
   uniform 1.39x — internally noise_clean, globally slower) the raw
   criterion fired 10 false FAILs on queries whose portfolio factors
   were all <=1.29. Dividing by the drift of the OTHER queries keeps
   the lens's real target — a regression concentrated in a query big
   enough to inflate the portfolio denominator and mask itself from
   lens 1 — while a box-regime change (every query moves by the same
   factor, including the left-out ones) corrects to ~1.0 and is lens
   2's business. Breaches FAIL when both payloads are noise_clean,
   WARN otherwise.
4. ARIA THROUGHPUT (r9 verdict item 2; r10: drift-corrected like lens
   3): every txn/s headline in the payloads' aria section (drain150,
   batch200, contended, multibatch, sustained, probe_path, flush_path),
   raw slowdown = old/new printed; the FAIL criterion is
   slowdown / portfolio_drift (the query portfolio measured in the SAME
   session is the box-speed control for the sub-second aria probes).
   Breaches FAIL when both payloads are noise_clean, WARN otherwise —
   these moved -15..-40% clean-to-clean in r9 with no lens watching.

Anchor ratios are still printed per query for continuity with r5-r7
artifacts (guarded: payloads missing the anchor no longer crash the
header, ADVICE r8).

Exit status 1 (loud) on any FAIL. THRESHOLD default 1.5, env
SPARK_GRAFT_BENCH_THRESHOLD. Usage:

    python scripts/bench_check.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = float(os.environ.get("SPARK_GRAFT_BENCH_THRESHOLD", "1.5"))
ANCHOR = "q1_pricing_summary"

# The Aria throughput axis (r9 verdict item 2): every txn/s headline the
# bench payload carries, flattened to {tag: txn_per_sec}. These moved
# -15..-40% clean-to-clean in r9 with no lens watching.
_ARIA_TXN_KEYS = (
    ("batch200", "batch200"),
    ("batch200_contended", "contended"),
    ("stream_multibatch", "multibatch"),
    ("stream_sustained", "sustained"),
    ("stream_probe_path", "probe_path"),
    ("stream_flush_path", "flush_path"),
)


def aria_txn(payload: dict) -> dict:
    """Flatten a lossless bench payload's aria section to {tag: txn/s}."""
    aria = payload.get("aria") or {}
    txn = {}
    if aria.get("txn_per_sec") is not None:
        txn["drain150"] = aria["txn_per_sec"]
    for key, tag in _ARIA_TXN_KEYS:
        v = (aria.get(key) or {}).get("txn_per_sec")
        if v is not None:
            txn[tag] = v
    return txn


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    # Accept either the lossless payload or a driver BENCH_r{N}.json
    # wrapper whose "parsed" field carries the payload.
    if "queries_p50" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries_p50" not in d:
        raise SystemExit(
            f"{path}: no queries_p50 — pass a BENCH_LOCAL*.json payload "
            "(driver tails are truncated and unusable here)"
        )
    return d


def check(old: dict, new: dict, threshold: float = THRESHOLD) -> dict:
    """Pure gate logic (importable for tests). Returns a report dict:
    {portfolio_regressions, absolute_regressions, portfolio_drift,
    both_clean, fail, lines}."""
    po, pn = old["queries_p50"], new["queries_p50"]
    shared = sorted(set(po) & set(pn))
    sum_o = sum(po[q] for q in shared)
    sum_n = sum(pn[q] for q in shared)
    if not sum_o or not sum_n:
        # ADVICE r9: an all-zero / empty shared set raised a bare
        # ZeroDivisionError; a payload like that is broken input, not a
        # perf verdict — fail with a readable line instead.
        return {
            "portfolio_regressions": [],
            "absolute_regressions": [],
            "aria_regressions": [],
            "portfolio_drift": float("inf"),
            "both_clean": False,
            "fail": True,
            "lines": [
                f"FAIL: degenerate payload — shared-query p50 sums are "
                f"{sum_o:.3f}s (old) / {sum_n:.3f}s (new) over "
                f"{len(shared)} shared queries; a zero portfolio sum "
                "means the payload measured nothing (drift treated as inf)"
            ],
        }
    ao = (old.get("anchor") or {}).get("p50_sec") or po.get(ANCHOR)
    an = (new.get("anchor") or {}).get("p50_sec") or pn.get(ANCHOR)
    both_clean = bool(old.get("noise_clean")) and bool(new.get("noise_clean"))
    lines = []
    anchor_seg = (
        f"; q1 anchor {ao:.3f}s -> {an:.3f}s shown per query for continuity"
        if ao and an
        else "; anchor absent in >=1 payload (anchor-rel column omitted)"
    )
    lines.append(
        f"# {len(shared)} shared queries, threshold {threshold}x "
        f"(portfolio sums {sum_o:.2f}s -> {sum_n:.2f}s"
        f"{anchor_seg}; both_noise_clean={both_clean})"
    )
    portfolio_regs, absolute_regs = [], []
    for q in shared:
        share_o, share_n = po[q] / sum_o, pn[q] / sum_n
        factor = share_n / share_o if share_o else float("inf")
        abs_factor = pn[q] / po[q] if po[q] else float("inf")
        # Leave-one-out drift correction (r10, docstring lens 3): the
        # other queries' drift is the box-speed control this query's
        # absolute move is judged against. Degenerate LOO sums (single
        # shared query) fall back to the uncorrected factor — lens 2
        # owns that case.
        loo_o, loo_n = sum_o - po[q], sum_n - pn[q]
        corrected = abs_factor / (loo_n / loo_o) if loo_o > 0 and loo_n > 0 else abs_factor
        anchor_note = (
            f"  (anchor-rel {((pn[q] / an) / (po[q] / ao)):5.2f})"
            if ao and an and po[q]
            else ""
        )
        marks = []
        if factor > threshold:
            portfolio_regs.append((q, round(factor, 3)))
            marks.append("PORTFOLIO-REGRESSION")
        if corrected > threshold:
            absolute_regs.append((q, round(corrected, 3)))
            marks.append("ABS-REGRESSION" if both_clean else "abs-warn")
        mark = (" <-- " + ",".join(marks)) if marks else ""
        lines.append(
            f"{q:40s} old {share_o:7.4f}  new {share_n:7.4f}  "
            f"factor {factor:5.2f}  abs {abs_factor:5.2f}  "
            f"loo-corr {corrected:5.2f}{anchor_note}{mark}"
        )
    drift = sum_n / sum_o if sum_o else float("inf")
    drift_breach = drift > threshold
    fail = bool(portfolio_regs)
    if drift_breach:
        if both_clean:
            lines.append(
                f"\nFAIL: whole-portfolio drift {drift:.2f}x > {threshold}x "
                "with both payloads noise_clean (uniform slowdown the "
                "per-query portfolio lens cannot see)"
            )
            fail = True
        else:
            lines.append(
                f"\nWARN: whole-portfolio drift {drift:.2f}x > {threshold}x "
                "but >=1 payload is NOT noise_clean — session noise, "
                "re-run before trusting"
            )
    if portfolio_regs:
        lines.append(
            f"\nFAIL: {len(portfolio_regs)} portfolio-relative regressions "
            f"> {threshold}x: {portfolio_regs}"
        )
    if absolute_regs:
        if both_clean:
            lines.append(
                f"\nFAIL: {len(absolute_regs)} ABSOLUTE (loo-drift-"
                f"corrected) p50 regressions > {threshold}x across two "
                f"noise-clean sessions: {absolute_regs}"
            )
            fail = True
        else:
            lines.append(
                f"\nWARN: {len(absolute_regs)} absolute (loo-drift-"
                f"corrected) p50 moves > {threshold}x but >=1 payload is "
                f"NOT noise_clean — informational only: {absolute_regs}"
            )
    # Lens 4 (r9 verdict item 2; r10 drift correction — docstring): Aria
    # THROUGHPUT. The txn/s headlines are sub-second probes (the box
    # swings them ±40% between sessions), so the raw slowdown old/new is
    # printed but the FAIL criterion divides out the same-session query-
    # portfolio drift, and like the absolute lens this FAILS only when
    # both payloads are noise_clean.
    to, tn = aria_txn(old), aria_txn(new)
    aria_regs = []
    for tag in sorted(set(to) & set(tn)):
        slow = to[tag] / tn[tag] if tn[tag] else float("inf")
        corrected_slow = slow / drift if drift > 0 else slow
        mark = ""
        if corrected_slow > threshold:
            aria_regs.append((tag, round(corrected_slow, 3)))
            mark = " <-- " + ("ARIA-REGRESSION" if both_clean else "aria-warn")
        lines.append(
            f"aria:{tag:34s} old {to[tag]:8.1f}  new {tn[tag]:8.1f} txn/s  "
            f"slowdown {slow:5.2f}  drift-corr {corrected_slow:5.2f}{mark}"
        )
    if aria_regs:
        if both_clean:
            lines.append(
                f"\nFAIL: {len(aria_regs)} Aria txn/s (drift-corrected) "
                f"regressions > {threshold}x across two noise-clean "
                f"sessions: {aria_regs}"
            )
            fail = True
        else:
            lines.append(
                f"\nWARN: {len(aria_regs)} Aria txn/s (drift-corrected) "
                f"drops > {threshold}x but >=1 payload is NOT noise_clean "
                f"— informational only: {aria_regs}"
            )
    # Lens 5 (r11, r10 verdict item 7): the sf1 mini-portfolio — the one
    # block where the fixture is NOT scheduling-latency-bound, so it is
    # the only headline-adjacent signal for lost parallelism / plan-shape
    # regressions at data scale. Informational (drift-corrected print +
    # WARN) for now: the block is new in r11, so there is at most one
    # prior payload to regress against and its noise behavior is
    # uncharacterized; promote to a FAIL lens once two rounds of payloads
    # exist.
    s1o = (old.get("sf1_probe") or {}).get("queries") or {}
    s1n = (new.get("sf1_probe") or {}).get("queries") or {}
    sf1_warns = []
    for q in sorted(set(s1o) & set(s1n)):
        f1 = s1n[q] / s1o[q] if s1o[q] else float("inf")
        corr = f1 / drift if drift > 0 else f1
        mark = ""
        if corr > threshold:
            sf1_warns.append((q, round(corr, 3)))
            mark = " <-- sf1-warn"
        lines.append(
            f"sf1:{q:35s} old {s1o[q]:7.3f}s  new {s1n[q]:7.3f}s  "
            f"factor {f1:5.2f}  drift-corr {corr:5.2f}{mark}"
        )
    if sf1_warns:
        lines.append(
            f"\nWARN: {len(sf1_warns)} sf1-probe (drift-corrected) moves "
            f"> {threshold}x — informational lens: {sf1_warns}"
        )
    if not fail:
        lines.append("\nOK: no regression above threshold on any active lens")
    return {
        "portfolio_regressions": portfolio_regs,
        "absolute_regressions": absolute_regs,
        "aria_regressions": aria_regs,
        "sf1_warns": sf1_warns,
        "portfolio_drift": round(drift, 4),
        "both_clean": both_clean,
        "fail": fail,
        "lines": lines,
    }


def main(old_path: str, new_path: str) -> int:
    report = check(load(old_path), load(new_path))
    print("\n".join(report["lines"]))
    return 1 if report["fail"] else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
