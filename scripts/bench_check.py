"""Round-over-round bench regression gate (r5 verdict item 7).

Compares two bench payloads (the lossless ``BENCH_LOCAL*.json`` files
``bench.py`` writes) on PORTFOLIO-RELATIVE p50: for every query present
in both rounds, the regression factor is

    (p50_new / sum_new) / (p50_old / sum_old)

with sum = the sum of the shared queries' p50s in the SAME session.
Absolute seconds are not comparable across rounds on this box (sessions
swing 1.5-2x — measured noise_probe history, r5 verdict), so both
payloads need a same-session denominator. r5-r7 used the q1 anchor; r8
moved the gate to the portfolio sum after the q1 denominator produced a
wholesale false alarm: q1's own p50 swung 0.501 -> 0.342 s between the
r7 and r8 sessions (the documented +/-40% sub-second swing), inflating
EVERY query's anchor ratio ~1.46x and flagging 8 "regressions" whose
absolute p50s had moved <= 1.42x with a flat portfolio sum
(21.18 -> 21.13 s). The ~20 s portfolio denominator is ~10x more stable
than sub-second q1 — the same lesson that moved the mart_rfm bar to
portfolio share in r7. Anchor ratios are still printed per query for
continuity with older artifacts.

Exit status 1 (loud) if any shared query degrades more than THRESHOLD
(default 1.5, env SPARK_GRAFT_BENCH_THRESHOLD). Usage:

    python scripts/bench_check.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = float(os.environ.get("SPARK_GRAFT_BENCH_THRESHOLD", "1.5"))
ANCHOR = "q1_pricing_summary"


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


def main(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    po, pn = old["queries_p50"], new["queries_p50"]
    shared = sorted(set(po) & set(pn))
    sum_o = sum(po[q] for q in shared)
    sum_n = sum(pn[q] for q in shared)
    ao = (old.get("anchor") or {}).get("p50_sec") or po.get(ANCHOR)
    an = (new.get("anchor") or {}).get("p50_sec") or pn.get(ANCHOR)
    regressions = []
    print(
        f"# {len(shared)} shared queries, threshold {THRESHOLD}x "
        f"(portfolio sums {sum_o:.2f}s -> {sum_n:.2f}s; q1 anchor "
        f"{ao:.3f}s -> {an:.3f}s shown per query for continuity)"
    )
    for q in shared:
        share_o, share_n = po[q] / sum_o, pn[q] / sum_n
        factor = share_n / share_o if share_o else float("inf")
        anchor_note = (
            f"  (anchor-rel {((pn[q] / an) / (po[q] / ao)):5.2f})"
            if ao and an
            else ""
        )
        mark = " <-- REGRESSION" if factor > THRESHOLD else ""
        print(
            f"{q:40s} old {share_o:7.4f}  new {share_n:7.4f}  "
            f"factor {factor:5.2f}{anchor_note}{mark}"
        )
        if factor > THRESHOLD:
            regressions.append((q, round(factor, 3)))
    if regressions:
        print(
            f"\nFAIL: {len(regressions)} portfolio-relative regressions "
            f"> {THRESHOLD}x: {regressions}"
        )
        return 1
    print("\nOK: no portfolio-relative regression above threshold")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
