"""Round-over-round bench regression gate (r5 verdict item 7).

Compares two bench payloads (the lossless ``BENCH_LOCAL*.json`` files
``bench.py`` writes) on ANCHOR-RELATIVE p50: for every query present in
both rounds, the regression factor is

    (p50_new / anchor_new) / (p50_old / anchor_old)

with anchor = the same-session q1_pricing_summary p50. Absolute seconds
are not comparable across rounds on this box (sessions swing 1.5-2x —
measured noise_probe history, r5 verdict); the anchor ratio cancels the
session speed, so a factor > THRESHOLD is a real plan/code regression,
not the weather.

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


def anchor_ratios(d: dict) -> dict[str, float]:
    p50 = d["queries_p50"]
    a = (d.get("anchor") or {}).get("p50_sec") or p50.get(ANCHOR)
    if not a:
        raise SystemExit("no anchor p50 in payload")
    return {k: v / a for k, v in p50.items()}


def main(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    ro, rn = anchor_ratios(old), anchor_ratios(new)
    shared = sorted(set(ro) & set(rn) - {ANCHOR})
    regressions = []
    print(f"# {len(shared)} shared queries, threshold {THRESHOLD}x "
          f"(anchor={ANCHOR})")
    for q in shared:
        factor = rn[q] / ro[q] if ro[q] else float("inf")
        mark = " <-- REGRESSION" if factor > THRESHOLD else ""
        print(f"{q:40s} old {ro[q]:6.2f}x  new {rn[q]:6.2f}x  "
              f"factor {factor:5.2f}{mark}")
        if factor > THRESHOLD:
            regressions.append((q, factor))
    if regressions:
        print(f"\nFAIL: {len(regressions)} anchor-relative regressions "
              f"> {THRESHOLD}x: {regressions}")
        return 1
    print("\nOK: no anchor-relative regression above threshold")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
