"""Capture `.explain("formatted")` for a set of queries into
plans/<round>/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims in OPTIMIZATION_r{N}.md
against these files).

r11 (r10 verdict item 6): a dump whose plan root is a checkpoint stub
(`Scan ExistingRDD` with no other operators) shows the *checkpointed
result*, not the computation — OPTIMIZATION_r10.md over-cited two such
dumps as plan evidence. The capture now detects that case and stamps the
file `NO-PLAN-SURFACE` so a report cannot cite a stub as a plan diff.

Usage: PYTHONPATH=/root/repo python scripts/opt_plan_capture.py <tag> [q1 q2 ...]
Round dir override: SPARK_GRAFT_PLAN_ROUND=r11 (default r11).
Default query set = the bench HEADLINE list.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from bishe_gpu_database_spark.session import get_spark  # noqa: E402


def is_plan_stub(text: str) -> bool:
    """True when the formatted plan contains ONLY checkpoint stubs
    (ExistingRDD / LocalTableScan roots) — i.e. every real operator was
    executed eagerly before explain() ran and the dump proves nothing
    about the computation's shape."""
    ops = re.findall(r"^\s*[*+\-: ]*\((\d+)\)\s+(\S+)", text, flags=re.M)
    names = {name for _, name in ops}
    informative = names - {
        "Scan", "ScanExistingRDD", "LocalTableScan", "Project", "ColumnarToRow",
    }
    # "Scan ExistingRDD" renders as op name "Scan"; a dump whose only
    # operators are scans of pre-materialized RDDs + trivial projections
    # has no plan surface.
    return not informative and ("ExistingRDD" in text or "LocalTableScan" in text)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir
    )
    os.makedirs(out_dir, exist_ok=True)
    _ensure_loaded()
    spark = get_spark("opt-plan-capture")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # plan capture must never abort the sweep
            text = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        header = f"# {name} @ {sf_dir} — explain('formatted'), tag={tag}\n"
        if is_plan_stub(text):
            header += (
                "# NO-PLAN-SURFACE: the returned frame is a checkpoint/driver-"
                "loop stub (ExistingRDD/LocalTableScan root). This dump does "
                "NOT evidence the computation's plan; cite A/B timings and the "
                "code instead.\n"
            )
        with open(path, "w") as fh:
            fh.write(header)
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
