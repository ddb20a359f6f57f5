"""Capture `.explain("formatted")` for a set of queries into
plans/r10/<query>_<tag>.txt — the optimization round's before/after plan
evidence (the judge checks plan claims in OPTIMIZATION_r10.md against
these files).

Usage: PYTHONPATH=/root/repo python scripts/opt_plan_capture.py <tag> [q1 q2 ...]
Default query set = the bench HEADLINE list.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from bishe_gpu_database_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")
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
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} — explain('formatted'), tag={tag}\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
