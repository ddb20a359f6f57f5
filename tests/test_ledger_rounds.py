"""r8 ADVICE: ledger artifact selection must order rounds numerically.

Lexicographic glob order puts BENCH_LOCAL_r10.json before r5/r7, so from
round 10 on a lexicographic ledger would evaluate bars against stale
artifacts and invert the prev/current bench pair. No Spark needed."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger():
    spec = importlib.util.spec_from_file_location(
        "ledger", os.path.join(REPO, "scripts", "ledger.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ledger"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_round_key_orders_two_digit_rounds():
    ledger = _ledger()
    names = [
        "BENCH_LOCAL_r10.json",
        "BENCH_LOCAL_r5.json",
        "BENCH_LOCAL_r7.json",
        "BENCH_LOCAL_r12.json",
    ]
    assert sorted(names, key=ledger._round_key) == [
        "BENCH_LOCAL_r5.json",
        "BENCH_LOCAL_r7.json",
        "BENCH_LOCAL_r10.json",
        "BENCH_LOCAL_r12.json",
    ]
    # lexicographic order is the bug the key exists to avoid
    assert sorted(names) != sorted(names, key=ledger._round_key)


def test_round_key_on_real_artifacts(tmp_path):
    """_round_sorted over a synthetic artifact dir picks the numerically
    newest file, including a two-digit round."""
    ledger = _ledger()
    for r in (5, 7, 10):
        (tmp_path / f"BENCH_LOCAL_r{r}.json").write_text("{}")
    old_repo = ledger.REPO
    try:
        ledger.REPO = str(tmp_path)
        name, payload = ledger._newest("BENCH_LOCAL_r*.json")
        assert name == "BENCH_LOCAL_r10.json"
        assert payload == {}
    finally:
        ledger.REPO = old_repo
