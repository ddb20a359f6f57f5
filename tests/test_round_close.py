"""The round-close gate's pure logic (scripts/round_close.py, r9
verdict item 8): a deliberately staled artifact and an untracked driver
artifact must both be caught. No git/Spark needed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from round_close import find_stale, hygiene_problems, round_artifacts  # noqa: E402

SRC_T = 1_000_000.0


def test_fresh_artifacts_pass():
    mtimes = {"PARITY.json": SRC_T + 60, "SCALE_r10.json": SRC_T + 3600}
    assert find_stale(mtimes, SRC_T) == []


def test_deliberately_staled_artifact_is_caught():
    mtimes = {"PARITY.json": SRC_T + 60, "PARITY_SF0_1.json": SRC_T - 11_000}
    problems = find_stale(mtimes, SRC_T)
    assert len(problems) == 1
    assert "PARITY_SF0_1.json" in problems[0] and "STALE" in problems[0]
    assert "11000s" in problems[0]


def test_missing_artifact_is_caught():
    problems = find_stale({"DETERMINISM.json": None}, SRC_T)
    assert problems == ["DETERMINISM.json: MISSING — the round never produced it"]


def test_untracked_driver_artifact_is_caught():
    porcelain = "?? BENCH_r09.json\n?? CORRECTNESS_r09.json\n?? notes.txt\n"
    problems = hygiene_problems(porcelain)
    assert len(problems) == 2
    assert all("UNTRACKED" in p for p in problems)


def test_modified_ledger_is_caught_but_clean_tree_passes():
    assert hygiene_problems("") == []
    assert hygiene_problems(" M bench.py\n") == []  # source, not an artifact
    problems = hygiene_problems(" M BENCH_LOCAL.json\n")
    assert problems == ["BENCH_LOCAL.json: modified-but-uncommitted — commit it"]


def test_round_artifact_list_tracks_round_number():
    names = round_artifacts(10)
    assert "BENCH_LOCAL_r10.json" in names and "SCALE_r10.json" in names
    assert "PARITY_SF0_1.json" in names
