"""Round-close checklist gate (r9 verdict item 8: codify the
suite-after-last-change discipline).

Two checks, both loud:

1. STALENESS — every sweep/bench/scale artifact the round ships must
   POSTDATE the last source change (committed or uncommitted): an
   artifact regenerated before a later source edit proves nothing about
   the shipped tree (the r9 blemish: PARITY_SF0_1.json predated the
   linkage refactor commit by 3 hours and rested on an inference
   instead of a run).
2. HYGIENE — the recurring r6–r9 chain-completeness item: driver
   artifacts (BENCH_r*.json / CORRECTNESS_r*.json) must not sit
   untracked, and ledger files (BENCH_LOCAL*.json, PARITY*.json, ...)
   must not be modified-but-uncommitted at round close.

Usage:  python scripts/round_close.py --round 10
Exit 1 with a per-file report on any violation. The pure logic
(``find_stale``, ``hygiene_problems``) is unit-tested without git in
tests/test_round_close.py.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Everything that defines query results or measurements. scripts/ is
# included on purpose: a sweep-script edit invalidates the sweep it
# produced just as surely as an operator edit does.
SOURCE_PATHS = ["bishe_gpu_database_spark", "bench.py", "__spark_entry__.py", "scripts"]

# The fixed sweep chain; per-round bench/scale names come from --round.
FIXED_ARTIFACTS = [
    "PARITY.json",
    "PARITY_SF0_1.json",
    "DETERMINISM.json",
    "PERTURBED_PARITY.json",
    "PARITY_WIDE2000.json",
]

# git-status prefixes of files that must be committed at round close.
HYGIENE_PREFIXES = (
    "BENCH_r",
    "CORRECTNESS_r",
    "BENCH_LOCAL",
    "SCALE_r",
    "PARITY",
    "DETERMINISM",
    "PERTURBED_PARITY",
)


def round_artifacts(round_no: int) -> list[str]:
    return FIXED_ARTIFACTS + [f"BENCH_LOCAL_r{round_no}.json", f"SCALE_r{round_no}.json"]


def find_stale(
    artifact_mtimes: dict[str, float | None], source_epoch: float
) -> list[str]:
    """Pure staleness logic: every artifact must exist and be newer than the
    last source change. Returns human-readable problem lines."""
    problems = []
    for name, mtime in sorted(artifact_mtimes.items()):
        if mtime is None:
            problems.append(f"{name}: MISSING — the round never produced it")
        elif mtime < source_epoch:
            problems.append(
                f"{name}: STALE — artifact is {source_epoch - mtime:.0f}s "
                "older than the last source change; re-run its sweep"
            )
    return problems


def hygiene_problems(porcelain: str) -> list[str]:
    """Pure hygiene logic over `git status --porcelain` output: any
    artifact-class file that is untracked (??) or modified-but-unstaged
    is a chain-completeness violation."""
    problems = []
    for line in porcelain.splitlines():
        if len(line) < 4:
            continue
        status, path = line[:2], line[3:].strip()
        base = os.path.basename(path)
        if base.startswith(HYGIENE_PREFIXES):
            if status == "??":
                problems.append(f"{path}: UNTRACKED driver/ledger artifact — commit it")
            elif status.strip():
                problems.append(f"{path}: modified-but-uncommitted — commit it")
    return problems


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def last_source_change_epoch() -> tuple[float, str]:
    """Newest of: the last commit touching a source path, and the mtime
    of any uncommitted (modified or untracked) source file."""
    committed = float(_git("log", "-1", "--format=%ct", "--", *SOURCE_PATHS).strip() or 0)
    newest, origin = committed, "last source commit"
    for line in _git("status", "--porcelain", "--", *SOURCE_PATHS).splitlines():
        path = line[3:].strip()
        full = os.path.join(REPO, path)
        if os.path.isfile(full):
            m = os.path.getmtime(full)
            if m > newest:
                newest, origin = m, f"uncommitted source file {path}"
    return newest, origin


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()

    src_epoch, origin = last_source_change_epoch()
    mtimes: dict[str, float | None] = {}
    for name in round_artifacts(args.round):
        full = os.path.join(REPO, name)
        mtimes[name] = os.path.getmtime(full) if os.path.exists(full) else None
    problems = find_stale(mtimes, src_epoch)
    problems += hygiene_problems(_git("status", "--porcelain"))

    print(f"# last source change: {src_epoch:.0f} ({origin})")
    for name, m in sorted(mtimes.items()):
        state = "missing" if m is None else f"{m - src_epoch:+.0f}s vs source"
        print(f"# {name}: {state}")
    if problems:
        print("\n".join(["ROUND-CLOSE FAIL:"] + problems))
        return 1
    print("ROUND-CLOSE OK: all artifacts postdate the last source change; tree reconciled")
    return 0


if __name__ == "__main__":
    sys.exit(main())
