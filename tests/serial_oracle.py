"""Serial Python oracle for the Aria engine (SURVEY.md §5.2 item 2).

Implements the Aria *spec* — reservations as min-Tid per key, RAW/WAR/WAW
against those, abort on ``waw ∨ raw`` (plain) or ``waw ∨ (raw ∧ war)``
(reordering), install committed writes in tid order with last-seq-wins
within a transaction, retry aborted with dense renumbering — entirely in
plain dicts/loops, independent of the DataFrame implementation.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Op:
    tid: int
    seq: int
    k: int
    is_update: bool
    new_value: tuple | None  # staged write value (None for reads)


def epoch(kv: dict[int, tuple], ops: list[Op], *, reorder: bool, insert_missing: bool = False):
    """One epoch. Returns (new_kv, committed_tids, aborted_tids).
    ``insert_missing``: the op-parallel variant — missing keys are not
    skipped; a committed write creates the key."""
    found = ops if insert_missing else [o for o in ops if o.k in kv]
    rts: dict[int, int] = {}
    wts: dict[int, int] = {}
    for o in found:
        rts[o.k] = min(rts.get(o.k, o.tid), o.tid)
        if o.is_update:
            wts[o.k] = min(wts.get(o.k, o.tid), o.tid)

    tids = sorted({o.tid for o in ops})
    flags = {tid: {"raw": False, "war": False, "waw": False} for tid in tids}
    for o in found:
        f = flags[o.tid]
        if o.k in wts and wts[o.k] < o.tid:
            f["raw"] = True
            if o.is_update:
                f["waw"] = True
        if o.is_update and rts[o.k] < o.tid:
            f["war"] = True

    committed, aborted = [], []
    for tid in tids:
        f = flags[tid]
        abort = (f["waw"] or (f["raw"] and f["war"])) if reorder else (f["waw"] or f["raw"])
        (aborted if abort else committed).append(tid)

    new_kv = dict(kv)
    for tid in committed:  # tid order; last write per (tid, k) wins (seq order)
        for o in sorted((o for o in found if o.tid == tid and o.is_update), key=lambda o: o.seq):
            new_kv[o.k] = o.new_value
    return new_kv, committed, aborted


def drain(
    kv: dict[int, tuple],
    ops: list[Op],
    *,
    reorder: bool,
    insert_missing: bool = False,
    max_epochs: int = 64,
):
    """Run epochs until no transaction remains; returns (kv, stats).
    Each epoch's stats carry the per-transaction SCHEDULE as
    ``verdicts``: sorted (ORIGINAL tid, committed) pairs — the oracle
    renumbers densely like the reference, but records verdicts on the
    original ids so the engine's schedule (which analyzes on originals;
    order-preserving renumbering makes them equivalent) compares 1:1."""
    stats = []
    orig = {tid: tid for tid in {o.tid for o in ops}}
    for ep in range(1, max_epochs + 1):
        tids = sorted({o.tid for o in ops})
        if not tids:
            break
        kv, committed, aborted = epoch(kv, ops, reorder=reorder, insert_missing=insert_missing)
        stats.append(
            {
                "epoch": ep,
                "n_txns": len(tids),
                "n_committed": len(committed),
                "n_aborted": len(aborted),
                "verdicts": sorted(
                    (orig[tid], tid not in set(aborted)) for tid in tids
                ),
            }
        )
        renum = {old: i + 1 for i, old in enumerate(sorted(aborted))}
        orig = {renum[old]: orig[old] for old in renum}
        ops = [
            Op(renum[o.tid], o.seq, o.k, o.is_update, o.new_value)
            for o in ops
            if o.tid in renum
        ]
        if not aborted:
            break
    return kv, stats
