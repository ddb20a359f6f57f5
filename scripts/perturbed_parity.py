"""Adversarial-fixture parity sweep (r4): the mechanical form of the
review lens that keeps finding oracle blind spots by hand.

The driver's fixtures never contain the content edge cases a 100 TB
corpus contains routinely — empty documents, letter-less documents,
whitespace-only text, duplicate (series, timestamp) points, zero-value
events, zero/negative account balances. A query and its oracle can share
a bug (both silently drop the weird row) or, worse, DIVERGE on it (the
r3 ``udf_pandas_iter_model_score`` finding: the Spark side emitted a
letter-less doc with score 0 while the oracle's inner join dropped it).

This sweep materializes a PERTURBED copy of the sf0.001 fixture with
those rows injected — preserving structural invariants (unique ids,
consistent n_chars, valid enum values) while breaking only CONTENT
assumptions — and re-runs every registered query against its DuckDB
oracle on it. Any hash mismatch is a latent parity break surfaced now
instead of by the next round's reviewer.

Run: python scripts/perturbed_parity.py [out.json]
(fixture dir override: SPARK_GRAFT_PERTURB_SRC=<dir>)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

import duckdb

# Repo root from this file's location; fixture dir from env/argv — the
# sweep runs on any checkout layout (r4 advice), defaults matching the
# driver box.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SRC = os.environ.get("SPARK_GRAFT_PERTURB_SRC", "/root/testdata/sf0.001")


def build_perturbed(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for tbl in ("region", "nation", "supplier", "part", "orders", "lineitem"):
        shutil.copy(os.path.join(SRC, f"{tbl}.parquet"), os.path.join(dst, f"{tbl}.parquet"))

    # documents: content edge cases past the max doc_id. n_chars stays
    # consistent with the text; lang/source reuse in-domain values.
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SRC}/documents.parquet'
          UNION ALL
          SELECT * FROM (VALUES
            (900001, '', 'en', 'src0', 0),
            (900002, '   ', 'en', 'src1', 3),
            (900003, '123 456 789 !!! ???', 'de', 'src2', 19),
            (900004, 'x', 'es', 'src0', 1),
            (900005, 'the the the the the the the the', 'en', 'src1', 31),
            (900006, '!!!???...,,,;;;:::', 'fr', 'src2', 18)
          ) t(doc_id, text, lang, source, n_chars)
          UNION ALL
          -- r5 axes: multibyte/unicode text (2-4 byte codepoints: accents,
          -- Cyrillic, emoji, CJK — byte count != codepoint count != token
          -- count) and NULL text (a 100 TB crawl has null fields). Case
          -- mappings here are all 1:1 (Ü->ü, М->м): locale-special maps
          -- like Turkish U+0130 'İ' are deliberately EXCLUDED — Java
          -- (Spark) lowers it to 'i'+U+0307 while utf8proc (DuckDB)
          -- lowers it to plain 'i', an engine-level Unicode-tailoring
          -- divergence no query can reconcile (verified r5); it is a
          -- documented limitation, not a parity target. n_chars stays the
          -- CODEPOINT length both engines compute as length(text); NULL
          -- text carries NULL n_chars.
          SELECT 900007,
                 'Ünïcödé ÇAFÉ naïve МОСКВА москва 🎉🎉 日本語テキスト eté',
                 'de', 'src1',
                 length('Ünïcödé ÇAFÉ naïve МОСКВА москва 🎉🎉 日本語テキスト eté')
          UNION ALL
          SELECT 900008, CAST(NULL AS VARCHAR), 'en', 'src0',
                 CAST(NULL AS BIGINT)
          UNION ALL
          -- r6: a NULL-text doc that sorts FIRST in its lang (negative
          -- doc_id < every generated id) — running sums ordered by doc_id
          -- start on an all-NULL prefix, the exact case the r5 advice
          -- found masked when the only NULL doc carried the MAX doc_id.
          SELECT -900009, CAST(NULL AS VARCHAR), 'en', 'src1',
                 CAST(NULL AS BIGINT)
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # events: duplicate (event_type, ts) pairs (two new rows sharing one
    # timestamp with an EXISTING row and with each other), a zero-value
    # event, and a user whose purchase precedes their signup.
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SRC}/events.parquet'
          UNION ALL
          SELECT * FROM (
            SELECT 900001 AS event_id, ts, 900001 AS user_id, event_type,
                   0.0 AS value, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900002 AS event_id, ts, 900002 AS user_id, event_type,
                   123.45 AS value, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900003 AS event_id, ts + INTERVAL 1 MINUTE, 900003, 'purchase',
                   7.0, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900004 AS event_id, ts + INTERVAL 2 MINUTE, 900003, 'signup',
                   0.0, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          -- r7 axes: garbage timestamps a 100 TB corpus contains routinely.
          -- PRE-EPOCH (negative unix micros — floor-vs-truncate division
          -- divergence in every hour/day bucketing, the exact hole pmod
          -- guards in window_distinct_sliding) and SUB-MICRO-PRECISION
          -- just past the epoch (1 µs — catches any seconds-cast
          -- truncation admitting rows across frame boundaries).
          SELECT * FROM (
            SELECT 900005 AS event_id, TIMESTAMP '1969-12-31 23:30:00',
                   900005, event_type, 1.0, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900006 AS event_id, TIMESTAMP '1970-01-01 00:00:00.000001',
                   900006, event_type, 2.0, props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          -- r7 axes: garbage PROPS a crawl contains routinely — NULL,
          -- truncated-mid-object JSON, and valid JSON whose $.k is a
          -- non-numeric string (engine get_json_object+cast returns
          -- NULL; a DuckDB oracle must TRY_CAST, plain CAST errors).
          SELECT * FROM (
            SELECT 900007 AS event_id, ts, 900007, event_type, 3.0,
                   NULL AS props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900008 AS event_id, ts, 900008, event_type, 4.0,
                   '{{"k": ' AS props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
          UNION ALL
          SELECT * FROM (
            SELECT 900009 AS event_id, ts, 900009, event_type, 5.0,
                   '{{"k": "not_a_number"}}' AS props
            FROM '{SRC}/events.parquet' ORDER BY event_id LIMIT 1
          )
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    # customer: zero and negative balances at fresh keys (valid segments).
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SRC}/customer.parquet'
          UNION ALL
          SELECT * FROM (VALUES
            (900001, 'Customer#900001', 0, 0.00, 'BUILDING'),
            (900002, 'Customer#900002', 1, -999.99, 'MACHINERY')
          ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: the zero vector (norm 0 — the cosine edge case) and a
    # constant vector, dimension-matched to the fixture.
    (dim,) = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{SRC}/embeddings.parquet'
          UNION ALL
          SELECT 900001, CAST([0.0 FOR i IN range({dim})] AS FLOAT[]), 0
          UNION ALL
          SELECT 900002, CAST([0.5 FOR i IN range({dim})] AS FLOAT[]), 1
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


# Fact tables emptied / reduced for the degenerate-cardinality variants;
# region + nation stay populated (structural enums every engine assumes).
_FACTS = ("documents", "events", "embeddings", "orders", "lineitem",
          "customer", "supplier", "part")
_KEEP = ("region", "nation")


def build_cardinality(dst: str, limit_sql: str) -> None:
    """A fixture where every FACT table is reduced by ``limit_sql``
    (``WHERE 1=0`` → empty; ``ORDER BY 1 LIMIT 1`` → single-row): the
    degenerate-cardinality axes (r4 verdict item 8). Schemas unchanged."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for tbl in _KEEP:
        shutil.copy(os.path.join(SRC, f"{tbl}.parquet"), os.path.join(dst, f"{tbl}.parquet"))
    for tbl in _FACTS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet' {limit_sql}) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )


def run_variant(spark, fixture_dir: str) -> tuple[dict, list]:
    from bishe_gpu_database_spark.registry import REGISTRY
    from tests.conftest import compare_query_to_oracle

    results, failures = {}, []
    for name, spec in sorted(REGISTRY.items()):
        try:
            if spec.oracle is None:
                n = spec.fn(spark, fixture_dir).count()
                ok, msg = True, f"rows-only ({n})"
            else:
                ok, msg = compare_query_to_oracle(
                    spark, fixture_dir, name, spec.fn, spec.oracle
                )
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:200]}"
        results[name] = {"ok": ok, "detail": None if ok else msg}
        if not ok:
            failures.append(name)
            print(f"FAIL {name}: {msg}", flush=True)
    return results, failures


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(_REPO, "PERTURBED_PARITY.json")
    )
    scratch = os.path.join(tempfile.gettempdir(), "bishe_spark_scratch")
    variants = {
        "perturbed": (build_perturbed, None),
        "single_row": (build_cardinality, "ORDER BY 1 LIMIT 1"),
        "empty": (build_cardinality, "WHERE 1=0"),
    }
    only = os.environ.get("SPARK_GRAFT_PERTURB_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}

    from bishe_gpu_database_spark.registry import _ensure_loaded
    from bishe_gpu_database_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("perturbed_parity")
    summary = {
        "perturbations": "empty/ws-only/letter-less/single-char/repetitive/"
        "punct-only/unicode-multibyte/NULL docs; dup-(type,ts) + zero-value"
        " + purchase-before-signup events; zero/negative balances; zero + "
        "constant vectors; plus whole-fixture single-row and empty "
        "fact-table variants (r5)",
        "variants": {},
    }
    total_fail = 0
    for vname, (builder, arg) in variants.items():
        dst = os.path.join(scratch, f"sf_{vname}")
        shutil.rmtree(dst, ignore_errors=True)
        builder(dst) if arg is None else builder(dst, arg)
        # Several sources/formats.py queries cache a derived copy of the
        # fixture (JSON/CSV/ORC/XML re-encodes, sink layouts) in scratch
        # keyed by the fixture dir's BASENAME — rebuilding the fixture
        # with new perturbation axes leaves those caches STALE (r7: the
        # new timestamp-edge events were invisible to the cached
        # corrupt-JSON copy from an earlier run of this very sweep).
        # Purge every cache derived from this basename before running.
        base = os.path.basename(dst.rstrip("/"))
        for cached in glob.glob(os.path.join(scratch, f"*_{base}")):
            if os.path.abspath(cached) != os.path.abspath(dst):
                shutil.rmtree(cached, ignore_errors=True)
        print(f"# {vname} fixture at {dst}", flush=True)
        results, failures = run_variant(spark, dst)
        total_fail += len(failures)
        summary["variants"][vname] = {
            "n_queries": len(results),
            "n_pass": len(results) - len(failures),
            "failures": {n: results[n]["detail"] for n in failures},
        }
        print(
            json.dumps({"variant": vname,
                        "n_pass": len(results) - len(failures),
                        "n_queries": len(results)}),
            flush=True,
        )
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"total failures across variants: {total_fail}", flush=True)
    return 1 if total_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
