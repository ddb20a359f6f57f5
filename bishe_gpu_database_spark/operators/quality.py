"""Data-quality operators: constraint auditing and column profiling —
the validation pass a training-data pipeline runs before anything else
consumes a drop of data.

The reference engine validates nothing (values are generated in-range by
construction, src/database/ycsb/Transction_y.h:17-26); these are part of
the driver-mandated pipeline extension. Both operators fuse all checks
for a table into ONE conditional-aggregation scan (plus one anti-join
per referential check) — at 100 TB you pay a single pass per table, not
a pass per rule — and unpivot the one-row result with ``stack`` so the
report is rows of (check, n_checked, n_violations).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.registry import register


def _viol(cond) -> F.Column:
    """Count rows violating (i.e. failing) the asserted condition.
    coalesce: SUM over an EMPTY table is NULL while the oracle's
    subquery count(*) is 0 — zero violations either way (r5 empty axis)."""
    return F.coalesce(F.sum(F.when(~cond, 1).otherwise(0)), F.lit(0)).cast("long")


@register(
    "quality_constraint_audit",
    oracle="""
    SELECT 'lineitem_discount_in_range' AS check_name,
           (SELECT count(*) FROM lineitem) AS n_checked,
           (SELECT count(*) FROM lineitem
             WHERE NOT (l_discount BETWEEN 0 AND 0.1)) AS n_violations
    UNION ALL
    SELECT 'lineitem_qty_in_range',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
             WHERE NOT (l_quantity BETWEEN 1 AND 50))
    UNION ALL
    SELECT 'lineitem_ship_after_order',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l JOIN orders o
               ON l.l_orderkey = o.o_orderkey
             WHERE l.l_shipdate < o.o_orderdate)
    UNION ALL
    SELECT 'lineitem_order_exists',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_customer_exists',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events_value_positive',
           (SELECT count(*) FROM events),
           (SELECT count(*) FROM events WHERE NOT (value > 0))
    """,
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: domain checks (range), order checks (ship date
    after order date), and referential checks (every lineitem's order,
    every order's customer exists). Domain checks for one table fuse into
    a single conditional-agg scan; referential checks are broadcast/
    shuffled anti-join counts; the date-order check rides the fact-fact
    join. Violations are COUNTED, not dropped — the audit is a gate, the
    fix is a policy decision downstream."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    ev = t(spark, sf_dir, "events")
    cu = t(spark, sf_dir, "customer")

    # One LEFT JOIN of the fact table against its dimension carries BOTH
    # the order check and the referential check: a missing parent shows
    # up as NULLs on the right side, a broken ordering as a failed date
    # predicate — so all four lineitem checks ride one scan + one join,
    # and counts arrive in the same aggregate row (no scalar cross-join).
    li_checks = (
        li.join(od, li.l_orderkey == od.o_orderkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _viol(F.col("l_discount").between(0, 0.1)).alias("v_disc"),
            _viol(F.col("l_quantity").between(1, 50)).alias("v_qty"),
            _viol(
                F.col("o_orderkey").isNull() | ~(F.col("l_shipdate") < F.col("o_orderdate"))
            ).alias("v_ship"),
            _viol(F.col("o_orderkey").isNotNull()).alias("v_orphan"),
        )
        .select(
            F.expr(
                "stack(4, 'lineitem_discount_in_range', n, v_disc,"
                "         'lineitem_qty_in_range', n, v_qty,"
                "         'lineitem_ship_after_order', n, v_ship,"
                "         'lineitem_order_exists', n, v_orphan)"
                " AS (check_name, n_checked, n_violations)"
            )
        )
    )
    od_checks = (
        od.join(cu, od.o_custkey == cu.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _viol(F.col("c_custkey").isNotNull()).alias("v_orphan"),
        )
        .select(
            F.lit("orders_customer_exists").alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("v_orphan").alias("n_violations"),
        )
    )
    ev_checks = ev.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("value") > 0).alias("v_pos"),
    ).select(
        F.lit("events_value_positive").alias("check_name"),
        F.col("n").alias("n_checked"),
        F.col("v_pos").alias("n_violations"),
    )
    return reduce(lambda a, b: a.unionByName(b), [li_checks, od_checks, ev_checks])


@register(
    "quality_profile_documents",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(doc_id) AS nn_doc_id,  count(DISTINCT doc_id) AS nd_doc_id,
             count(lang) AS nn_lang,      count(DISTINCT lang) AS nd_lang,
             count(source) AS nn_source,  count(DISTINCT source) AS nd_source,
             count(n_chars) AS nn_n_chars, count(DISTINCT n_chars) AS nd_n_chars
      FROM documents
    )
    SELECT 'doc_id' AS column_name, n_rows, n_rows - nn_doc_id AS n_null,
           nd_doc_id AS n_distinct FROM s
    UNION ALL SELECT 'lang', n_rows, n_rows - nn_lang, nd_lang FROM s
    UNION ALL SELECT 'source', n_rows, n_rows - nn_source, nd_source FROM s
    UNION ALL SELECT 'n_chars', n_rows, n_rows - nn_n_chars, nd_n_chars FROM s
    """,
)
def quality_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the `dbt`-style schema report): per column, row
    count, null count, exact distinct count — all columns in ONE scan via
    multi-distinct conditional aggregation (Catalyst expands it to a
    single Expand + two-level aggregate; still one pass over storage).
    For 100 TB profiling you'd swap exact distinct for HLL
    (approx_count_distinct) — the exact form is kept here because the
    oracle can check it bit-for-bit."""
    d = t(spark, sf_dir, "documents")
    s = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("doc_id").alias("nn_doc_id"),
        F.count_distinct("doc_id").alias("nd_doc_id"),
        F.count("lang").alias("nn_lang"),
        F.count_distinct("lang").alias("nd_lang"),
        F.count("source").alias("nn_source"),
        F.count_distinct("source").alias("nd_source"),
        F.count("n_chars").alias("nn_n_chars"),
        F.count_distinct("n_chars").alias("nd_n_chars"),
    )
    return s.select(
        F.expr(
            "stack(4,"
            " 'doc_id',  n_rows, n_rows - nn_doc_id,  nd_doc_id,"
            " 'lang',    n_rows, n_rows - nn_lang,    nd_lang,"
            " 'source',  n_rows, n_rows - nn_source,  nd_source,"
            " 'n_chars', n_rows, n_rows - nn_n_chars, nd_n_chars)"
            " AS (column_name, n_rows, n_null, n_distinct)"
        )
    )


@register(
    "quality_drift_ppm",
    oracle="""
    WITH med AS (
      SELECT median(epoch_us(ts)) AS m FROM events
    ),
    halves AS (
      SELECT event_type,
             count(CASE WHEN epoch_us(ts) <  m THEN 1 END) AS n_early,
             count(CASE WHEN epoch_us(ts) >= m THEN 1 END) AS n_late
      FROM events, med GROUP BY event_type
    ),
    tot AS (
      SELECT sum(n_early) AS te, sum(n_late) AS tl FROM halves
    )
    SELECT event_type, n_early, n_late,
           CAST(CAST(n_early AS HUGEINT) * 1000000 // nullif(te, 0) AS BIGINT)
             AS early_ppm,
           CAST(CAST(n_late AS HUGEINT) * 1000000 // nullif(tl, 0) AS BIGINT)
             AS late_ppm,
           abs(CAST(CAST(n_early AS HUGEINT) * 1000000 // nullif(te, 0) AS BIGINT)
               - CAST(CAST(n_late AS HUGEINT) * 1000000 // nullif(tl, 0) AS BIGINT))
             AS drift_ppm
    FROM halves, tot
    """,
)
def quality_drift_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset drift detection: per-category frequency shift between the
    early and late halves of the stream (split at the median event
    micro-timestamp), in integer parts-per-million — the monitoring primitive that catches a
    source changing under a training pipeline. One conditional-agg scan
    builds both halves' counts; the totals ride a 1-row broadcast cross
    join; integer ppm (floor division) keeps the oracle hash bit-exact
    where float proportions would drift. At 100 TB the same shape compares
    any two snapshots/partitions without a shuffle of raw rows."""
    e = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    med = e.select(F.median(us).alias("m"))
    halves = (
        e.join(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.when(us < F.col("m"), 1)).alias("n_early"),
            F.count(F.when(us >= F.col("m"), 1)).alias("n_late"),
        )
    )
    tot = halves.agg(
        F.sum("n_early").alias("te"), F.sum("n_late").alias("tl")
    )
    j = halves.join(F.broadcast(tot))
    # DECIMAL(38,0): count·10⁶ wraps int64 past ~9.2·10¹² rows per type;
    # nullif: an all-early (or all-late) stream has a zero half total —
    # NULL share, not a DIVIDE_BY_ZERO kill (r5 single-row fixture axis)
    early_ppm = F.expr(
        "CAST(CAST(n_early AS DECIMAL(38,0)) * 1000000 DIV nullif(te, 0) AS BIGINT)"
    )
    late_ppm = F.expr(
        "CAST(CAST(n_late AS DECIMAL(38,0)) * 1000000 DIV nullif(tl, 0) AS BIGINT)"
    )
    return j.select(
        "event_type",
        "n_early",
        "n_late",
        early_ppm.alias("early_ppm"),
        late_ppm.alias("late_ppm"),
        F.abs(early_ppm - late_ppm).alias("drift_ppm"),
    )


@register(
    "agg_freq_items",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN l_linenumber = 1 THEN -1
                  ELSE l_orderkey % 4096 END AS bucket
      FROM lineitem
    ),
    hh AS (
      SELECT bucket FROM b
      GROUP BY bucket
      HAVING count(*) * 100 > (SELECT count(*) FROM b)
    )
    SELECT (SELECT count(*) FROM hh) AS n_true_heavy,
           TRUE AS all_true_found,
           TRUE AS candidates_bounded
    """,
)
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters over a 1%-support threshold via
    ``DataFrame.freqItems`` (Karp/Shenker/Papadimitriou counter sketch):
    single pass, fixed memory, partition-mergeable — the streaming-
    friendly complement to exact groupBy counts when the key domain is
    huge. The candidate list itself is sketch-dependent (over-reporting
    is allowed), so the query hash-gates the two GUARANTEES instead:
    ``all_true_found`` — every exactly->1% item is in the candidate list
    (the sketch's no-false-negative contract) — and
    ``candidates_bounded`` — at most 1/support candidates — plus the
    exact heavy-hitter count, with the oracle asserting both booleans
    TRUE. Exact side is one hash aggregate; the candidate array is a
    1-row broadcast."""
    # Hot head + long tail: line 1 of every order folds to bucket -1
    # (~25% of rows — the one true heavy hitter); the rest spread over
    # ~4096 cold buckets of <0.1% each.
    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") == 1, F.lit(-1))
        .otherwise(F.col("l_orderkey") % 4096)
        .alias("bucket")
    )
    cand = li.freqItems(["bucket"], support=0.01).select(
        F.col("bucket_freqItems").alias("cands")
    )
    counts = li.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n")).select("n")
    hh = counts.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * 100 > F.col("n")
    )
    return (
        hh.crossJoin(F.broadcast(cand))
        .agg(
            F.count(F.lit(1)).alias("n_true_heavy"),
            F.coalesce(
                F.bool_and(F.array_contains(F.col("cands"), F.col("bucket"))),
                F.lit(True),
            ).alias("all_true_found"),
            F.coalesce(F.bool_and(F.size("cands") <= F.lit(100)), F.lit(True)).alias(
                "candidates_bounded"
            ),
        )
    )


@register(
    "quality_mad_outlier_bounds",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    med AS (
      SELECT event_type, median(cents) AS med_cents FROM c GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, abs(c.cents - m.med_cents) AS adev
      FROM c JOIN med m ON c.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY event_type
    )
    SELECT m.event_type, m.med_cents, d.mad_cents,
           m.med_cents - 3 * d.mad_cents AS lo_bound,
           m.med_cents + 3 * d.mad_cents AS hi_bound
    FROM med m JOIN mad d ON m.event_type = d.event_type
    """,
)
def quality_mad_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier bounds per event type: median ± 3·MAD (median
    absolute deviation) — the monitoring primitive that, unlike the
    z-score's mean/stddev, a single corrupt batch cannot drag. Two-level
    exact medians: per-type median (tiny result, broadcast back onto the
    stream of deviations), then the median of |x − med|. Both engines
    interpolate even-count medians identically on exact integer cents
    (the same semantics agg_percentile_exact gates), so the bounds hash
    bit-for-bit. At 100 TB exact medians are sort-bound per group;
    approx_percentile is the documented swap, same plan shape."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("med_cents")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            "med_cents",
            "mad_cents",
            (F.col("med_cents") - 3 * F.col("mad_cents")).alias("lo_bound"),
            (F.col("med_cents") + 3 * F.col("mad_cents")).alias("hi_bound"),
        )
    )


@register(
    "quality_k_anonymity",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, class_size,
           class_size >= 5 AS meets_k5,
           CAST(1000000 // class_size AS BIGINT) AS reident_risk_ppm
    FROM classes
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): every equivalence class with its size, a
    k=5 compliance flag, and the re-identification risk 1/size in integer
    ppm — the data-governance gate a training corpus must pass before
    release. One hash aggregate, partial-combined map-side; the class
    table is QI-cardinality-sized (tiny) no matter the row count. At
    100 TB the remediation loop (generalize a QI level, re-audit) re-runs
    this same aggregate per ladder rung — each rung only COARSENS keys,
    so rung N+1 can fold rung N's output instead of rescanning."""
    c = t(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return classes.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        (F.col("class_size") >= 5).alias("meets_k5"),
        F.expr("CAST(1000000 DIV class_size AS BIGINT)").alias("reident_risk_ppm"),
    )


@register(
    "quality_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
               AS lead_digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT lead_digit, count(*) AS n,
           CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT) AS share_ppm
    FROM digits GROUP BY lead_digit
    """,
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: leading-significant-digit distribution of
    order totals in integer ppm — the classic fraud/synthetic-data smell
    test (natural multiplicative amounts lean on digit 1 at ~30%; flat or
    spiky distributions flag generated or tampered batches). The digit
    comes from the exact integer-cents rendering — never from float
    formatting, which differs across engines — and the whole audit is one
    map-combined aggregate plus a 9-row window, so at 100 TB it rides
    along any scan for free. Downstream: compare share_ppm against the
    log10(1+1/d) profile per ingest source and alert on divergence."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        ).alias("lead_digit")
    )
    counts = digits.groupBy("lead_digit").agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "lead_digit",
        "n",
        F.expr("CAST(n * 1000000 DIV sum(n) OVER () AS BIGINT)").alias("share_ppm"),
    )


@register(
    "governance_forget_users",
    oracle="""
    WITH doomed AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(('0x' || substr(md5('erase|' || user_id), 1, 12)) AS BIGINT) % 11 = 0
    )
    SELECT 'events' AS table_name,
           count(*) AS rows_before,
           count(*) FILTER (WHERE user_id IN (SELECT user_id FROM doomed))
             AS rows_purged,
           count(*) FILTER (WHERE user_id NOT IN (SELECT user_id FROM doomed))
             AS rows_after
    FROM events
    UNION ALL
    SELECT 'orders' AS table_name,
           count(*) AS rows_before,
           count(*) FILTER (WHERE o_custkey IN (SELECT user_id FROM doomed))
             AS rows_purged,
           count(*) FILTER (WHERE o_custkey NOT IN (SELECT user_id FROM doomed))
             AS rows_after
    FROM orders
    """,
)
def governance_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge audit: a deterministic erasure cohort
    (portable-hash stand-in for a deletion-request table) is propagated
    across every table keyed by the user, and the audit reports
    before/purged/after counts per table — the receipt a GDPR/CCPA
    pipeline must produce. The purge itself is a broadcast anti-join per
    fact table (the cohort is request-sized, never data-sized), so at
    100 TB each table pays one pruned scan and zero shuffles; the
    conditional counts here fuse both sides of the anti-join into one
    aggregate per table. Deletion is an explicit stub in the reference
    (HashTable::_delete, src/cuda/hashTable.cuh:112-114) — this is that
    operator made real, set-oriented, and auditable."""
    from bishe_gpu_database_spark.functions.text import h48

    ev = t(spark, sf_dir, "events")
    doomed = (
        ev.select("user_id")
        .distinct()
        .filter(h48(F.concat(F.lit("erase|"), F.col("user_id").cast("string"))) % 11 == 0)
    )

    def audit(df, key, name):
        # one scan: membership flag via left join on the broadcast
        # cohort, then conditional counts cover both sides of the purge
        d = df.join(
            F.broadcast(doomed.select(F.col("user_id").alias(key), F.lit(1).alias("_doom"))),
            key,
            "left",
        )
        return d.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("rows_before"),
            F.count("_doom").alias("rows_purged"),
            F.count(F.when(F.col("_doom").isNull(), 1)).alias("rows_after"),
        )

    return audit(ev, "user_id", "events").unionByName(
        audit(t(spark, sf_dir, "orders"), "o_custkey", "orders")
    )


@register(
    "governance_masked_view",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 2) || repeat('*', greatest(length(c_name) - 2, 0))
             AS name_masked,
           CASE WHEN c_acctbal < 0 THEN 'NEGATIVE' ELSE 'OK' END AS balance_band,
           c_mktsegment
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    """,
)
def governance_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security + column masking as a governed view: the
    analyst tenant sees only region-1 customers (row filter via a
    broadcast semi join on the dimension chain) and never raw PII —
    names are prefix-masked, balances banded. Both policies compile into
    the scan: the row predicate prunes via DPP/pushdown and the masks
    are per-row projections, so the governed view costs the same as the
    raw one at 100 TB — governance as a plan property, not a
    post-filter. (Engines ship this as CREATE VIEW + policy DDL; the
    view body IS this plan either way.) No access-control surface exists
    in the reference (single-tenant in-process store)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        c.join(
            F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"))),
            "c_nationkey",
            "left_semi",
        )
        .select(
            "c_custkey",
            F.concat(
                F.substring("c_name", 1, 2),
                F.expr("repeat('*', greatest(length(c_name) - 2, 0))"),
            ).alias("name_masked"),
            F.when(F.col("c_acctbal") < 0, "NEGATIVE").otherwise("OK").alias("balance_band"),
            "c_mktsegment",
        )
    )


@register(
    "quality_table_checksum",
    oracle="""
    WITH ev AS (
      SELECT CAST(('0x' || substr(md5(
               coalesce(CAST(event_id AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(epoch_us(ts) AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(user_id AS VARCHAR), '<null>') || '|' ||
               coalesce(event_type, '<null>') || '|' ||
               coalesce(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), '<null>') || '|' ||
               coalesce(props, '<null>')), 1, 12)) AS BIGINT) AS h
      FROM events
    ),
    od AS (
      SELECT CAST(('0x' || substr(md5(
               coalesce(CAST(o_orderkey AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(o_custkey AS VARCHAR), '<null>') || '|' ||
               coalesce(o_orderstatus, '<null>') || '|' ||
               coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), '<null>') || '|' ||
               coalesce(CAST(epoch_us(o_orderdate) AS VARCHAR), '<null>') || '|' ||
               coalesce(o_orderpriority, '<null>')), 1, 12)) AS BIGINT) AS h
      FROM orders
    )
    SELECT 'events' AS table_name, count(*) AS n_rows,
           bit_xor(h) AS xor48,
           CAST(sum(CAST(h AS HUGEINT)) % 9007199254740997 AS BIGINT) AS sum_mod
    FROM ev
    UNION ALL
    SELECT 'orders' AS table_name, count(*) AS n_rows,
           bit_xor(h) AS xor48,
           CAST(sum(CAST(h AS HUGEINT)) % 9007199254740997 AS BIGINT) AS sum_mod
    FROM od
    """,
)
def quality_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum: every row canonicalizes to a
    48-bit portable digest (timestamps as epoch-µs, money as integer
    cents, every nullable field coalesced to an explicit '<null>' token
    so NULLs neither shift fields nor null the digest — no float or
    locale formatting in the hash input), folded with XOR plus a modular sum. XOR alone
    misses duplicated-pair corruption (x⊕x=0), the modular sum catches
    it; together with the count they form a commutative fingerprint that
    is identical under ANY row order or partitioning — so two replicas,
    or a table before and after a migration, compare with one aggregate
    each and zero data movement beyond a handful of partials. This is
    the anti-entropy / backup-verification primitive every 100 TB store
    needs; both folds are map-side combinable, the shuffle carries one
    triple per partition. (The reference's integrity story is a row
    count, src/database/ycsb/db.h:73-76.)"""
    from bishe_gpu_database_spark.functions.text import h48

    e = t(spark, sf_dir, "events")
    o = t(spark, sf_dir, "orders")
    return checksum_fold(e, events_row_digest(), "events").unionByName(
        checksum_fold(o, orders_row_digest(), "orders")
    )


def _canon(c) -> F.Column:
    """NULL-safe string canonicalization for digest input: concat_ws
    silently DROPS null fields (separator too) — two rows differing only
    in a null-vs-adjacent-field shift would collide — and the oracle's
    || would instead null the whole hash. Every field is coalesced to an
    explicit '<null>' token BEFORE joining, identically on both engines."""
    return F.coalesce(c.cast("string"), F.lit("<null>"))


def events_row_digest() -> F.Column:
    from bishe_gpu_database_spark.functions.text import h48

    return h48(
        F.concat_ws(
            "|",
            _canon(F.col("event_id")),
            _canon(F.unix_micros("ts")),
            _canon(F.col("user_id")),
            _canon(F.col("event_type")),
            _canon(F.round(F.col("value") * 100).cast("bigint")),
            _canon(F.col("props")),
        )
    )


def orders_row_digest() -> F.Column:
    from bishe_gpu_database_spark.functions.text import h48

    return h48(
        F.concat_ws(
            "|",
            _canon(F.col("o_orderkey")),
            _canon(F.col("o_custkey")),
            _canon(F.col("o_orderstatus")),
            _canon(F.round(F.col("o_totalprice") * 100).cast("bigint")),
            _canon(F.unix_micros("o_orderdate")),
            _canon(F.col("o_orderpriority")),
        )
    )


def checksum_fold(df: DataFrame, h: F.Column, name: str) -> DataFrame:
    return df.select(h.alias("h")).agg(
        F.lit(name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").alias("xor48"),
        # DECIMAL/HUGEINT sum: 48-bit digests summed over >2^15 rows wrap
        # int64 — Spark would wrap silently while DuckDB promotes.
        F.expr(
            "CAST(sum(CAST(h AS DECIMAL(38,0))) % 9007199254740997 AS BIGINT)"
        ).alias("sum_mod"),
    )


@register(
    "quality_fd_discovery",
    oracle="""
    WITH fds AS (
      SELECT 'c_custkey->c_mktsegment' AS fd,
             count(*) AS n_lhs,
             count(*) FILTER (WHERE n_rhs > 1) AS n_violations
      FROM (SELECT c_custkey, count(DISTINCT c_mktsegment) AS n_rhs
            FROM customer GROUP BY c_custkey)
      UNION ALL
      SELECT 'c_nationkey->c_mktsegment' AS fd,
             count(*) AS n_lhs,
             count(*) FILTER (WHERE n_rhs > 1) AS n_violations
      FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_rhs
            FROM customer GROUP BY c_nationkey)
      UNION ALL
      SELECT 'o_custkey->o_orderpriority' AS fd,
             count(*) AS n_lhs,
             count(*) FILTER (WHERE n_rhs > 1) AS n_violations
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_rhs
            FROM orders GROUP BY o_custkey)
    )
    SELECT fd, n_lhs, n_violations, (n_violations = 0) AS holds
    FROM fds
    """,
)
def quality_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/audit (the schema-profiling
    primitive behind normalization advice, join-key validation, and
    dedup-key selection): for each candidate FD lhs→rhs, count the lhs
    groups whose rhs is not single-valued. Each check is one hash
    aggregate to (lhs, distinct-rhs-count) — map-side combinable, output
    dimension-sized — followed by a 1-row rollup; candidate FDs share a
    table's scan via the union. A key-like lhs (c_custkey) trivially
    holds; a coarse lhs (c_nationkey) reports exactly how broken the
    dependency is, which is the statistic a profiler ranks candidates
    by. At 100 TB nothing but (lhs, n_rhs) pairs ever shuffles. Schema
    inference is absent from the reference (schemas are compile-time
    templates, src/database/ycsb/db.h:32); driver-mandated profiling."""

    def check(df, lhs: str, rhs: str, label: str) -> DataFrame:
        per_lhs = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("n_rhs"))
        return per_lhs.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.count(F.when(F.col("n_rhs") > 1, 1)).alias("n_violations"),
        ).select("fd", "n_lhs", "n_violations", (F.col("n_violations") == 0).alias("holds"))

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        check(c, "c_custkey", "c_mktsegment", "c_custkey->c_mktsegment")
        .unionByName(check(c, "c_nationkey", "c_mktsegment", "c_nationkey->c_mktsegment"))
        .unionByName(check(o, "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority"))
    )


@register(
    "quality_sequence_gaps",
    oracle="""
    WITH bounds AS (
      SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem
    ),
    domain AS (
      SELECT unnest(generate_series(lo // 1000, hi // 1000)) AS bucket, lo, hi
      FROM bounds
    ),
    buckets AS (
      SELECT l_orderkey // 1000 AS bucket,
             count(DISTINCT l_orderkey) AS present
      FROM lineitem GROUP BY 1
    )
    SELECT d.bucket,
           least((d.bucket + 1) * 1000 - 1, d.hi)
             - greatest(d.bucket * 1000, d.lo) + 1 AS expected,
           coalesce(b.present, 0) AS present,
           least((d.bucket + 1) * 1000 - 1, d.hi)
             - greatest(d.bucket * 1000, d.lo) + 1 - coalesce(b.present, 0) AS missing
    FROM domain d LEFT JOIN buckets b USING (bucket)
    WHERE least((d.bucket + 1) * 1000 - 1, d.hi)
          - greatest(d.bucket * 1000, d.lo) + 1 - coalesce(b.present, 0) > 0
    """,
)
def quality_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit (ledger/invoice integrity: 'which
    order numbers are missing?'): the key space splits into fixed
    1000-wide buckets, each bucket's expected population comes from
    arithmetic against the global [min, max] span (a 1-row broadcast),
    and present-vs-expected flags every bucket with holes. No global
    sort and no lag() chain over the data — the classic gap-and-island
    window needs a total order, which at 100 TB means a range
    repartition; the bucket formulation gets the same audit from ONE
    hash aggregate whose output is span/1000 rows, embarrassingly
    parallel, with gaps localized to a bucket for follow-up. The bucket
    DOMAIN is generated from the span (sequence(lo DIV 1000, hi DIV 1000)
    exploded off the 1-row bounds) and LEFT-joined with the present
    counts, so a fully-empty bucket — the largest gap class the audit
    exists to catch — surfaces with missing = bucket width instead of
    silently producing no row (the ADVICE.md r2 blind spot). The domain
    explode is span/1000 rows off one array; for key spans past ~1e11,
    shard the sequence into chunks of 1e6 buckets first. (The audit
    runs on lineitem.l_orderkey, whose key space has real holes in the
    fixture — order keys that placed no line items.) Sequence integrity is
    absent from the reference (keys are assumed dense, src/database/
    ycsb/db.h:42-53); driver-mandated data-quality surface."""
    li = t(spark, sf_dir, "lineitem")
    bounds = li.agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
    domain = bounds.select(
        F.explode(F.sequence(F.expr("lo DIV 1000"), F.expr("hi DIV 1000"))).alias("bucket"),
        "lo",
        "hi",
    )
    buckets = li.groupBy(F.expr("l_orderkey DIV 1000").alias("bucket")).agg(
        F.count_distinct("l_orderkey").alias("present")
    )
    j = domain.join(buckets, "bucket", "left")
    expected = (
        F.least((F.col("bucket") + 1) * 1000 - 1, F.col("hi"))
        - F.greatest(F.col("bucket") * 1000, F.col("lo"))
        + 1
    )
    present = F.coalesce(F.col("present"), F.lit(0).cast("bigint"))
    return (
        j.select(
            "bucket",
            expected.alias("expected"),
            present.alias("present"),
            (expected - present).alias("missing"),
        )
        .filter(F.col("missing") > 0)
    )


@register(
    "quality_impute_median",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN event_id % 19 = 7 THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(round(median(cents)) AS BIGINT) AS med_cents
      FROM c WHERE cents IS NOT NULL GROUP BY event_type
    )
    SELECT c.event_type,
           count(*) AS n_rows,
           count(CASE WHEN c.cents IS NULL THEN 1 END) AS n_imputed,
           m.med_cents,
           SUM(COALESCE(c.cents, m.med_cents)) AS sum_after_impute
    FROM c JOIN med m ON c.event_type = m.event_type
    GROUP BY c.event_type, m.med_cents
    """,
)
def quality_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation by per-group exact median — the feature-
    pipeline repair step. Missingness is simulated deterministically
    (every event with event_id % 19 == 7 loses its value) so the oracle
    reproduces the exact same holes. Two passes over the dimension-keyed
    aggregate: the per-type median of the NON-null population (tiny
    result, broadcast back), then one conditional-sum scan proving the
    imputed column's exact integer total. The median rounds to integer
    cents BEFORE imputation on both engines, so the filled values — not
    just the counts — are bit-identical. At 100 TB this is one broadcast
    join over the fact scan; the exact median is the sort-bound step and
    approx_percentile is the documented swap at identical plan shape."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 19 == 7, F.lit(None))
        .otherwise(F.round(F.col("value") * 100).cast("bigint"))
        .alias("cents"),
    )
    med = (
        ev.filter(F.col("cents").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(cents, 0.5)")).cast("bigint").alias("med_cents"))
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med_cents")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("cents").isNull(), 1)).alias("n_imputed"),
            F.sum(F.coalesce(F.col("cents"), F.col("med_cents"))).alias(
                "sum_after_impute"
            ),
        )
        .select(
            "event_type", "n_rows", "n_imputed", "med_cents", "sum_after_impute"
        )
    )


@register(
    "governance_l_diversity",
    oracle="""
    WITH cls AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             count(*) AS class_size,
             count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 200000)
               AS l_distinct
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT nation, segment, class_size, l_distinct,
           (l_distinct >= 3) AS satisfies_l3
    FROM cls
    """,
)
def governance_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. '07) — the governance
    gate k-anonymity (``quality_k_anonymity``) cannot provide: a
    quasi-identifier class can be large (k-anonymous) yet expose its
    members if the SENSITIVE attribute is homogeneous inside it. Per
    (nation, segment) class this counts distinct sensitive values
    (account-balance $2000 band) and flags classes below l=3 — the
    homogeneity-attack check run before any pseudonymized release. One
    hash aggregate over the quasi-identifier key (count + distinct-count
    fuse into the same shuffle); at 100 TB this is exactly the
    k-anonymity pass with one more aggregate expression, so auditing
    both properties costs one scan total."""
    c = t(spark, sf_dir, "customer")
    cls = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 200000")
        ).alias("l_distinct"),
    )
    return cls.select(
        "nation",
        "segment",
        "class_size",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("satisfies_l3"),
    )
