"""Semantic invariants for the round-2 operators beyond oracle parity:
span-dedup global uniqueness + pigeonhole, linear-interpolation
value bounds and exact-hit degeneration, classifier-score recomputation,
association-rule probability bounds, k-anonymity totals, and
inverted-index posting-head consistency.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.dedup import dedup_span_level
from bishe_gpu_database_spark.operators.mining import mining_assoc_rules
from bishe_gpu_database_spark.operators.pipeline import pipeline_inverted_index
from bishe_gpu_database_spark.operators.quality import quality_k_anonymity
from bishe_gpu_database_spark.operators.relational import t
from bishe_gpu_database_spark.operators.text_analysis import text_classifier_score
from bishe_gpu_database_spark.operators.timeseries import timeseries_interpolate_linear
from tests.conftest import SF_SMALL


def test_span_dedup_totals_and_bounds(spark):
    """Every doc keeps between 0 and all of its spans; globally, the
    number of KEPT spans equals the number of DISTINCT span fingerprints
    (first-occurrence semantics keep exactly one copy of each)."""
    out = dedup_span_level(spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_spans"]
        assert r["kept_ppm"] == r["n_kept"] * 1_000_000 // r["n_spans"]
    # recompute the distinct-span count independently
    docs = t(spark, SF_SMALL, "documents")
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ").alias("tk"),
    )
    n_spans_col = F.greatest(F.ceil(F.size("tk") / 10).cast("int"), F.lit(1))
    spans = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_spans_col),
                lambda i: F.concat_ws(" ", F.slice(F.col("tk"), (i - 1) * 10 + 1, 10)),
            )
        ).alias("span")
    )
    n_distinct = spans.distinct().count()
    assert sum(r["n_kept"] for r in out) == n_distinct


def test_interpolation_bounds_and_exact_hits(spark):
    """Each interpolated value lies within [min, max] of the user's event
    values, and a grid point that coincides with an event equals that
    event's value exactly."""
    out = timeseries_interpolate_linear(spark, SF_SMALL)
    ev = (
        t(spark, SF_SMALL, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            F.unix_micros("ts").alias("tsu"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("user_id", "tsu")
        .agg(F.min("cents").alias("cents"))
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    bad = (
        out.join(bounds, "user_id")
        .filter((F.col("interp_cents") < F.col("lo")) | (F.col("interp_cents") > F.col("hi")))
        .count()
    )
    assert bad == 0
    hits = (
        out.select("user_id", F.unix_micros("ts").alias("tsu"), "interp_cents")
        .join(ev, ["user_id", "tsu"])
    )
    assert hits.count() > 0  # the anchor point (first event) always hits
    assert hits.filter(F.col("interp_cents") != F.col("cents")).count() == 0


def test_classifier_score_matches_recomputation(spark):
    """The fold's integer score equals a per-token exploded recomputation
    through the same hash→bucket→weight chain."""
    out = text_classifier_score(spark, SF_SMALL)
    docs = t(spark, SF_SMALL, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("tk"),
    )
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit("qb|"), F.col("tk"))), 1, 12), 16, 10).cast(
        "bigint"
    ) % 64
    weight = (
        F.conv(F.substring(F.md5(F.concat(F.lit("qw|"), bucket.cast("string"))), 1, 12), 16, 10).cast(
            "bigint"
        )
        % 2001
        - 1000
    )
    recomputed = tok.select("doc_id", weight.alias("w")).groupBy("doc_id").agg(
        F.sum("w").alias("score2")
    )
    mism = out.join(recomputed, "doc_id").filter(F.col("score") != F.col("score2")).count()
    assert mism == 0


def test_assoc_rules_probability_bounds(spark):
    """Confidence ≤ 1; support(pair) ≤ min(support(a), support(b));
    output sorted by lift desc."""
    rows = mining_assoc_rules(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert 0 < r["conf_ppm"] <= 1_000_000
        assert r["n_ab"] >= 2


def test_k_anonymity_classes_partition_the_table(spark):
    """Class sizes sum to the table's row count; risk is exactly 1e6//size."""
    rows = quality_k_anonymity(spark, SF_SMALL).collect()
    n = t(spark, SF_SMALL, "customer").count()
    assert sum(r["class_size"] for r in rows) == n
    for r in rows:
        assert r["reident_risk_ppm"] == 1_000_000 // r["class_size"]
        assert r["meets_k5"] == (r["class_size"] >= 5)


def test_inverted_index_head_is_sorted_prefix(spark):
    """Posting head is ascending, unique, at most 10 long, and its length
    is min(df, 10)."""
    rows = pipeline_inverted_index(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings_head"].split(",")]
        assert ids == sorted(set(ids))
        assert len(ids) == min(r["df"], 10)


def test_skyline_is_mutually_nondominating_and_complete(spark):
    """No skyline member dominates another; every non-member is dominated
    by some member (the defining property, checked pairwise at sf0.001)."""
    from bishe_gpu_database_spark.operators.mining import skyline_pareto

    sky = skyline_pareto(spark, SF_SMALL).collect()
    assert sky
    part = t(spark, SF_SMALL, "part").select("p_partkey", "p_size", "p_retailprice").collect()

    def dominates(q, p):
        return (
            q["p_retailprice"] <= p["p_retailprice"]
            and q["p_size"] >= p["p_size"]
            and (q["p_retailprice"] < p["p_retailprice"] or q["p_size"] > p["p_size"])
        )

    for a in sky:
        assert not any(dominates(b, a) for b in sky if b["p_partkey"] != a["p_partkey"])
    sky_keys = {r["p_partkey"] for r in sky}
    for p in part:
        if p["p_partkey"] not in sky_keys:
            assert any(dominates(s, p) for s in sky), p


def test_concurrency_peak_bounds_and_witness(spark):
    """Peak is within [1, events-of-type]; at the reported peak_at,
    recounting open intervals directly reproduces the peak."""
    from bishe_gpu_database_spark.operators.timeseries import events_concurrency_sweep

    out = {r["event_type"]: r for r in events_concurrency_sweep(spark, SF_SMALL).collect()}
    ev = (
        t(spark, SF_SMALL, "events")
        .select("event_type", F.unix_micros("ts").alias("tsu"))
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["tsu"])
    assert set(out) == set(by_type)
    for etype, row in out.items():
        times = by_type[etype]
        assert 1 <= row["peak_concurrency"] <= len(times)
        at = row["peak_at"].timestamp() * 1_000_000
        open_now = sum(1 for s in times if s <= at < s + 300_000_000)
        assert round(open_now) == row["peak_concurrency"]


def test_ab_test_totals_and_rate_consistency(spark):
    """Arm sizes partition the user universe; conversion counts bound by
    arm sizes; ppm rates recompute from the counts."""
    from bishe_gpu_database_spark.operators.mining import events_ab_test

    r = events_ab_test(spark, SF_SMALL).collect()[0]
    n_users = t(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert r["n0"] + r["n1"] == n_users
    assert 0 <= r["c0"] <= r["n0"] and 0 <= r["c1"] <= r["n1"]
    assert r["rate0_ppm"] == r["c0"] * 1_000_000 // r["n0"]
    assert r["rate1_ppm"] == r["c1"] * 1_000_000 // r["n1"]


def test_keyset_page_equals_offset_page(spark):
    """The seek-predicate page must be exactly rows 101-150 of the global
    (o_orderdate, o_orderkey) order — keyset and OFFSET agree."""
    from bishe_gpu_database_spark.operators.relational import page_keyset

    got = [
        (r["o_orderdate"], r["o_orderkey"])
        for r in page_keyset(spark, SF_SMALL).collect()
    ]
    want = [
        (r["o_orderdate"], r["o_orderkey"])
        for r in t(spark, SF_SMALL, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(100)
        .limit(50)
        .collect()
    ]
    assert sorted(got) == want


def test_twap_bounded_by_value_range(spark):
    """A time-weighted average must lie within [min, max] of the user's
    observed cent values (weights are non-negative and sum to the span)."""
    from bishe_gpu_database_spark.operators.timeseries import timeseries_twap

    out = {r["user_id"]: r for r in timeseries_twap(spark, SF_SMALL).collect()}
    assert out
    bounds = {
        r["user_id"]: r
        for r in t(spark, SF_SMALL, "events")
        .select("user_id", F.round(F.col("value") * 100).cast("bigint").alias("cents"))
        .groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for uid, r in out.items():
        b = bounds[uid]
        assert b["lo"] - 1 <= r["twap_cents"] <= b["hi"]
        assert r["n_samples"] == b["n"]
        assert r["span_us"] > 0


def test_forget_users_audit_balances(spark):
    """Purge audit must balance: before = purged + after, per table, and
    the purge is non-trivial on events (the cohort comes from events)."""
    from bishe_gpu_database_spark.operators.quality import governance_forget_users

    rows = {r["table_name"]: r for r in governance_forget_users(spark, SF_SMALL).collect()}
    assert set(rows) == {"events", "orders"}
    for r in rows.values():
        assert r["rows_before"] == r["rows_purged"] + r["rows_after"]
    assert rows["events"]["rows_purged"] > 0


def test_masked_view_leaks_no_pii(spark):
    """Every masked name keeps exactly 2 plaintext chars; every returned
    customer belongs to region 1; banding covers all rows."""
    from bishe_gpu_database_spark.operators.quality import governance_masked_view

    out = governance_masked_view(spark, SF_SMALL).collect()
    assert out
    raw = {
        r["c_custkey"]: r
        for r in t(spark, SF_SMALL, "customer")
        .join(
            t(spark, SF_SMALL, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_regionkey")
        .collect()
    }
    for r in out:
        src = raw[r["c_custkey"]]
        assert src["n_regionkey"] == 1
        name = src["c_name"]
        assert r["name_masked"] == name[:2] + "*" * max(len(name) - 2, 0)
        assert r["balance_band"] in ("NEGATIVE", "OK")


def test_chi_square_margins_consistent(spark):
    """Cell counts must sum to n via both margins; terms are non-negative;
    recompute one cell's term from its margins."""
    from bishe_gpu_database_spark.operators.mining import mining_chi_square

    out = mining_chi_square(spark, SF_SMALL).collect()
    n_events = t(spark, SF_SMALL, "events").count()
    assert sum(r["o"] for r in out) == n_events
    for r in out:
        assert r["chi_term_ppm"] >= 0
        e_milli = max(r["r_tot"] * r["c_tot"] * 1000 // n_events, 1)
        d2 = r["o"] * 1000 - e_milli
        assert r["chi_term_ppm"] == d2 * d2 * 1000 // e_milli


def test_winsorize_clips_to_cuts(spark):
    """Winsorized values lie inside [lo, hi]; unclipped rows are
    untouched; roughly the right fraction clips (≤ ~12% for 5/95)."""
    from bishe_gpu_database_spark.operators.pipeline import pipeline_winsorize

    out = pipeline_winsorize(spark, SF_SMALL).collect()
    assert out
    n_clipped = sum(1 for r in out if r["clipped"])
    assert 0 < n_clipped <= len(out) * 0.15
    for r in out:
        if not r["clipped"]:
            assert r["n_chars_winsor"] == r["n_chars"]
    # winsorized mean moves toward the center: variance must not grow
    import statistics

    raw = [r["n_chars"] for r in out]
    wz = [r["n_chars_winsor"] for r in out]
    assert statistics.pvariance(wz) <= statistics.pvariance(raw)


def test_target_encoding_shrinks_toward_global(spark):
    """Every encoded value lies between its raw category mean and the
    global mean (shrinkage property), within integer-truncation slack."""
    from bishe_gpu_database_spark.operators.pipeline import feature_target_encoding

    rows = feature_target_encoding(spark, SF_SMALL).collect()
    assert len(rows) == 5
    tot = sum(r["raw_mean_cents"] * r["n_cat"] for r in rows)
    n = sum(r["n_cat"] for r in rows)
    gmean = tot // n
    for r in rows:
        lo, hi = sorted((r["raw_mean_cents"], gmean))
        assert lo - 2 <= r["encoded_cents"] <= hi + 2


def test_table_checksum_detects_tamper_and_ignores_order(spark):
    """The checksum triple must be invariant under repartitioning and
    row order, and must CHANGE when one row is altered."""
    from bishe_gpu_database_spark.operators.quality import (
        checksum_fold,
        events_row_digest,
        quality_table_checksum,
    )
    from bishe_gpu_database_spark.operators.relational import t as _t

    base = {r["table_name"]: r for r in quality_table_checksum(spark, SF_SMALL).collect()}

    def ev_fold(df):
        r = checksum_fold(df, events_row_digest(), "events").collect()[0]
        return (r["n_rows"], r["xor48"], r["sum_mod"])

    ev = _t(spark, SF_SMALL, "events")
    b = base["events"]
    assert ev_fold(ev) == (b["n_rows"], b["xor48"], b["sum_mod"])
    # genuinely different layout: scrambled partitioning AND row order
    shuffled = ev.repartition(7, "event_type").sortWithinPartitions(
        F.col("value").desc(), F.col("event_id").desc()
    )
    assert ev_fold(shuffled) == ev_fold(ev)
    # tamper: flip one row's event_type
    tampered = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") == 1, F.lit("__tampered__")).otherwise(
            F.col("event_type")
        ),
    )
    assert ev_fold(tampered) != ev_fold(ev)


def test_u_shaped_attribution_conserves_credit(spark):
    """Total credited ppm must equal 10^6 × (number of attributed
    purchases): per-purchase credit is conserved exactly despite
    truncated middle shares (remainder folds into the last touch)."""
    from bishe_gpu_database_spark.operators.timeseries import (
        events_attribution_u_shaped,
    )

    out = events_attribution_u_shaped(spark, SF_SMALL).collect()
    assert out
    total_credit = sum(r["credit_ppm"] for r in out)
    # independently count attributed purchases: purchases with ≥1
    # click/view by the same user in the preceding 30 minutes
    e = t(spark, SF_SMALL, "events").select("user_id", "event_id", "event_type", "ts")
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_id").alias("t_eid"), F.unix_micros("ts").alias("t_ts")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_eid"), F.unix_micros("ts").alias("p_ts")
    )
    # small-scale quadratic check is fine at sf0.001: each touch goes to
    # its NEAREST next purchase (≤30 min); count distinct assigned ones
    attributed = (
        touches.join(purch, "user_id")
        .filter(
            (F.col("t_ts") <= F.col("p_ts"))
            & (F.col("p_ts") - F.col("t_ts") <= 1_800_000_000)
        )
        .groupBy("user_id", "t_eid")
        .agg(F.min(F.struct("p_ts", "p_eid")).alias("np"))
        .select("user_id", F.col("np.p_eid").alias("p_eid"))
        .distinct()
        .count()
    )
    assert total_credit == attributed * 1_000_000


def test_equiheight_boundaries_monotone_and_balanced(spark):
    """Decile boundaries must be non-decreasing; each bucket holds
    between 0 and ~2×(k/10) rows (equal heights up to value ties)."""
    from bishe_gpu_database_spark.operators.relational import agg_hist_equiheight

    rows = agg_hist_equiheight(spark, SF_SMALL).collect()
    assert rows
    li = (
        t(spark, SF_SMALL, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(r["cents"])
    for r in rows:
        ds = [r[f"d{i}"] for i in range(1, 11)]
        assert ds == sorted(ds)
        vals = sorted(by_flag[r["l_returnflag"]])
        assert r["n_rows"] == len(vals)
        assert ds[-1] == vals[-1]
        # each boundary's rank is within one position of i*k/10
        for i, d in enumerate(ds[:-1], start=1):
            import bisect

            rank = bisect.bisect_left(vals, d) + 1
            assert rank * 10 >= i * len(vals)


def test_fd_discovery_key_holds_coarse_breaks(spark):
    """A key lhs must satisfy any FD; the coarse nationkey lhs must not
    (25 nations cannot determine 5 segments for 1500 customers)."""
    from bishe_gpu_database_spark.operators.quality import quality_fd_discovery

    out = {r["fd"]: r for r in quality_fd_discovery(spark, SF_SMALL).collect()}
    assert out["c_custkey->c_mktsegment"]["holds"]
    assert out["c_custkey->c_mktsegment"]["n_violations"] == 0
    assert not out["c_nationkey->c_mktsegment"]["holds"]
    assert out["c_nationkey->c_mktsegment"]["n_violations"] > 0


def test_shortest_cost_settles_to_cheapest_route(spark):
    """Source node costs 0; every reported cost must equal the true
    bounded-hop shortest path recomputed in Python over the edge list."""
    from bishe_gpu_database_spark.operators.graph import graph_shortest_cost_rcte

    out = {r["node"]: r["min_cost"] for r in graph_shortest_cost_rcte(spark, SF_SMALL).collect()}
    assert out.get("signup") == 0
    # rebuild edges
    e = t(spark, SF_SMALL, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    edges = {}
    for r in trans:
        edges.setdefault(r["src"], []).append((r["dst"], 1_000_000 // r["n"]))
    best = {"signup": 0}
    frontier = {"signup": 0}
    for _ in range(4):
        nxt = {}
        for node, cost in frontier.items():
            for dst, wgt in edges.get(node, []):
                c = cost + wgt
                if c < best.get(dst, float("inf")):
                    best[dst] = c
                    nxt[dst] = c
                elif c < nxt.get(dst, float("inf")) and c <= best.get(dst, float("inf")):
                    nxt[dst] = c
        frontier = nxt
    assert out == best


def test_mom_growth_recomputes_from_counts(spark):
    """growth_ppm must equal the truncated integer formula over the
    reported cents; first month per segment has NULL prev/growth."""
    from bishe_gpu_database_spark.operators.tpch_extra import mart_mom_growth

    rows = mart_mom_growth(spark, SF_SMALL).collect()
    assert rows
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(r)
    for seg, rs in by_seg.items():
        rs.sort(key=lambda r: r["month"])
        assert rs[0]["prev_cents"] is None and rs[0]["growth_ppm"] is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur["prev_cents"] == prev["rev_cents"]
            want = (cur["rev_cents"] - cur["prev_cents"]) * 1_000_000
            # Spark DIV truncates toward zero
            q = abs(want) // cur["prev_cents"]
            assert cur["growth_ppm"] == (q if want >= 0 else -q)


def test_sequence_gaps_total_matches_span_arithmetic(spark):
    """Sum of per-bucket missing must equal span-size minus distinct
    keys; every bucket satisfies 0 < missing <= expected."""
    from bishe_gpu_database_spark.operators.quality import quality_sequence_gaps

    out = quality_sequence_gaps(spark, SF_SMALL).collect()
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey")
    stats = li.agg(
        F.min("l_orderkey").alias("lo"),
        F.max("l_orderkey").alias("hi"),
        F.count_distinct("l_orderkey").alias("nd"),
    ).collect()[0]
    want_missing = (stats["hi"] - stats["lo"] + 1) - stats["nd"]
    assert sum(r["missing"] for r in out) == want_missing
    for r in out:
        assert 0 < r["missing"] <= r["expected"]
        assert r["present"] + r["missing"] == r["expected"]


def test_ratio_to_report_shares_sum_to_million(spark):
    """Per-segment shares must sum to 10^6 within truncation slack
    (one ppm lost per row at most), and each share recomputes."""
    from bishe_gpu_database_spark.operators.relational import window_ratio_to_report

    rows = window_ratio_to_report(spark, SF_SMALL).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, rs in by_seg.items():
        tot = sum(r["bal_cents"] for r in rs)
        s = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) <= s <= 1_000_000
        for r in rs[:20]:
            assert r["share_ppm"] == r["bal_cents"] * 1_000_000 // tot


def test_stickiness_bounds_and_dau_subset(spark):
    """DAU ≤ WAU always (a day's actives are inside its week window), so
    stickiness ∈ (0, 10^6]; single-day recomputation must agree."""
    from bishe_gpu_database_spark.operators.timeseries import events_stickiness_dau_wau

    rows = events_stickiness_dau_wau(spark, SF_SMALL).collect()
    assert rows
    du = (
        t(spark, SF_SMALL, "events")
        .select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("day_num"), "user_id"
        )
        .distinct()
        .collect()
    )
    by_day = {}
    for r in du:
        by_day.setdefault(r["day_num"], set()).add(r["user_id"])
    for r in rows:
        assert 0 < r["dau"] <= r["wau"]
        assert 0 < r["stickiness_ppm"] <= 1_000_000
        assert r["dau"] == len(by_day[r["day_num"]])
        week = set()
        for d in range(r["day_num"] - 6, r["day_num"] + 1):
            week |= by_day.get(d, set())
        assert r["wau"] == len(week)
        assert r["stickiness_ppm"] == r["dau"] * 1_000_000 // r["wau"]
