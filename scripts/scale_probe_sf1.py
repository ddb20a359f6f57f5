"""sf1 scale probe (VERDICT r2 item 5): synthesize a 10x blowup of the
sf0.1 fixture in scratch, run the probe queries at sf0.1 and sf1, and
write SCALE_r5.json with per-query times + the 10x-data cost ratio —
plus (r5) a SKEWED sf1 variant with deterministic hot spots (duplicate
docs -> hot minhash bands, one shared timestamp, one hot user) probing
the heavy-shuffle queries the uniform replicas cannot stress.

Synthesis keeps each query's workload CHARACTER, not just its byte count:
  - fact tables (lineitem, orders, events, documents, embeddings) are 10
    key-shifted replicas, so every key domain is 10x and no artificial
    hot key appears;
  - documents.text gets a per-replica suffix so the dedup/fingerprint
    probes don't degenerate into 10-way duplicate cliques (pair output
    would grow as C(10,2) per doc — a data artifact, not an engine one);
  - events timestamps shift by +i hours per replica so windows/sessions
    densify realistically rather than stacking 10 identical points;
  - dimensions (region nation customer supplier part) stay 1x, as in
    TPC-H's non-scaling small tables.

Run: PYTHONPATH=/root/repo python scripts/scale_probe_sf1.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from bishe_gpu_database_spark.registry import REGISTRY, _ensure_loaded
from bishe_gpu_database_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/bishe_spark_scratch/sf1_synth"
SF1_SKEW = "/tmp/bishe_spark_scratch/sf1_skew"
REPLICAS = 10

PROBES = [
    "q1_pricing_summary",        # scan + partial agg
    "q3_shipping_priority",      # 3-way join tree
    "q5_local_supplier_volume",  # 6-way join tree
    "join_sortmerge_large",      # fact-fact shuffle join
    "window_running_frame",      # window sort
    "topk_per_group",            # ranked window + filter
    "dedup_minhash_lsh_pairs",   # map-side signatures + band join
    "ann_cosine_topk",           # broadcast query batch x corpus
    "text_quality",              # text feature extraction
    "timeseries_twap",           # lead() segments + decimal agg
    "events_sessionize",         # gap sessionization window
    "events_attribution_u_shaped",  # forward range-frame + credit split
    "graph_triangle_count",      # degree-ordered wedge join
    "graph_pagerank_3iter",      # iterative rank loop
    "quality_table_checksum",    # full-scan commutative fold
    "pipeline_e2e_corpus",       # composed corpus build
    "timeseries_cusum_changepoint",  # daily series windows over fact scan
    # r3 additions: the new op families whose driving table scales 10x.
    "join_asof",                 # single-scan union+window as-of
    "pipeline_dsir_resample",    # two-pass importance scoring
    "text_multipattern_match",   # token stream x broadcast dictionary
    "embedding_hard_negatives",  # broadcast anchor batch x 10x corpus
    # r4: the zero-window partition-offset global rank — probed at 10x
    # to evidence the mechanism's scaling (three rank axes + exact
    # ntile; the orders-derived customer aggregate grows with the fact).
    "mart_rfm_segments",
    "agg_ntile_scalable",        # single-axis rank + decile histogram over events
]

SHIFTS = {
    # table: (shift_cols, tag_text_cols)
    "lineitem": (["l_orderkey"], []),
    "orders": (["o_orderkey"], []),
    "events": (["event_id"], []),
    "documents": (["doc_id"], ["text"]),
    "embeddings": (["vec_id"], []),
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def synthesize(spark) -> None:
    if os.path.exists(os.path.join(SF1, "_SYNTH_DONE")):
        return
    os.makedirs(SF1, exist_ok=True)
    n_parts = spark.sparkContext.defaultParallelism
    for tbl in DIMS:
        df = spark.read.parquet(os.path.join(SF01, f"{tbl}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(SF1, f"{tbl}.parquet"))
    # The orderkey DOMAIN is shared by lineitem and orders: both must
    # shift by the SAME stride or replica joins lose alignment (the
    # fixture can contain orders with no line items, so per-table maxes
    # are not guaranteed equal).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from bishe_gpu_database_spark.operators.relational import _raw_scan

    orderkey_stride = (
        max(
            _raw_scan(spark, SF01, "lineitem").agg(F.max("l_orderkey")).collect()[0][0],
            _raw_scan(spark, SF01, "orders").agg(F.max("o_orderkey")).collect()[0][0],
        )
        + 1
    )
    for tbl, (shift_cols, tag_cols) in SHIFTS.items():
        df = _raw_scan(spark, SF01, tbl)
        maxes = {
            c: orderkey_stride
            if c in ("l_orderkey", "o_orderkey")
            else df.agg(F.max(c)).collect()[0][0] + 1
            for c in shift_cols
        }
        parts = []
        for i in range(REPLICAS):
            d = df
            for c in shift_cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * maxes[c]))
            for c in tag_cols:
                d = d.withColumn(c, F.concat(F.col(c), F.lit(f" r{i}")))
            if tbl == "events":
                d = d.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} HOURS"))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(n_parts).write.mode("overwrite").parquet(
            os.path.join(SF1, f"{tbl}.parquet")
        )
    with open(os.path.join(SF1, "_SYNTH_DONE"), "w"):
        pass


# Heavy-shuffle probes for the SKEWED variant (r4 verdict item 6): the
# sf1 replica probe is uniform, so it cannot see the 100 TB failure mode
# of a HOT shuffle key. sf1_skew plants three deterministic hot spots:
#   - 10% of documents keep IDENTICAL text across all 10 replicas
#     (10-way duplicate cliques -> hot minhash band_hash values and real
#     dup pairs);
#   - 10% of events collapse onto ONE shared timestamp (equal range
#     keys are unsplittable -> stresses grouped_rank's range partitioner
#     and every time-window);
#   - 20% of events collapse onto ONE hot user (stresses per-user
#     sessionize/asof windows).
SKEW_PROBES = [
    "dedup_minhash_lsh_pairs",
    "dedup_exact",
    "join_salted_skew",
    "pipeline_global_shuffle",
    "pipeline_winsorize",
    "pipeline_pack_sequences",
    "pipeline_curriculum_order",
    "events_concurrency_sweep",
    "window_distinct_sliding",
    "window_median_sliding",
    "events_sessionize",
    "agg_ntile_scalable",
    # r7 (r5 verdict item 6): the remaining heavy-shuffle families under
    # their own deterministic hot keys (see synthesize_skewed):
    "dedup_editdist_fastss",    # dup cliques -> hot deletion-variant keys
    "linkage_fellegi_sunter",   # one nation block at ~70x average size
    "geo_neighbor_pairs",       # one grid cell holding a 3000-point stack
    "graph_triangle_count",     # one co-purchase hub in 0.5% of lineitems
]


def synthesize_skewed(spark) -> None:
    # Marker is versioned: r7 added customer replication + two hot keys
    # (nation block, geo point stack) and the lineitem hub, so a scratch
    # fixture built by r5/r6 must regenerate.
    if os.path.exists(os.path.join(SF1_SKEW, "_SYNTH_DONE_r7")):
        return
    os.makedirs(SF1_SKEW, exist_ok=True)
    n_parts = spark.sparkContext.defaultParallelism
    for tbl in DIMS:
        if tbl == "customer":
            continue  # replicated below with its own hot keys (r7)
        df = spark.read.parquet(os.path.join(SF01, f"{tbl}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(SF1_SKEW, f"{tbl}.parquet"))
    from bishe_gpu_database_spark.operators.relational import _raw_scan

    orderkey_stride = (
        max(
            _raw_scan(spark, SF01, "lineitem").agg(F.max("l_orderkey")).collect()[0][0],
            _raw_scan(spark, SF01, "orders").agg(F.max("o_orderkey")).collect()[0][0],
        )
        + 1
    )
    hot_user = _raw_scan(spark, SF01, "events").agg(F.min("user_id")).collect()[0][0]
    hot_ts = _raw_scan(spark, SF01, "events").agg(F.min("ts")).collect()[0][0]
    # hot spot 4: ONE part forced into ~0.5% of all lineitems — a
    # co-purchase hub whose naive wedge fan-out would be C(deg, 2); the
    # degree-ordered orientation must keep it wedge-free (edges point
    # INTO the hub), which this probe finally measures on a non-regular
    # graph.
    hot_part = (
        _raw_scan(spark, SF01, "lineitem")
        .filter(F.col("l_quantity") > 35)
        .agg(F.min("l_partkey"))
        .collect()[0][0]
    )
    # Customer replicates 10x here (it stays a 1x dim in the UNIFORM
    # probe): the linkage/geo skew targets are customer-driven, so the
    # skew variant needs a fact-sized customer with two hot keys —
    #   hot spot 5: ~3% of ALL customers land in ONE nation block
    #     (c_nationkey = -1), ~70x the average block, so the
    #     within-block quadratic scorer must be split by AQE;
    #   hot spot 6: ~2% of ALL customers collapse onto ONE c_custkey,
    #     stacking 3000 identical (x, y) points into a single grid cell
    #     for the distance join (candidate explosion in one cell).
    cust = _raw_scan(spark, SF01, "customer")
    ck_stride = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    nk_stride = cust.agg(F.max("c_nationkey")).collect()[0][0] + 1
    hot_geo_key = cust.agg(F.min("c_custkey")).collect()[0][0]
    cparts = []
    for i in range(REPLICAS):
        d = cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * ck_stride))
        d = d.withColumn(
            "c_nationkey", F.col("c_nationkey") + F.lit(i * nk_stride)
        )
        d = d.withColumn(
            "c_nationkey",
            F.when(F.col("c_custkey") % 33 == 0, F.lit(-1)).otherwise(
                F.col("c_nationkey")
            ),
        )
        d = d.withColumn(
            "c_custkey",
            F.when(F.col("c_custkey") % 50 == 0, F.lit(hot_geo_key)).otherwise(
                F.col("c_custkey")
            ),
        )
        cparts.append(d)
    cout = cparts[0]
    for p_ in cparts[1:]:
        cout = cout.unionByName(p_)
    cout.repartition(n_parts).write.mode("overwrite").parquet(
        os.path.join(SF1_SKEW, "customer.parquet")
    )
    for tbl, (shift_cols, tag_cols) in SHIFTS.items():
        df = _raw_scan(spark, SF01, tbl)
        maxes = {
            c: orderkey_stride
            if c in ("l_orderkey", "o_orderkey")
            else df.agg(F.max(c)).collect()[0][0] + 1
            for c in shift_cols
        }
        parts = []
        for i in range(REPLICAS):
            d = df
            for c in shift_cols:
                d = d.withColumn(c, F.col(c) + F.lit(i * maxes[c]))
            for c in tag_cols:
                # hot spot 1: doc_id % 10 == 0 keeps the ORIGINAL text in
                # every replica -> 10-way duplicate cliques, hot bands.
                d = d.withColumn(
                    c,
                    F.when(F.col("doc_id") % 10 == 0, F.col(c)).otherwise(
                        F.concat(F.col(c), F.lit(f" r{i}"))
                    ),
                )
            if tbl == "lineitem":
                d = d.withColumn(
                    "l_partkey",
                    F.when(
                        (F.col("l_orderkey") + F.col("l_linenumber")) % 200 == 0,
                        F.lit(hot_part),
                    ).otherwise(F.col("l_partkey")),
                )
            if tbl == "events":
                d = d.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} HOURS"))
                # hot spot 2: one shared timestamp for 10% of all events
                # (unsplittable equal range keys).
                d = d.withColumn(
                    "ts",
                    F.when(F.col("event_id") % 10 == 0, F.lit(hot_ts)).otherwise(
                        F.col("ts")
                    ),
                )
                # hot spot 3: one hot user carrying 20% of all events.
                d = d.withColumn(
                    "user_id",
                    F.when(F.col("event_id") % 5 == 0, F.lit(hot_user)).otherwise(
                        F.col("user_id")
                    ),
                )
            parts.append(d)
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        out.repartition(n_parts).write.mode("overwrite").parquet(
            os.path.join(SF1_SKEW, f"{tbl}.parquet")
        )
    with open(os.path.join(SF1_SKEW, "_SYNTH_DONE_r7"), "w"):
        pass


def main() -> None:
    _ensure_loaded()
    spark = get_spark("scale_probe_sf1")
    spark.range(1).count()
    t0 = time.time()
    synthesize(spark)
    print(f"# synthesis: {time.time() - t0:.1f}s", flush=True)

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        # warm relayout + codegen per SF
        for name in PROBES:
            try:
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                print(f"# warmup {name}@{sf_name}: {e}", flush=True)
        for name in PROBES:
            # Best of 5 (was 3): sub-second probes on this shared box
            # carry the same hypervisor-steal noise the bench documents;
            # q1's pure scan+agg ratio swung 1.3x-4.3x across otherwise
            # identical runs before this bump.
            best = float("inf")
            for _ in range(5):
                t1 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t1)
            results.setdefault(name, {})[sf_name] = round(best, 3)
            print(f"# {name}@{sf_name}: {best:.3f}s", flush=True)

    for name, r in results.items():
        r["ratio_10x"] = round(r["sf1"] / r["sf0.1"], 2)
    worst = max(r["ratio_10x"] for r in results.values())
    # Anchor normalization (r5 verdict item 2): this box swings 1.5-2x
    # between sessions, so the carried absolute-seconds bars (pagerank
    # 3.5s, mart_rfm 1.2s at sf1) were unfalsifiable. Each probe's sf1
    # time is also reported relative to the SAME session's q1 sf1 time;
    # round-over-round comparisons should use these ratios.
    anchor_sf1 = results["q1_pricing_summary"]["sf1"]
    for r in results.values():
        r["anchor_ratio_sf1"] = round(r["sf1"] / anchor_sf1, 2)

    # Skewed variant: hot band_hash / hot timestamp / hot user at 10x.
    t2 = time.time()
    synthesize_skewed(spark)
    print(f"# skew synthesis: {time.time() - t2:.1f}s", flush=True)
    skew_results: dict[str, dict] = {}
    for name in SKEW_PROBES:
        try:
            REGISTRY[name].fn(spark, SF1_SKEW).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name}@sf1_skew: {e}", flush=True)
            skew_results[name] = {"error": str(e)[:200]}
            continue
        best = float("inf")
        for _ in range(5):
            t1 = time.perf_counter()
            REGISTRY[name].fn(spark, SF1_SKEW).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t1)
        base = results.get(name, {}).get("sf0.1")
        if base is None:
            b = float("inf")
            for _ in range(5):
                t1 = time.perf_counter()
                REGISTRY[name].fn(spark, SF01).write.format("noop").mode(
                    "overwrite"
                ).save()
                b = min(b, time.perf_counter() - t1)
            base = round(b, 3)
        # Skew DAMAGE needs the same-size uniform control (r7): the raw
        # sf0.1->sf1_skew ratio conflates data densification — which the
        # uniform sf1 fixture pays too (longer window frames, denser
        # cells) — with the cost of the hot keys themselves. The
        # defensible metric is sf1_skew / sf1_uniform measured in the
        # SAME session: >1 means the hot keys genuinely cost extra, <=1
        # means the engine's skew handling fully absorbs them.
        uni = results.get(name, {}).get("sf1")
        if uni is None:
            u = float("inf")
            for _ in range(5):
                t1 = time.perf_counter()
                REGISTRY[name].fn(spark, SF1).write.format("noop").mode(
                    "overwrite"
                ).save()
                u = min(u, time.perf_counter() - t1)
            uni = round(u, 3)
        skew_results[name] = {
            "sf0.1": base,
            "sf1_uniform": uni,
            "sf1_skew": round(best, 3),
            "ratio_10x_skewed": round(best / base, 2),
            "skew_vs_uniform": round(best / uni, 2),
        }
        print(
            f"# {name}@sf1_skew: {best:.3f}s (ratio {best / base:.2f}x, "
            f"vs uniform sf1 {best / uni:.2f}x)",
            flush=True,
        )
    skew_worst = max(
        (r["ratio_10x_skewed"] for r in skew_results.values() if "ratio_10x_skewed" in r),
        default=None,
    )
    skew_damage_worst = max(
        (r["skew_vs_uniform"] for r in skew_results.values() if "skew_vs_uniform" in r),
        default=None,
    )

    out = {
        "probe": "sf0.1 -> synthetic sf1 (10x key-shifted replicas)",
        "replicas": REPLICAS,
        "queries": results,
        "worst_ratio_10x": worst,
        "anchor": {
            "query": "q1_pricing_summary",
            "sf0.1_sec": results["q1_pricing_summary"]["sf0.1"],
            "sf1_sec": anchor_sf1,
        },
        "skewed": {
            "hot_spots": "10% duplicate docs across replicas (hot bands), "
            "10% of events on ONE timestamp, 20% of events on ONE user, "
            "one co-purchase hub part in 0.5% of lineitems, ~3% of "
            "customers in ONE nation block, a 3000-point stack in ONE "
            "grid cell (r7)",
            "note": "window_distinct_sliding's hot-instant cells route "
            "through the r6 collapse-by-instant hybrid (r7: gated on "
            "measured instant DUPLICATION, not an absolute cell size; "
            "the r5 always-exact path measured 5.31x here). The r7 "
            "uniform-sf1 control showed its residual sf0.1->sf1_skew "
            "ratio is DENSIFICATION, not skew: same-size uniform data "
            "is SLOWER than the skewed fixture (skew_vs_uniform <= 1), "
            "because sliding exact-distinct frames lengthen as cells "
            "densify regardless of hot keys — so the carried bar is on "
            "skew_vs_uniform (<= 1.5), the metric that isolates hot-key "
            "damage. linkage's hot block and geo's hot cell rely on AQE "
            "skew-split of one oversized join partition; the triangle "
            "hub must stay wedge-free under degree-ordered orientation. "
            "dedup_editdist_fastss's skew_vs_uniform is OUTPUT-bound, "
            "not a plan defect: the skewed fixture's 10x customer "
            "replication creates identical-name cliques, and an "
            "edit-distance<=1 self-join must EMIT all C(m,2) pairs of "
            "an m-clique — the uniform control has no such cliques, so "
            "its output is linear; candidate generation itself stays "
            "equi-join-shaped on deletion variants either way.",
            "queries": skew_results,
            "worst_ratio_10x_skewed": skew_worst,
            "worst_skew_vs_uniform": skew_damage_worst,
        },
        "note": "ratio <= ~10 means at-worst-linear scaling in data; "
        "well below 10 while fixed per-job overhead still dominates.",
    }
    with open("/root/repo/SCALE_r7.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"worst_ratio_10x": worst,
                      "worst_ratio_10x_skewed": skew_worst,
                      "worst_skew_vs_uniform": skew_damage_worst}), flush=True)


if __name__ == "__main__":
    main()
