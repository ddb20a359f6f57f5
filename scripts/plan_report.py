"""Regenerate PLANS.md: formatted physical plans for headline queries.

Run: PYTHONPATH=/root/repo python scripts/plan_report.py [sf_dir]

For each selected query the report shows `explain("formatted")` output so
the plan properties claimed in SCALE.md are inspectable: parquet
PushedFilters / ReadSchema (pushdown + pruning), BroadcastHashJoin on
dimension sides, partial aggregation (HashAggregate x2), and
WholeStageCodegen spans (JVM-side execution, no Python in the hot path).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "scan_project_filter",
    "join_sortmerge_large",
    "join_asof",
    "agg_cube",
    "window_running_frame",
    "dedup_minhash_lsh_pairs",
    "ann_ivf_topk",
    "cdc_merge_snapshot",
    "events_funnel",
    "aria_commit_flags",
    "scd2_history",
    "ivm_incremental_agg",
    "join_shuffle_hash_hint",
    "subquery_in_notin_nulls",
    "events_attribution_last_touch",
    "agg_approx_topk",
    "graph_pagerank_3iter",
    "dedup_prefix_filter_join",
    "timeseries_seasonal_profile",
    "mv_rewrite_monthly",
    "geo_neighbor_pairs",
    "dedup_editdist_fastss",
    "timeseries_cusum_changepoint",
    "embedding_pca_power3",
    "graph_label_communities",
    "dedup_sorted_neighborhood",
    "pipeline_dsir_resample",
    "text_multipattern_match",
    "embedding_hard_negatives",
    "catalog_join_cardinality",
]

NOTES = {
    "dedup_sorted_neighborhood": "ONE Window (lead 1..3) + map-side explode — no self-join of the ranked table, candidates bounded N·(w−1)",
    "pipeline_dsir_resample": "one fused conditional stats aggregate; the 32-row ratio table returns as a BroadcastHashJoin onto the token stream — exactly two corpus passes",
    "text_multipattern_match": "token explode pipelines into a BroadcastHashJoin probe against the dictionary; counts partial-aggregate map-side",
    "embedding_hard_negatives": "bounded anchor batch broadcasts (BNLJ is the algorithm); label-inequality prunes before the cosine fold; corpus streams once",
    "catalog_join_cardinality": "both histograms are partial-agg'd scans; the estimate is 64 rows of arithmetic — the true-count branch exists only for the ppm oracle",
    "geo_neighbor_pairs": "distance join planned as an EQUI hash/SMJ join on (cx, cy) cell keys — no BroadcastNestedLoop, no cartesian; 3x3 probe explosion is a constant-factor map-side fan-out",
    "dedup_editdist_fastss": "candidate generation is an equi-join on the deletion-variant string; levenshtein verify runs post-join on candidates only",
    "timeseries_cusum_changepoint": "one fact shuffle to the daily series; all windows over the dimension-sized (type, day) table; DECIMAL(38,0) sums",
    "embedding_pca_power3": "per power step: vec_id-keyed dots shuffle + 64-group direction sum; 1-row rescale scalars broadcast; Gram matrix never materialized",
    "graph_label_communities": "per round: edge-label join (node-sized build side), map-combined (node,label) counts, node-partitioned argmax window; edges localCheckpoint-ed once",
    "graph_pagerank_3iter": "edge derivation is a plain shuffle join (NO fact broadcast); per-iteration only node-sized ranks broadcast",
    "dedup_prefix_filter_join": "pairwise step only on prefix shingles; verification reads two sorted arrays per candidate",
    "timeseries_seasonal_profile": "one map-side-combinable hash agg to 168 cells; globals via window over the cell table",
    "mv_rewrite_monthly": "base table absent from the plan — the month rollup scans only the day-level MV",
    "q1_pricing_summary": "filter pushed to scan; 2-phase HashAggregate; decimal sums",
    "q3_shipping_priority": "broadcast customer applied to orders BEFORE the lineitem shuffle",
    "scan_project_filter": "PushedFilters + pruned ReadSchema at the parquet scan",
    "join_sortmerge_large": "large-large sort-merge; both sides shuffle once on the key",
    "join_asof": "window-based as-of: one shuffle + sort per entity, no range cross-join",
    "agg_cube": "Expand AFTER partial aggregation",
    "window_running_frame": "single shuffle + in-partition running frame",
    "dedup_minhash_lsh_pairs": "signatures map-side; only 16-byte band keys shuffle",
    "ann_ivf_topk": "centroid assign broadcast; search is an equi-join on cell id",
    "cdc_merge_snapshot": "max_by compaction (partial agg), full-outer apply on the key",
    "events_funnel": "all steps partition on user_id — one logical shuffle",
    "aria_commit_flags": "reservation = groupBy(k).agg(min(tid)); flags = per-tid max",
    "scd2_history": "all windows + the collapse groupBy share the user_id partitioning",
    "ivm_incremental_agg": "delta partial-agg merges into the checkpointed view; base not rescanned",
    "join_shuffle_hash_hint": "SHUFFLE_HASH hint -> ShuffledHashJoin: one shuffle per side, zero sorts",
    "subquery_in_notin_nulls": "NOT IN planned as BroadcastNestedLoopJoin-free null-aware anti join",
    "events_attribution_last_touch": "argmax struct over time-RANGE frame; one user_id shuffle",
    "agg_approx_topk": "space-saving sketch: partial_approx_top_k per map task, merge, then flatten",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bishe_gpu_database_spark.registry import all_queries
    from bishe_gpu_database_spark.session import get_spark

    spark = get_spark()
    queries = all_queries()
    out = [
        "# PLANS — formatted physical plans for headline queries",
        "",
        f"Generated by `scripts/plan_report.py` at `{sf_dir}`. What to look",
        "for per plan is noted inline; SCALE.md states the corresponding",
        "100 TB contracts. Regenerate after any operator change.",
        "",
    ]
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}")
        out.append("")
        out.append(f"*Look for: {NOTES[name]}.*")
        out.append("")
        out.append("```")
        out.append(buf.getvalue().rstrip())
        out.append("```")
        out.append("")
        print(f"done: {name}", file=sys.stderr)
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
