"""Scalar-function surface: string / date / math / array / JSON /
conditional expressions — SURVEY.md §2.2 "Scalar functions" row.

The reference's only scalar 'functions' are its random generators
(ref: src/database/common/random.h:8-41); this module exposes the
pyspark.sql.functions catalogue the analytics surface needs, each query
oracle-checked against DuckDB's equivalent ANSI expression.

Everything here is JVM-side / whole-stage-codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import dec, t
from bishe_gpu_database_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           trim('  x  ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function sampler (upper/length/substr/concat/replace/regexp/
    trim/lpad/like/split)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_name").like("%widget%").cast("int").alias("is_widget"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function sampler; results cast to DATE/INT so both
    engines hash identical values."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_diff,
           round(l_extendedprice, 1) AS price_round,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket_hi,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(pow(l_discount, 2), 6) AS disc_sq,
           mod(CAST(l_quantity AS BIGINT), 5) AS qty_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function sampler. sqrt/ln/pow on the same IEEE double input are
    correctly-rounded (or within 1 ulp) in both engines; rounding to 6
    decimals removes any residual ulp skew."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.round("l_extendedprice", 1).alias("price_round"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_bucket_hi"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_coord,
           CAST(embedding[64] AS DOUBLE) AS last_coord,
           round(CAST(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 6) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_coord
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column (size / element_at /
    aggregate / array_max). All arithmetic in double after per-element
    cast so both engines accumulate identically (64 fixed-order adds)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_coord"),
        F.element_at("embedding", 64).cast("double").alias("last_coord"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_coord"),
    )


@register(
    "fn_json",
    oracle="""
    WITH ex AS (
      SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM ex
    GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object ≡ DuckDB
    json_extract_string), aggregated as integers (exact). Garbage props
    — NULL, truncated-mid-object JSON, non-numeric $.k — extract as
    NULL in BOTH engines (try_cast here; json_valid guard + TRY_CAST in
    the oracle): at corpus scale malformed payloads are routine and one
    bad row must not kill the aggregate (the r7 perturbed axis this is
    declared against; a plain ANSI cast threw on 'not_a_number')."""
    e = t(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "fn_case_when",
    oracle="""
    SELECT CASE
             WHEN o_totalprice < 50000 THEN 'small'
             WHEN o_totalprice < 150000 THEN 'medium'
             WHEN o_totalprice < 300000 THEN 'large'
             ELSE 'jumbo'
           END AS price_band,
           o_orderstatus,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing (CASE WHEN chain) + aggregation."""
    o = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return o.groupBy(band.alias("price_band"), F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "fn_hash_portable",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           ('0x' || substr(md5(text), 1, 12))::BIGINT AS text_hash48,
           ('0x' || substr(md5(text), 1, 12))::BIGINT % 1024 AS bucket
    FROM documents
    """,
)
def fn_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable deterministic hashing: md5 hex → 48-bit int → bucket.
    This is the cross-engine analogue of the reference's multiplicative
    hashKey (ref: src/cuda/hashTable.cuh:24-28) and underpins the dedup /
    LSH operators."""
    d = t(spark, sf_dir, "documents")
    h48 = F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("bigint")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        h48.alias("text_hash48"),
        F.pmod(h48, F.lit(1024)).alias("bucket"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT user_id,
           COALESCE(count(CASE WHEN event_type = 'click' THEN 1 END), 0) AS n_click,
           COALESCE(count(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS n_purchase,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions: per-user event-type histogram built as a real
    MapType column (map_from_entries over a collected agg), then consumed
    with element_at / map_keys. The map column itself never leaves the
    executors — only the extracted scalars do, which keeps the result
    oracle-comparable and the shuffle narrow."""
    e = t(spark, sf_dir, "events")
    hist = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("histogram")
        )
    )
    return hist.select(
        "user_id",
        F.coalesce(F.element_at("histogram", F.lit("click")), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("histogram", F.lit("purchase")), F.lit(0)).alias(
            "n_purchase"
        ),
        F.size(F.map_keys("histogram")).alias("n_types"),
    )


@register(
    "fn_json_schema_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           '{"k":' || json_extract_string(props, '$.k') || ',"t":"' || event_type || '"}'
             AS rebuilt
    FROM events WHERE event_id % 7 = 0
    """,
)
def fn_json_schema_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON: from_json parses props into a typed struct
    (vectorized Jackson parse, not per-path re-parsing like repeated
    get_json_object), then to_json re-serializes an enriched struct.
    At 100 TB parse-once-into-struct is the only sane way to touch many
    JSON fields."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    parsed = e.select(
        "event_id",
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_val"),
        F.to_json(
            F.struct(F.col("p.k").alias("k"), F.col("event_type").alias("t"))
        ).alias("rebuilt"),
    )


@register(
    "fn_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)[0-9]', 1) AS first_prenum_word,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked,
           CAST(regexp_matches(text, 'join|merge') AS INT) AS mentions_join,
           len(regexp_extract_all(text, '[a-z]{5,}')) AS n_long_words
    FROM documents
    WHERE doc_id < 500
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: capture-group extract, global replace, match test,
    match count — all JVM-side codegen'd expressions (regexp compiled once
    per task, not per row)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)[0-9]", 1).alias("first_prenum_word"),
        F.regexp_replace("text", r"[0-9]+", "#").alias("digits_masked"),
        F.col("text").rlike("join|merge").cast("int").alias("mentions_join"),
        F.regexp_count(F.col("text"), F.lit(r"[a-z]{5,}")).alias("n_long_words"),
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, amount FROM (
      SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS amount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    ) WHERE l_orderkey < 1000
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (UNPIVOT / melt): four measure columns become
    (measure, amount) rows. Spark's Expand node emits all four rows per
    input row in one narrow pass — no shuffle, no self-union re-scan (the
    UNION ALL oracle scans the table four times; Expand scans once).
    Values pass through unaggregated, so doubles hash exactly."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_discount", "l_extendedprice", "l_quantity", "l_tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


@register(
    "agg_mode_per_key",
    oracle="""
    SELECT user_id, event_type AS mode_event_type, n FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
             ) AS rk
      FROM events GROUP BY user_id, event_type
    ) WHERE rk = 1
    """,
)
def agg_mode_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key mode (most frequent value) with a deterministic
    lexicographic tie-break — count-then-rank, the exact form of an
    operation Spark's ``mode()`` aggregate leaves tie-undefined. The
    count and the ranking window share the user_id partition key, so the
    second pass reuses the first's shuffle; per-key state is bounded by
    the value domain (event types), not row count."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    )
    return (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
    )


@register(
    "window_value_funcs",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w2 AS last_type,
           nth_value(event_type, 2) OVER w2 AS second_type,
           round(percent_rank() OVER
                 (PARTITION BY user_id ORDER BY value, event_id), 6)
             AS value_pct_rank
    FROM events
    WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first_value / last_value / nth_value over
    the full partition frame plus percent_rank — the analytic-catalogue
    rows the ranking/lag queries don't cover. last_value and nth_value
    need the explicit UNBOUNDED FOLLOWING frame (the default frame stops
    at CURRENT ROW in both engines). One user_id shuffle serves all four
    — the windows share partitioning and sort, so Catalyst evaluates them
    in a single Window node pair over one sort."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wp = W.partitionBy("user_id").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w2).alias("last_type"),
        F.nth_value("event_type", 2).over(w2).alias("second_type"),
        F.round(F.percent_rank().over(wp), 6).alias("value_pct_rank"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps: keys bucketed into 32k-bit
    bitmap segments (bitmap_bucket_number), each segment OR-merged with
    bitmap_construct_agg, popcounts summed. Semantically identical to
    count(DISTINCT) — the oracle IS count(DISTINCT) — but the shuffle
    carries fixed-size bitmap segments instead of every distinct key:
    at 100 TB a dense int key domain compresses ~200x vs exact-distinct's
    key re-shuffle, with none of approx_count_distinct's error."""
    li = t(spark, sf_dir, "lineitem")
    seg = li.groupBy(
        "l_returnflag", F.bitmap_bucket_number(F.col("l_partkey")).alias("_bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias("_bm"))
    return seg.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("_bm")).cast("bigint").alias("n_distinct_parts")
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL functions over a synthesized url column: parse_url HOST / PATH
    / QUERY:key — the canonical-URL primitive under web-corpus dedup
    (DuckDB lacks parse_url, so the oracle uses the equivalent regexes).
    Pure codegen'd string ops, no shuffle at all."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           -- day-add via DATE+int: DuckDB v1.0 merges two distinct
           -- INTERVAL constants projected over one scan (CSE bug — both
           -- became +90 days), so only ONE interval literal may appear
           CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS promised_by,
           o_orderdate + INTERVAL '3 months' AS review_at,
           datediff('day', o_orderdate, TIMESTAMP '1998-06-01') AS age_days,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
    FROM orders
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval / date arithmetic: day and calendar-month addition (both
    engines clamp month-end identically), day-boundary datediff, last_day,
    quarter truncation. Map-only codegen; at scale these are the
    partition-pruning expressions (date_trunc on a partition column folds
    to a range predicate)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("promised_by"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("review_at"),
        F.datediff(F.lit("1998-06-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("age_days"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
           END AS k_val,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN CAST(json_extract_string(props, '$.k') AS VARCHAR)
           END AS k_str,
           CASE WHEN props IS NULL OR NOT json_valid(props) THEN true
                ELSE json_extract(props, '$.missing') IS NULL
           END AS missing_absent
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into a real
    VARIANT column, then typed variant_get extraction — the open-schema
    alternative to from_json's fixed StructType (fn_json_schema_roundtrip)
    when event payloads evolve. The variant never leaves the executors;
    only extracted scalars ship, and at 100 TB the shredded binary
    encoding scans far cheaper than repeated JSON string parsing.

    Garbage props (the r7 perturbed axis): NULL / truncated-mid-object
    payloads parse to a NULL variant via ``try_parse_json`` (FAILFAST
    parse_json killed the whole scan on one bad row), and a non-numeric
    $.k extracts as NULL via ``try_variant_get`` — every extraction is
    then NULL, so ``missing_absent`` reads true for unparseable rows in
    both engines (the oracle's json_valid CASE mirrors it)."""
    e = t(spark, sf_dir, "events")
    v = e.select("event_id", F.try_parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("try_variant_get(v, '$.k', 'int')").alias("k_val"),
        F.expr("try_variant_get(v, '$.k', 'string')").alias("k_str"),
        F.expr("try_variant_get(v, '$.missing', 'string') IS NULL").alias(
            "missing_absent"
        ),
    )


@register(
    "agg_linreg_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*)::HUGEINT AS n,
             sum(CAST(l_quantity AS BIGINT))::HUGEINT AS sx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))::HUGEINT AS sy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT))::HUGEINT AS sxy,
             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))::HUGEINT AS sxx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT))::HUGEINT AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0), 6)
             AS slope_cents_per_qty,
           round(CAST(sy*sxx - sx*sxy AS DOUBLE)
                 / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0), 6)
             AS intercept_cents,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / nullif(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                               * CAST(n*syy - sy*sy AS DOUBLE)), 0), 6)
             AS corr_xy
    FROM m
    """,
)
def agg_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares regression (price-cents on
    quantity) + Pearson correlation from EXACT integer moments: the five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as wide
    decimals — order-independent, partition-count-independent — and each
    result is ONE double division over identical integers on both
    engines. This is how regression runs at 100 TB: the shuffle carries
    six numbers per group (a mergeable moment sketch), never the points;
    Spark's builtin regr_slope/corr float-accumulate and would differ in
    the last ulp under re-partitioning, so they could not be hash-gated.
    Σy² exceeds int64 by sf0.1 — the moment sums go through DECIMAL(38,0)
    (HUGEINT in the oracle), the overflow class round 1's ADVICE flagged."""
    D38 = "decimal(38,0)"
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum(x.cast(D38)).alias("sx"),
        F.sum(y.cast(D38)).alias("sy"),
        F.sum((x * y).cast(D38)).alias("sxy"),
        F.sum((x * x).cast(D38)).alias("sxx"),
        F.sum((y * y).cast(D38)).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    inum = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
    # nullif guards (mirrored in the oracle): a single-row or
    # zero-variance group has no defined slope/correlation — NULL, not an
    # ANSI DIVIDE_BY_ZERO job kill (r5 single-row fixture axis).
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_items"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("slope_cents_per_qty"),
        F.round(inum / F.nullif(den, F.lit(0.0)), 6).alias("intercept_cents"),
        F.round(num / F.nullif(F.sqrt(den * den_y), F.lit(0.0)), 6).alias("corr_xy"),
    )


@register(
    "fn_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
                AS DOUBLE) AS revenue_units,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (Spark 4 `CREATE FUNCTION … RETURN expr`): the
    discounted-revenue formula is defined ONCE as a catalog object and
    reused by name — unlike a Python UDF the body is inlined into the
    plan at analysis time, so it codegens with the query, pushes down,
    and costs nothing at 100 TB (this is the right way to share business
    logic across queries; Python UDFs are for logic SQL cannot express).
    Exact integer units (cents × discount basis points) summed as
    DECIMAL, so the result hash-gates cross-engine."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION rev_units(price DOUBLE, disc DOUBLE)
        RETURNS DECIMAL(38,0)
        RETURN CAST(CAST(round(price * 100) AS BIGINT) AS DECIMAL(38,0))
               * (10000 - CAST(round(disc * 10000) AS BIGINT))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(rev_units(l_extendedprice, l_discount)) AS DOUBLE)
                 AS revenue_units,
               count(*) AS n_items
        FROM _sqludf_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "fn_sql_table_udf",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
                                    TIMESTAMP '1998-12-01',
                                    INTERVAL 1 MONTH)) AS mon
    )
    SELECT s.mon, count(o.o_orderkey) AS n_orders
    FROM spine s LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = s.mon
    GROUP BY s.mon
    """,
)
def fn_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function (Spark 4 `CREATE FUNCTION … RETURNS TABLE`):
    a reusable month-spine generator invoked in the FROM clause, left-
    joined against orders so empty months survive — the declarative twin
    of timeseries_gap_fill's dense-spine pattern. The spine is generated
    from metadata (36 rows regardless of data size) and the join is the
    only shuffle; the function body inlines into the plan like any view."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sqltf_orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION month_spine(y0 INT, y1 INT)
        RETURNS TABLE(mon TIMESTAMP)
        RETURN SELECT explode(sequence(make_timestamp(y0, 1, 1, 0, 0, 0),
                                       make_timestamp(y1, 12, 1, 0, 0, 0),
                                       interval '1' month)) AS mon
        """
    )
    return spark.sql(
        """
        SELECT s.mon, count(o.o_orderkey) AS n_orders
        FROM month_spine(1996, 1998) s
        LEFT JOIN _sqltf_orders o ON date_trunc('month', o.o_orderdate) = s.mon
        GROUP BY s.mon
        """
    )


@register(
    "agg_moments_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*)::HUGEINT AS n,
             sum(CAST(l_quantity AS HUGEINT)) AS s1,
             sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)) AS s2,
             sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS s3,
             sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           round(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE), 6) AS variance_pop,
           round(CAST(n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS DOUBLE)
                 / nullif(CAST(n*n*n AS DOUBLE)
                    * pow(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE), 1.5), 0), 6)
             AS skewness_pop,
           round(CAST(n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS DOUBLE)
                 / nullif(CAST(n*n*n*n AS DOUBLE)
                    * pow(CAST(n*s2 - s1*s1 AS DOUBLE) / CAST(n*n AS DOUBLE), 2.0), 0), 6)
             AS kurtosis_pop
    FROM m
    """,
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance / skewness / kurtosis from EXACT integer power
    sums (Σx..Σx⁴ in DECIMAL(38,0) ≡ HUGEINT): the central-moment
    identities run on identical integers in both engines, then ONE
    double expression each — so the third and fourth moments, the most
    order-sensitive statistics there are under float accumulation, hash
    bit-for-bit. The shuffle carries five numbers per group (mergeable
    across any partitioning); Spark's builtin skewness/kurtosis float
    paths cannot be cross-engine-gated at all. Σx⁴ needs ~27 digits at
    sf1 — the wide-decimal discipline from round 1's ADVICE applied up
    front."""
    D38 = "decimal(38,0)"
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum(x.cast(D38)).alias("s1"),
        F.sum((x * x).cast(D38)).alias("s2"),
        F.sum((x * x * x).cast(D38)).alias("s3"),
        F.sum((x * x * x * x).cast(D38)).alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    var = (n * s2 - s1 * s1).cast("double") / (n * n).cast("double")
    skew_num = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).cast("double")
    kurt_num = (
        n * n * n * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    ).cast("double")
    # nullif guards (mirrored in the oracle): a zero-variance group has
    # undefined standardized moments — NULL, not a DIVIDE_BY_ZERO kill
    # (r5 single-row fixture axis).
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        F.round(var, 6).alias("variance_pop"),
        F.round(
            skew_num
            / F.nullif((n * n * n).cast("double") * F.pow(var, 1.5), F.lit(0.0)),
            6,
        ).alias("skewness_pop"),
        F.round(
            kurt_num
            / F.nullif((n * n * n * n).cast("double") * F.pow(var, 2.0), F.lit(0.0)),
            6,
        ).alias("kurtosis_pop"),
    )


@register(
    "fn_collation_ci",
    oracle="""
    WITH mixed AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) ELSE p_brand END
               AS brand_mixed,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    )
    SELECT lower(brand_mixed) AS brand_key,
           count(*) AS n_parts,
           sum(cents) AS cents_total
    FROM mixed
    GROUP BY lower(brand_mixed)
    """,
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATION (UTF8_LCASE): the
    engine-level answer to mixed-case keys — comparisons, joins, and
    aggregations honor the collation without rewriting every predicate
    through lower() (and without breaking pushdown the way an expression
    wrapper does). The collated column groups 'Brand#42' with
    'BRAND#42'; the output key is normalized to lower() so the oracle —
    DuckDB has no column collations — reproduces the grouping with an
    explicit lower()."""
    p = t(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.col("p_brand"))
        .alias("brand_mixed"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    collated = mixed.select(
        F.collate(F.col("brand_mixed"), "UTF8_LCASE").alias("brand_ci"), "cents"
    )
    return collated.groupBy("brand_ci").agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("cents").alias("cents_total")
    ).select(
        F.lower(F.col("brand_ci")).cast("string").alias("brand_key"),
        "n_parts",
        "cents_total",
    )


@register(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey AS region_key,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 LISTAGG … WITHIN GROUP): the
    denormalization/report primitive. The explicit WITHIN GROUP order is
    what makes the result deterministic — an unordered listagg would be
    partition-order-dependent and could never hash-gate. Grouped
    aggregation with a sort inside the group; at scale the sort is
    bounded by group size, not data size."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("_la_nation")
    return spark.sql(
        """
        SELECT n_regionkey AS region_key,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations_csv,
               count(*) AS n_nations
        FROM _la_nation
        GROUP BY n_regionkey
        """
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 4) END AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(round(l_extendedprice * 100) AS BIGINT)
                     // CAST(l_quantity AS BIGINT) END AS cents_per_qty,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (try_divide / try_cast): NULL instead of a
    job-killing exception on divide-by-zero or a bad cast. At 100 TB this
    is operational armor — one malformed row of a trillion must not fail
    the stage; the NULLs flow to a quarantine filter instead (same
    philosophy as source_json_corrupt_records). DuckDB division raises
    like ANSI Spark would, so the oracle reproduces try-semantics with
    explicit CASE guards — which is exactly the boilerplate try_* saves."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 4).alias(
            "price_per_disc"
        ),
        # floor(try_divide(...)) == integer div for these magnitudes
        # (cents < 2^53), and yields NULL instead of DIVIDE_BY_ZERO if a
        # malformed row ever carried quantity 0 — plain `div` would kill
        # the stage under ANSI mode, which is the failure this operator
        # exists to survive.
        F.floor(
            F.try_divide(
                F.round(F.col("l_extendedprice") * 100).cast("bigint"),
                F.col("l_quantity").cast("bigint"),
            )
        ).cast("bigint").alias("cents_per_qty"),
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias("flag_as_int"),
    )


@register(
    "fn_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_total
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def fn_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding + the
    IDENTIFIER() clause): the table name and the threshold arrive as
    BOUND PARAMETERS, not string concatenation — the injection-safe
    templating layer a multi-tenant query service needs. The plan is
    identical to the inlined query (binding happens before analysis),
    so pushdown and pruning are unaffected."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_total
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"tbl": "_param_orders", "min_price": 150000.0},
    )


@register(
    "fn_explode_pos",
    oracle="""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id, i - 1 AS pos, l[i] AS token
    FROM s, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i)
    """,
)
def fn_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view): one row per token with its
    0-based position — the tokenizer fan-out every sequence-labeling /
    packing pipeline starts from. posexplode is a Generate operator:
    a NARROW transformation (no shuffle, no sort), so at 100 TB it
    streams through the scan stage and composes with whatever shuffle
    follows. The reference has no array model at all (values are fixed
    char[10][10] — ref: src/cuda/kv.cuh:48-79); this is the set-oriented
    equivalent of its per-op iteration inside a transaction
    (ref: src/database/ycsb/TrancM_func.cuh:21-63)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "fn_levenshtein",
    oracle="""
    WITH tri AS (
      SELECT DISTINCT n_nationkey, n_name, tri
      FROM (SELECT n_nationkey, n_name,
                   unnest(list_transform(
                     generate_series(1, greatest(length(n_name) - 2, 1)),
                     i -> substr(n_name, CAST(i AS INT), 3))) AS tri
            FROM nation)
    ),
    pairs AS (
      SELECT DISTINCT a.n_nationkey AS ka, a.n_name AS name_a,
                      b.n_nationkey AS kb, b.n_name AS name_b
      FROM tri a JOIN tri b ON a.tri = b.tri AND a.n_nationkey < b.n_nationkey
    )
    SELECT name_a, name_b,
           levenshtein(name_a, name_b) AS edit_dist,
           levenshtein(substr(name_a, 1, 8), substr(name_b, 1, 8))
             AS edit_dist_prefix
    FROM pairs
    WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity resolution / typo-tolerant
    dedup): nation-name pairs within edit distance 1 — an EXACT integer
    both engines compute identically, unlike similarity floats. Staged
    the way edit distance scales: a character-trigram blocking
    equi-join generates candidate pairs, then the exact distance
    verifies — no all-pairs theta join anywhere, so the plan is
    shuffle-hash/sort-merge, not nested-loop (cf.
    dedup_minhash_lsh_pairs for the document analogue). Blocking recall
    caveat, stated rather than hand-waved: sharing a trigram is
    guaranteed only while k errors can't destroy every one of the
    len-2 trigram positions (roughly k < len/3 — e.g. CHINA↔INDIA at
    distance 4 share none); at threshold 1 over these names the
    guarantee holds, and production stacks pick band/q-gram counts from
    the same bound."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    starts = F.sequence(F.lit(1), F.greatest(F.length("n_name") - 2, F.lit(1)))
    tri = n.select(
        "n_nationkey",
        "n_name",
        F.explode(
            F.transform(starts, lambda i: F.col("n_name").substr(i, F.lit(3)))
        ).alias("tri"),
    ).distinct()
    a = tri.select(
        F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"), "tri"
    )
    b = tri.select(
        F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"), "tri"
    )
    pairs = (
        a.join(b, "tri")
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "name_a", "kb", "name_b")
        .distinct()
    )
    return pairs.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("edit_dist"),
        F.levenshtein(
            F.substring("name_a", 1, 8), F.substring("name_b", 1, 8)
        ).alias("edit_dist_prefix"),
    ).filter(F.col("edit_dist") <= 1)


@register(
    "fn_width_bucket",
    oracle="""
    SELECT CASE WHEN l_quantity >= 50 THEN 11
                ELSE CAST(floor(10 * l_quantity / 50) AS BIGINT) + 1 END
             AS bucket,
           count(*) AS n_items,
           CAST(min(l_quantity) AS BIGINT) AS min_qty,
           CAST(max(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-WIDTH bucketing via the SQL-standard width_bucket(v, lo, hi,
    n): quantity histogrammed into 10 equal [0,50) bins, overflow bin
    n+1 — the codegen'd primitive under feature binning and equi-width
    histograms. A pure narrow map + tiny groupBy: the shuffle carries
    (bucket, partial-agg) pairs, ~11 rows regardless of corpus size.
    l_quantity is integral, so Spark's floor(n·(v-lo)/(hi-lo))+1 and the
    oracle's hand-rolled formula agree bit-for-bit (no representable-
    boundary hazard). Cross-engine note: DuckDB lacks width_bucket, so
    the oracle spells out the same arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(10)).alias(
                "bucket"
            ),
            "l_quantity",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("l_quantity").cast("bigint").alias("min_qty"),
            F.max("l_quantity").cast("bigint").alias("max_qty"),
        )
    )


@register(
    "fn_transpose_frame",
    oracle="""
    SELECT 'n_nations' AS key,
           CAST((SELECT count(*) FROM nation n JOIN region r
                 ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'AFRICA') AS BIGINT) AS AFRICA,
           CAST((SELECT count(*) FROM nation n JOIN region r
                 ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'AMERICA') AS BIGINT) AS AMERICA,
           CAST((SELECT count(*) FROM nation n JOIN region r
                 ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'ASIA') AS BIGINT) AS ASIA,
           CAST((SELECT count(*) FROM nation n JOIN region r
                 ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'EUROPE') AS BIGINT) AS EUROPE,
           CAST((SELECT count(*) FROM nation n JOIN region r
                 ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'MIDDLE EAST') AS BIGINT) AS "MIDDLE EAST"
    """,
)
def fn_transpose_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4): flip a small summary frame so its
    index column becomes the header row — the presentation-layer pivot
    for reports/corpus cards. Transpose materializes the index column on
    the driver to name the output columns, so it is strictly a
    SMALL-RESULT operator (here: 5 region rows → 5 columns); the heavy
    aggregation upstream stays distributed, and wide→long at scale goes
    through unpivot_melt instead."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    counts = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .withColumn("n_nations", F.col("n_nations").cast("string"))
    )
    out = counts.transpose(F.col("r_name"))
    return out.select(
        F.col("key"),
        *[F.col(f"`{c}`").cast("bigint").alias(c) for c in sorted(out.columns) if c != "key"],
    )
