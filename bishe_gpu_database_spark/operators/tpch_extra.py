"""TPC-H queries 7-22 (the ones not already in ``relational``), adapted
to the fixture schema.

The fixtures omit ``partsupp`` and several TPC-H columns
(``l_shipmode``/``l_commitdate``/``l_receiptdate``, ``p_container``,
``c_phone``, ``o_comment``), so queries that depend on them are
*shape-preserving variants*: the join tree, subquery structure, and
aggregate pattern of the official query are kept; only the filter
columns change. Each docstring says what was substituted.

Reference parity: the reference engine (bishe-gpu-database,
src/transaction.cu) is a KV transaction kernel with no SQL frontend —
this module is part of the driver-mandated analytics surface layered on
top, exercised exactly like the reference's YCSB batches: declarative
plan in, columnar result out.

Float discipline (see registry docstring): every money aggregate runs in
DECIMAL and is cast to DOUBLE at the end on both the Spark and DuckDB
sides; thresholds that would round differently in double (0.2*avg) are
restated as exact integer/decimal comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bishe_gpu_database_spark.operators.relational import D12, dec, dsum, one, t
from bishe_gpu_database_spark.registry import register

# Every revenue term: extendedprice * (1 - discount), exact decimal.
REV_SQL = """CAST(l_extendedprice AS DECIMAL(12,4))
             * (CAST(1.0 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"""


def _rev():
    return dec("l_extendedprice") * (one() - F.col("l_discount").cast("decimal(6,4)"))


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_type,
           CAST(sp.cost AS DOUBLE) AS supplycost
    FROM part p
    JOIN supply sp  ON p.p_partkey = sp.l_partkey
    JOIN supplier s ON sp.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
      AND r.r_name = 'ASIA'
      AND sp.cost = (
        SELECT MIN(sp2.cost)
        FROM supply sp2
        JOIN supplier s2 ON sp2.l_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE sp2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 variant: cheapest regional supplier per part. partsupp is
    derived from lineitem (supply cost = minimum observed unit price —
    one IEEE division per row and MIN are both order-independent, so the
    doubles match DuckDB's bit-for-bit and the min-equality can't
    straddle). The official correlated MIN becomes a window MIN over the
    region-filtered supply — one shuffle instead of a re-executed
    subquery, which is the decorrelation Catalyst would want anyway."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    regional = (
        supply.join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("_min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("_min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.col("cost").cast("double").alias("supplycost"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    The nation-pair disjunction lands on two broadcast copies of nation;
    only lineitem⋈orders⋈customer shuffle."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), "revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             {REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional market volume per year —
    conditional decimal sum over an 8-table join; both sums exact, the
    single division done in double on both engines."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _rev()
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nation_vol).cast("double").alias("_nat"),
            F.sum(vol).cast("double").alias("_all"),
        )
        .select(
            "o_year", (F.col("_nat") / F.col("_all")).cast("double").alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                      * (CAST(1.0 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))
                    - CAST(p.p_retailprice * 0.5 AS DECIMAL(12,4))
                      * CAST(l.l_quantity AS DECIMAL(8,0)))
                AS DOUBLE) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 variant: profit per supplier-nation per order year. The
    fixtures have no partsupp, so supply cost is half the part's retail
    price (the 0.5 scaling folded into the per-row double before the
    decimal cast — identical rounding on both engines); the official
    query's 5-way join + two-level group key are unchanged."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    cost = (F.col("p_retailprice") * F.lit(0.5)).cast(D12) * F.col("l_quantity").cast(
        "decimal(8,0)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(_rev() - cost, "sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey AS ps_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                 * CAST(l.l_quantity AS DECIMAL(8,0))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      GROUP BY l.l_partkey
    )
    SELECT ps_partkey, CAST(v AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM pv)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 variant: parts whose traded value exceeds a fraction of
    the national total. lineitem stands in for partsupp (value =
    extendedprice*quantity, same group-by-part + HAVING-vs-global-scalar
    shape). Through the SQL front-end so Catalyst plans the threshold as a
    one-row ScalarSubquery, not a nested-loop join; the fraction test runs
    in double on both engines — the exact decimal sums convert identically
    and 0.001*total rounds identically."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q11_l")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("_q11_s")
    t(spark, sf_dir, "nation").createOrReplaceTempView("_q11_n")
    return spark.sql(
        """
        WITH pv AS (
          SELECT /*+ BROADCAST(s, n) */ l.l_partkey AS ps_partkey,
                 SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
                     * CAST(l.l_quantity AS DECIMAL(8,0))) AS v
          FROM _q11_l l
          JOIN _q11_s s ON l.l_suppkey = s.s_suppkey
          JOIN _q11_n n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
          GROUP BY l.l_partkey
        )
        SELECT ps_partkey, CAST(v AS DOUBLE) AS part_value
        FROM pv
        WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM pv)
        """
    )


@register(
    "q12_shipping_modes",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 variant: late-shipment priority split. The fixtures have
    no l_shipmode/commitdate/receiptdate, so 'late' is shipped >60 days
    after ordering and the group key is l_returnflag; the official
    conditional-count-over-join shape is unchanged."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer — left outer join
    with an extra join-side predicate (priority stands in for the comment
    filter), then two cascaded aggregations. COUNT(col) counts only
    matched rows, so no-order customers land in the c_count=0 bucket."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    view is computed once and self-compared against its own MAX via a
    broadcast scalar; the equality runs on exact decimals, so ties are
    found exactly, not within an epsilon."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "q16_parts_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 variant: distinct supplier count per (brand, type, size).
    DISTINCT(l_partkey, l_suppkey) from lineitem stands in for partsupp;
    the negative-acctbal supplier exclusion keeps the official NOT IN
    subquery (→ broadcast anti join on a null-free key)."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, SUM(l_quantity) AS tq, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))) / 7.0 AS DOUBLE)
             AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND l.l_quantity * 5.0 * pa.cnt < pa.tq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    `l_quantity < 0.2*AVG(l_quantity)` is restated as the exact integer
    comparison `5*qty*count < sum` — quantities are whole numbers, so
    neither engine rounds and the boundary case can't flip. Brand filter
    substitutes for the missing p_container."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum("l_quantity").alias("tq"), F.count(F.lit(1)).alias("cnt")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") * F.lit(5.0) * F.col("cnt") < F.col("tq"))
        .agg(
            (F.sum(dec("l_extendedprice")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 240
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the largest orders — IN over a
    HAVING-filtered aggregate (→ semi join on the pre-aggregated order
    keys, ~2% selectivity at threshold 240), then re-aggregate the
    surviving orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_ok"))
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 240)
        .select("big_ok")
    )
    return (
        li.join(big, li.l_orderkey == F.col("big_ok"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity"), "sum_qty"))
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#10' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity conjunctions as the
    join post-filter (container/shipmode clauses dropped with the missing
    columns). Catalyst extracts the common p_partkey equi-key so this
    stays a broadcast hash join, not a nested-loop."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#10")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q20_dominant_supplier",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    pt AS (SELECT l_partkey, SUM(qty) AS total FROM pq GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN pq ON s.s_suppkey = pq.l_suppkey
    JOIN pt ON pq.l_partkey = pt.l_partkey
    WHERE pq.qty * 2 > pt.total
    """,
)
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 variant: suppliers who shipped the majority of some
    part's annual volume (availqty>half-of-shipped restated without
    partsupp). Two-level aggregate reuses the first shuffle's
    partitioning; `qty*2 > total` keeps the halving exact in decimal."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(dec("l_quantity")).alias("qty"))
    pt = pq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total")
    )
    return (
        pq.join(pt, pq.l_partkey == F.col("pt_partkey"))
        .filter(F.col("qty") * 2 > F.col("total"))
        .join(F.broadcast(s), pq.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s.s_name, n.n_name AS nation, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
    GROUP BY s.s_name, n.n_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 variant: the sole late supplier on finished multi-supplier
    orders ('late' = shipped >100 days after ordering, standing in for the
    missing receipt/commit dates). EXISTS → semi join, NOT EXISTS → anti
    join, both self-joins on lineitem with an inequality on the supplier."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"),
        F.col("l_suppkey").alias("l3_sk"),
        F.col("l_shipdate").alias("l3_ship"),
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("l2_ok")) & (l1.l_suppkey != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk"))
            & (F.col("l3_ship") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,4))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 variant: wealthy-but-dormant customers per nation.
    Nation-key list stands in for the phone country codes and 'dormant'
    means no order in the last 13 months (every fixture customer has
    *some* order). The above-average threshold is SUM(decimal)/COUNT —
    exact numerator, one double division, identical on both engines —
    rather than AVG(double), which is order-dependent. Through the SQL
    front-end: the threshold plans as a one-row ScalarSubquery and the
    NOT EXISTS decorrelates to a left anti join."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("_q22_c")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_q22_o")
    return spark.sql(
        """
        SELECT c.c_nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS totacctbal
        FROM _q22_c c
        WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c.c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,4))) AS DOUBLE)
                   / COUNT(*)
            FROM _q22_c c2
            WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (
            SELECT 1 FROM _q22_o o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY c.c_nationkey
        """
    )


@register(
    "mart_clv_deciles",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey,
             CAST(coalesce(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                  AS BIGINT) AS spend_cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
      SELECT *, ntile(10) OVER (PARTITION BY c_mktsegment
                                ORDER BY spend_cents DESC, c_custkey)
               AS decile
      FROM spend
    )
    SELECT c_mktsegment, decile,
           count(*) AS n_customers,
           CAST(SUM(spend_cents) AS BIGINT) AS total_cents,
           min(spend_cents) AS floor_cents,
           max(spend_cents) AS ceil_cents
    FROM ranked
    GROUP BY c_mktsegment, decile
    """,
)
def mart_clv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value decile mart (the TPC-DS-style reporting
    composite): per market segment, rank customers by total order spend
    into deciles and report each band's population and spend envelope —
    the query behind tiered-pricing / churn dashboards. Pipeline: one
    customer⋈orders shuffle (orders pre-aggregated per custkey before the
    join at scale via partial aggs), then the per-segment decile comes
    from ``ntile_from_rank`` over the GROUPED partition-offset rank
    (``functions.rank.grouped_rank``, r5) — an ``ntile(10) OVER
    (PARTITION BY segment)`` would cap the per-customer table at 5 tasks
    (the r4 low-cardinality-window disease); the grouped rank
    range-partitions on (segment, spend, custkey) and reproduces SQL
    ntile's bucket arithmetic exactly — and a tiny final rollup. Spend
    is integer cents end-to-end — exact on both engines."""
    from bishe_gpu_database_spark.functions.rank import grouped_rank, ntile_from_rank

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.coalesce(F.sum(cents), F.lit(0)).cast("bigint").alias("spend_cents"))
    )
    ranked = grouped_rank(
        spend,
        ["c_mktsegment"],
        [F.col("spend_cents").desc(), F.col("c_custkey").asc()],
        rank_col="_rk",
        count_col="_n",
    )
    return (
        ranked.withColumn("decile", ntile_from_rank("_rk", "_n", 10))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_cents").cast("bigint").alias("total_cents"),
            F.min("spend_cents").alias("floor_cents"),
            F.max("spend_cents").alias("ceil_cents"),
        )
    )


@register(
    "mart_pareto_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey,
             CAST(coalesce(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                  AS BIGINT) AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, cents,
             row_number() OVER w AS rnk,
             sum(cents) OVER (PARTITION BY c_mktsegment) AS seg_total,
             sum(cents) OVER (w ROWS UNBOUNDED PRECEDING) AS run_cents,
             count(*) OVER (PARTITION BY c_mktsegment) AS seg_customers
      FROM spend
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents DESC, c_custkey)
    )
    SELECT c_mktsegment,
           min(seg_customers) AS n_customers,
           CAST(min(seg_total) AS BIGINT) AS seg_total_cents,
           min(CASE WHEN run_cents * 100 >= seg_total * 80 THEN rnk END)
             AS n_top_for_80pct,
           CAST(min(CASE WHEN run_cents * 100 >= seg_total * 80 THEN rnk END)
                * 1000 // min(seg_customers) AS BIGINT) AS permille_of_base
    FROM ranked
    GROUP BY c_mktsegment
    """,
)
def mart_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue-concentration mart: per market segment, how
    many top customers it takes to cover 80% of segment revenue, and
    what share of the base that is (in permille) — the concentration KPI
    behind account-tiering decisions. One segment-partitioned window
    pass over per-customer spend (running sum + rank), then the
    threshold rank is a conditional MIN; the 80% test is cross-
    multiplied (run·100 ≥ total·80) so it is pure int64 and safe from
    percentage rounding. Rank, running sum, segment total, and segment
    count all come from ONE ``functions.rank.grouped_rank`` pass (r5) —
    a window PARTITIONED by the 5-value segment key would cap the
    per-customer table at 5 tasks forever (the r4
    low-cardinality-window disease); the grouped rank range-partitions
    on (segment, spend, custkey), and per-customer spend
    partial-aggregates before the one customer-key shuffle."""
    from bishe_gpu_database_spark.functions.rank import grouped_rank

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.coalesce(F.sum(cents), F.lit(0)).cast("bigint").alias("cents"))
    )
    ranked = grouped_rank(
        spend,
        ["c_mktsegment"],
        [F.col("cents").desc(), F.col("c_custkey").asc()],
        rank_col="rnk",
        count_col="seg_customers",
        running={"cents": "run_cents"},
        totals={"cents": "seg_total"},
    ).select("c_mktsegment", "cents", "rnk", "seg_total", "run_cents", "seg_customers")
    hit = F.when(
        F.col("run_cents") * 100 >= F.col("seg_total") * 80, F.col("rnk")
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.min("seg_customers").alias("n_customers"),
        F.min("seg_total").cast("bigint").alias("seg_total_cents"),
        F.min(hit).alias("n_top_for_80pct"),
        F.expr(
            "CAST(min(CASE WHEN run_cents * 100 >= seg_total * 80 THEN rnk END)"
            " * 1000 DIV min(seg_customers) AS BIGINT)"
        ).alias("permille_of_base"),
    )


@register(
    "mart_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             sum(CAST(round(o.o_totalprice * 100) AS HUGEINT)) AS rev_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    with_prev AS (
      SELECT segment, month, rev_cents,
             lag(rev_cents) OVER (PARTITION BY segment ORDER BY month) AS prev_cents
      FROM monthly
    )
    SELECT segment, month,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           CAST(CASE WHEN prev_cents > 0
                     THEN (rev_cents - prev_cents) * 1000000 // prev_cents
                END AS BIGINT) AS growth_ppm
    FROM with_prev
    """,
)
def mart_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per market segment — the
    ubiquitous BI reporting mart: monthly DECIMAL-exact cent totals,
    lag() for the prior month, growth in integer ppm with the division
    guarded and DECIMAL/HUGEINT-routed (rev·10⁶ wraps int64 once a
    month's revenue passes ~$92 billion — reachable at 100 TB, the
    ADVICE.md overflow class). Shape: a plain join Catalyst
    sizes (customer broadcasts while it fits, shuffles when it no
    longer does — forcing the hint would OOM at SF-scale customer
    counts), one month×segment hash
    aggregate — map-side combinable, dimension-sized output — then a
    lag window over the TINY mart, not the fact table. At 100 TB the
    expensive pass is the aggregate the dashboard already needs; the
    growth column is free on top."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("MONTH", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")).alias(
                "rev_cents"
            )
        )
    )
    w = W.partitionBy("segment").orderBy("month")
    wp = monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return wp.select(
        "segment",
        "month",
        F.col("rev_cents").cast("bigint").alias("rev_cents"),
        F.col("prev_cents").cast("bigint").alias("prev_cents"),
        F.expr(
            "CAST(CASE WHEN prev_cents > 0"
            "          THEN (rev_cents - prev_cents) * 1000000 DIV prev_cents"
            "     END AS BIGINT)"
        ).alias("growth_ppm"),
    )


@register(
    "mart_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS k,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS rec_days,
             count(*) AS freq,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT k, cents,
             ntile(5) OVER (ORDER BY rec_days DESC, k) AS r,
             ntile(5) OVER (ORDER BY freq, k) AS f,
             ntile(5) OVER (ORDER BY cents, k) AS m
      FROM cust
    )
    SELECT r, f, m,
           count(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY r, f, m
    """,
)
def mart_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the canonical marketing mart: per customer
    Recency (days since last order, relative to the corpus max date),
    Frequency (order count) and Monetary (exact lifetime cents), each
    quintiled with ntile(5) and a deterministic custkey tie-break
    (score 5 = most recent / most frequent / highest spend), then
    rolled up to (r, f, m) cells with customer counts and exact revenue.
    One fact shuffle builds the per-customer table (checkpointed once —
    it feeds four consumers); the three axes are then UNIONED under an
    axis tag into one narrow (axis, value, custkey) stream and ranked by
    ONE ``grouped_rank`` partitioned on the tag — a single range shuffle
    replaces r4's three sequential full-width global_rank checkpoints
    and, because grouped_rank has no driver-side collect, the WHOLE
    query is one execution with zero build-time jobs (r4 verdict
    item 3). The exact ntile boundary filter keeps each axis's four
    QUINTILE CUT TUPLES — the (value, custkey) order keys of the last
    row of buckets 1–4 — folded into three 4-struct arrays in a 1-row
    broadcast; on the customer table bucket = 1 + #cuts strictly below
    the row's own tuple (exact ntile semantics, unique-key tie-break).
    The 'champions' cell is (5,5,5), 'at-risk big spenders' are (1,·,5)
    — the cells a retention campaign actually targets."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # r10 optimization (guide §1.2: don't compute what you throw away):
    # the oracle's recency axis orders by rec_days DESC = days-to-corpus-
    # max ASC of last_order — but subtracting the corpus max shifts every
    # value by the SAME constant, so ranking/bucketing by plain
    # days-since-epoch of last_order is order-identical and the whole
    # max(o_orderdate) subtree (a second full orders scan + 1-row
    # broadcast) disappears: ONE fact scan feeds the query.
    cust = (
        o.groupBy("k")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    from bishe_gpu_database_spark.functions.rank import grouped_rank, ntile_from_rank

    # One narrow per-customer table, materialized once — it feeds FOUR
    # subtrees (three axis projections + the final assignment scan), and
    # the checkpoint is what makes that one-pass: ReuseExchange does NOT
    # deduplicate the orders aggregate across the four copies here
    # (measured: dropping the checkpoint ran the scan 4x concurrently,
    # 3.1s vs 1.8s at sf0.1). eager=False defers the 3 stage jobs to the
    # first consumer, so plan-only construction stays free.
    cust = cust.localCheckpoint(eager=False)

    # The three quintile axes as ONE tagged (axis, v, key) stream —
    # grouped_rank partitioned on the tag ranks all three in a single
    # range shuffle with no driver collect. Axis order keys are cast to
    # one bigint domain (recency DESC becomes last_order days ASC — see
    # the constant-shift note above).
    axes = {
        "r": F.datediff("last_order", F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        ),
        "f": F.col("freq").cast("bigint"),
        "m": F.col("cents").cast("bigint"),
    }
    proj = None
    for nm, v in axes.items():
        p = cust.select(
            F.lit(nm).alias("axis"), v.alias("v"), F.col("k").alias("kk")
        )
        proj = p if proj is None else proj.unionByName(p)
    ranked = grouped_rank(
        proj,
        ["axis"],
        [F.col("v").asc(), F.col("kk").asc()],
        rank_col="_rk",
        count_col="_n",
    )
    # Exact ntile(5) boundaries: the last row of buckets 1..4 per axis —
    # rank rk is a boundary iff bucket(rk) != bucket(rk+1).
    bkt = ntile_from_rank("_rk", "_n", 5)
    nxt = ntile_from_rank("(_rk + 1)", "_n", 5)
    cuts = ranked.filter((F.col("_rk") < F.col("_n")) & (bkt != nxt))
    carr = cuts.agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("axis") == nm,
                        F.struct(F.col("v"), F.col("kk").alias("k")),
                    )
                )
            ).alias(f"cuts_{nm}")
            for nm in axes
        ]
    )

    def bucket(vcol, cuts_name):
        # 1 + number of cut tuples strictly below this row's (v, custkey)
        # tuple == the exact ntile(5) bucket under the unique-key order.
        below = F.filter(
            F.col(cuts_name),
            lambda c: (vcol > c["v"])
            | ((vcol == c["v"]) & (F.col("k") > c["k"])),
        )
        return (F.size(below) + 1).cast("int")

    scored = cust.crossJoin(F.broadcast(carr)).select(
        "cents",
        bucket(axes["r"], "cuts_r").alias("r"),
        bucket(axes["f"], "cuts_f").alias("f"),
        bucket(axes["m"], "cuts_m").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("segment_cents"),
    )
