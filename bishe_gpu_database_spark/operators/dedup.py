"""Deduplication operators for training-data pipelines.

Four tiers over the ``documents`` table, each a first-class engine
operator with a DuckDB oracle:

- exact (md5 fingerprint groupBy),
- n-gram Jaccard (w-shingling + shingle-join),
- MinHash + LSH banding (the 100 TB near-dup path),
- SimHash (bitwise fingerprint).

Scale notes: exact dedup is one shuffle on the fingerprint. The shingle
join's fan-out is bounded because shingles are 5-word (rare); at 100 TB
you additionally band MinHash signatures so candidate generation is a
join on (band_id, band_hash) — implemented here — instead of raw
shingles. Everything is built-in expression work; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bishe_gpu_database_spark.functions.text import (
    MINHASH_PRIME,
    h48,
    minhash_sigs_of,
    norm_text,
    shingles_of,
    tokens,
)
from bishe_gpu_database_spark.operators.relational import t, widen
from bishe_gpu_database_spark.registry import register

# Shared SQL fragments for the oracles (DuckDB list lambdas).
_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_SHINGLES = f"""
  list_distinct(list_transform(
    generate_series(1, greatest(len(string_split({_SQL_NORM}, ' ')) - 4, 0)),
    i -> array_to_string(string_split({_SQL_NORM}, ' ')[i:i+4], ' ')))
"""
_SQL_H48 = "('0x' || substr(md5({x}), 1, 12))::BIGINT"


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_SQL_NORM}) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → md5 fingerprint → keep min doc_id per
    group. One hash-shuffle on the fingerprint; at 100 TB the fingerprint
    (16 bytes) shuffles instead of the document bytes."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by exact 5-word-shingle Jaccard ≥ 0.1.
    Shingle inverted-index join: shuffle on shingle, then per-pair count —
    the classic MapReduce formulation; rare shingles keep fan-out linear."""
    d = widen(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toks.select("doc_id", F.explode(shingles_of(F.col("toks"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jacc = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jacc >= 0.1)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


_N_HASHES = 16
_BAND_SIZE = 4


def _doc_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sigs: array<bigint>[16]) — the whole MinHash pipeline as
    narrow map-side stages. Each intermediate array (tokens, shingle
    hashes) is materialized as its own projection so lambdas only read
    attributes: HOFs are interpreted with no subexpression elimination,
    so an inline expression inside a lambda re-evaluates per element.
    The signature (16 ints) is all that ever shuffles.
    (InferFiltersFromGenerate is excluded session-wide by ``t()`` — it
    would clone the signature expression into a filter below the widen()
    repartition, running the minhash twice, once single-threaded.)"""
    d = widen(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    # POLICY: documents with zero shingles (fewer than the 5-token
    # shingle width — empty, whitespace-only, or near-empty text) are
    # excluded from minhash. Without this, every such doc carries the
    # IDENTICAL init-array signature, so all of them band-join into one
    # phantom all-pairs clique — at corpus scale, millions of empty docs
    # become a quadratic candidate bomb and a giant fake duplicate
    # cluster. The oracle's unnest drops them naturally; the engine must
    # match (found by the r4 perturbed-fixture sweep,
    # scripts/perturbed_parity.py). The predicate is the CHEAP token
    # count (zero shingles ⟺ tokens < width) — filtering on size(xs)
    # would let predicate pushdown inline the whole minhash expression
    # into the filter and evaluate it twice per row.
    toks = toks.filter(F.size("toks") >= 5)
    xs = toks.select(
        "doc_id", F.transform(shingles_of(F.col("toks")), lambda s: h48(s)).alias("xs")
    )
    return xs.select("doc_id", minhash_sigs_of(F.col("xs"), _N_HASHES).alias("sigs"))


@register(
    "dedup_minhash_signature",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_H48.format(x='shingle')} AS x
      FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents)
    ),
    hashes AS (
      SELECT doc_id, i, min(((2*i + 1) * x + 1000003*i) % {MINHASH_PRIME}) AS sig
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_N_HASHES - 1})) AS i)
      GROUP BY doc_id, i
    )
    SELECT doc_id, i AS hash_id, sig FROM hashes
    """,
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 universal hashes over 48-bit shingle hashes),
    computed entirely map-side; exploded here only to match the row-per-
    (doc, hash) oracle shape."""
    return _doc_sigs(spark, sf_dir).select("doc_id", F.posexplode("sigs")).select(
        "doc_id", F.col("pos").alias("hash_id"), F.col("col").alias("sig")
    )


def _band_rows(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash): LSH banding of a (doc_id, sigs)
    frame — 4 bands x 4 signature rows, each band md5-collapsed. Narrow
    map-side work; shared by the all-pairs and incremental dedup ops."""
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(_N_HASHES // _BAND_SIZE - 1)),
        lambda bidx: F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sigs"), bidx * _BAND_SIZE + 1, _BAND_SIZE),
                    lambda s: s.cast("string"),
                ),
            )
        ),
    )
    return sigs.select("doc_id", F.posexplode(band_hashes)).select(
        "doc_id", F.col("pos").alias("band_id"), F.col("col").alias("band_hash")
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_H48.format(x='shingle')} AS x
      FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents)
    ),
    sig AS (
      SELECT doc_id, i, min(((2*i + 1) * x + 1000003*i) % {MINHASH_PRIME}) AS sig
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_N_HASHES - 1})) AS i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band_id,
             md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)) AS band_hash
      FROM sig GROUP BY doc_id, i // {_BAND_SIZE}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signature (4 bands × 4 rows): candidate
    pairs are docs agreeing on any full band. Signatures and band hashes
    are all narrow map-side work; the (band_id, band_hash) equi-join is
    the only pairwise step and its fan-out is controlled by band collision
    probability, not corpus size."""
    bands = _band_rows(_doc_sigs(spark, sf_dir))
    a = bands.alias("a")
    # SHUFFLE_HASH instead of the default broadcast: with a broadcast
    # build side the whole signature pipeline (the expensive part) runs
    # TWICE — once for the stream side, once inside the broadcast. Two
    # identical hash exchanges let the signatures be computed once and
    # the shuffle output shared (measured ~2.5x on the fixture), and at
    # corpus scale the band table outgrows broadcast range anyway.
    b = bands.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_H48.format(x='tk')} AS x
      FROM (SELECT doc_id,
                   unnest(list_distinct(string_split({_SQL_NORM}, ' '))) AS tk
            FROM documents)
    ),
    bits AS (
      SELECT doc_id, b,
             CASE WHEN sum(CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
                  THEN 1::BIGINT << b ELSE 0 END AS bit_val
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
      GROUP BY doc_id, b
    )
    SELECT doc_id, sum(bit_val) AS simhash16 FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct tokens: per bit, majority vote of
    token-hash bits. Near-dups differ in few bits (hamming ≤ 3 — checked
    in the pytest suite); the fingerprint itself is oracle-checked here."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tk")
    ).select("doc_id", h48(F.col("tk")).alias("x"))
    bits = tok.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"), "x")
    bit_is_set = F.expr("shiftright(x, b) & 1") == 1
    per_bit = bits.groupBy("doc_id", "b").agg(
        F.when(
            F.sum(F.when(bit_is_set, 1).otherwise(-1)) > 0,
            F.expr("shiftleft(CAST(1 AS BIGINT), b)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("bit_val")
    )
    return per_bit.groupBy("doc_id").agg(F.sum("bit_val").alias("simhash16"))


_SQL_LSH_PAIRS = f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_H48.format(x='shingle')} AS x
      FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents)
    ),
    sig AS (
      SELECT doc_id, i, min(((2*i + 1) * x + 1000003*i) % {MINHASH_PRIME}) AS sig
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_N_HASHES - 1})) AS i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band_id,
             md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)) AS band_hash
      FROM sig GROUP BY doc_id, i // {_BAND_SIZE}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
"""


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (SELECT * FROM ({_SQL_LSH_PAIRS}) p),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the LSH candidate-pair
    graph by iterative min-label propagation — the step that turns
    pairwise candidates into keep/drop groups (cluster_id = min doc_id =
    the canonical keeper). Each iteration is one shuffle (neighbor-min
    join + groupBy); iterations = graph diameter, and near-dup components
    are tiny in practice, so the loop converges in a handful of rounds at
    any corpus size. Oracle: DuckDB recursive-CTE transitive closure."""
    # EAGER on purpose: the edges union reads pairs twice (u→v and v→u)
    # within ONE job — with a deferred checkpoint the two union branches
    # race to materialize the same partitions and the LSH pipeline runs
    # twice (measured 1.6 → 3.0 s); the dedicated materialization job is
    # what guarantees single evaluation.
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).localCheckpoint()
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint()
    )
    labels = edges.select("u").distinct().select("u", F.col("u").alias("label"))
    for _ in range(32):  # diameter bound; tiny components converge fast
        neigh_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        # Convergence flag rides the label update itself (label shrank ⟺
        # nlabel < label), so the old per-iteration labels⋈new_labels
        # re-join + count job collapses into one count over the freshly
        # checkpointed blocks (r10, guide §1.2: fewer passes per round).
        new_labels = (
            labels.join(neigh_min, "u", "left")
            .select(
                "u",
                F.least("label", F.coalesce("nlabel", "label")).alias("label"),
                F.coalesce(F.col("nlabel") < F.col("label"), F.lit(False)).alias(
                    "_chg"
                ),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id, ts AS latest_ts,
           n_versions
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed record dedup by recency — the CDC-compaction idiom: keep only
    the newest version per (user_id, event_type), with event_id as the
    total-order tie-break. One window shuffle on the key; at 100 TB this
    is exactly the log-compaction pass a snapshot build runs, and AQE
    splits any hot key's sort. Complements content dedup (dedup_exact):
    that collapses identical payloads, this collapses superseded ones."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = W.partitionBy("user_id", "event_type")
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_versions"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_apply_canonical",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (SELECT * FROM ({_SQL_LSH_PAIRS}) p),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT d.doc_id, d.source, d.n_chars,
           c.doc_id IS NOT NULL AS was_clustered
    FROM documents d LEFT JOIN comp c USING (doc_id)
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    """,
)
def dedup_apply_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final APPLY step: materialize the surviving
    corpus — every unclustered document plus exactly one canonical keeper
    (min doc_id) per near-dup cluster. Composes shingle→minhash→LSH→
    connected components (dedup_clusters) with a broadcast keep/drop join
    against the corpus: the cluster table is tiny relative to the corpus
    (only docs that had a near-dup), so at 100 TB the apply is a broadcast
    anti-join — the full corpus streams through map-side, no shuffle."""
    clusters = dedup_clusters(spark, sf_dir)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    keepers = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    d = t(spark, sf_dir, "documents")
    return (
        d.join(F.broadcast(drop), "doc_id", "left_anti")
        .join(F.broadcast(keepers.withColumn("was_clustered", F.lit(True))), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("was_clustered", F.lit(False)).alias("was_clustered"),
        )
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
             AS containment
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup by shingle CONTAINMENT (|A∩B| / min(|A|,|B|) ≥
    0.5) — catches a short document embedded in a long one, which Jaccard
    structurally misses (the union term drowns the overlap when sizes
    differ). The LLM-corpus case is boilerplate-wrapped reposts and
    quote-heavy pages. Same inverted-index join as dedup_ngram_jaccard —
    shuffle on shingle, per-pair count, broadcast size join — only the
    normalizer changes, so the scale contract is identical."""
    d = widen(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toks.select("doc_id", F.explode(shingles_of(F.col("toks"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("n_inter").cast("double") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(cont >= 0.5)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


@register(
    "dedup_url_canonical",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'https://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
               || 'cdn' || (doc_id % 4) || '.Example.COM/docs/' || (doc_id // 7)
               || CASE WHEN doc_id % 2 = 0
                       THEN '/?utm_source=feed&utm_campaign=x&id=' || (doc_id // 7)
                       ELSE '?id=' || (doc_id // 7) END
               || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url),
               '#.*$', ''),
               'utm_[^&#]*&', '', 'g'),
               '[?&]utm_[^&#]*$', ''),
               '://www\\.', '://'),
               '/\\?', '?') AS curl
      FROM raw
    )
    SELECT curl AS canonical_url,
           count(*) AS n_docs,
           min(doc_id) AS keeper_doc_id
    FROM canon
    GROUP BY curl
    HAVING count(*) > 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the web-crawl companion to content
    dedup: the same page arrives under www./apex hosts, mixed case, utm_*
    tracking params, and #fragments. Canonicalize (lowercase, strip
    fragment, strip utm_* params, drop www., collapse the empty-path '/?')
    and keep the min-doc_id fetch per canonical URL. All four rewrites are
    codegen'd regexes — a narrow map — and the only shuffle carries the
    canonical URL groups. (URLs are synthesized from the fixture
    deterministically, same expression both engines, so the grouping is
    hash-gated end-to-end.)"""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("cdn"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".Example.COM/docs/"),
        (F.col("doc_id") / 7).cast("bigint").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("/?utm_source=feed&utm_campaign=x&id="),
                (F.col("doc_id") / 7).cast("bigint").cast("string"),
            ),
        ).otherwise(
            F.concat(F.lit("?id="), (F.col("doc_id") / 7).cast("bigint").cast("string"))
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(url), r"#.*$", ""),
                    r"utm_[^&#]*&",
                    "",
                ),
                r"[?&]utm_[^&#]*$",
                "",
            ),
            r"://www\.",
            "://",
        ),
        r"/\?",
        "?",
    )
    return (
        d.select("doc_id", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_H48.format(x='shingle')} AS x
      FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents)
    ),
    sig AS (
      SELECT doc_id, i, min(((2*i + 1) * x + 1000003*i) % {MINHASH_PRIME}) AS sig
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_N_HASHES - 1})) AS i)
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // {_BAND_SIZE} AS band_id,
             md5(string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)) AS band_hash
      FROM sig GROUP BY doc_id, i // {_BAND_SIZE}
    ),
    fp AS (SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents),
    ex AS (
      SELECT b.doc_id, min(c.doc_id) AS m
      FROM fp b JOIN fp c ON b.fingerprint = c.fingerprint
      WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
      GROUP BY b.doc_id
    ),
    nr AS (
      SELECT b.doc_id, min(c.doc_id) AS m
      FROM bands b JOIN bands c
        ON b.band_id = c.band_id AND b.band_hash = c.band_hash
      WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN ex.m IS NOT NULL THEN 'exact_dup'
                WHEN nr.m IS NOT NULL THEN 'near_dup'
                ELSE 'accept' END AS verdict,
           coalesce(ex.m, nr.m) AS matched_doc
    FROM documents d
    LEFT JOIN ex ON d.doc_id = ex.doc_id
    LEFT JOIN nr ON d.doc_id = nr.doc_id
    WHERE d.doc_id % 10 = 0
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-batch) dedup — the production crawl shape: a
    NEW batch of documents (doc_id % 10 == 0 stands in for today's
    arrivals) is screened against the EXISTING corpus, never against
    itself and never corpus-vs-corpus. Exact fingerprint match rejects
    first; otherwise any shared LSH band flags a near-dup; survivors are
    accepted, each rejection carrying its earliest matching corpus doc
    for provenance. This is ivm_incremental_agg's discipline applied to
    dedup: per-ingest cost scales with |batch| × bands, NOT |corpus|² —
    the corpus side contributes only its (fingerprint, band) index,
    which at 100 TB is a stored table maintained by appending each
    accepted batch's rows (the signatures here are recomputed only
    because the fixture has no store). Both probe joins are equi-joins
    on 16-byte digests; the batch side is the small side and broadcasts."""
    d = t(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 == 0
    fp = d.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint"))
    bands = _band_rows(_doc_sigs(spark, sf_dir))
    fp_b = fp.filter(is_batch)
    fp_c = fp.filter(~is_batch).select(
        "fingerprint", F.col("doc_id").alias("c_doc")
    )
    ex = (
        fp_b.join(fp_c, "fingerprint")
        .groupBy("doc_id")
        .agg(F.min("c_doc").alias("exact_m"))
    )
    bands_b = bands.filter(is_batch)
    bands_c = bands.filter(~is_batch).select(
        "band_id", "band_hash", F.col("doc_id").alias("c_doc")
    )
    nr = (
        bands_b.join(bands_c, ["band_id", "band_hash"])
        .groupBy("doc_id")
        .agg(F.min("c_doc").alias("near_m"))
    )
    return (
        d.filter(is_batch)
        .select("doc_id")
        .join(ex, "doc_id", "left")
        .join(nr, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_m").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_m").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("accept"))
            .alias("verdict"),
            F.coalesce("exact_m", "near_m").alias("matched_doc"),
        )
    )


@register(
    "dedup_span_level",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ') AS tk
      FROM documents
    ),
    spans AS (
      SELECT doc_id, CAST(i AS INT) AS span_idx,
             ('0x' || substr(md5(array_to_string(tk[(i - 1) * 10 + 1 : i * 10], ' ')), 1, 12))::BIGINT AS fp
      FROM toks
      CROSS JOIN unnest(generate_series(1, greatest((len(tk) + 9) // 10, 1))) AS t(i)
    ),
    ranked AS (
      SELECT doc_id, span_idx,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, span_idx) AS rn
      FROM spans
    )
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // count(*) AS kept_ppm
    FROM ranked GROUP BY doc_id
    """,
)
def dedup_span_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style span-level dedup: every non-overlapping 10-token
    span is fingerprinted and only its globally FIRST occurrence (by
    (doc_id, span_idx) total order) survives; per doc we report span
    count, surviving spans, and the kept fraction in integer ppm. Unlike
    whole-doc dedup this catches boilerplate repeated INSIDE otherwise
    unique pages — the dominant duplication mode in web corpora. Scale
    shape: spans fan out map-side; the first-occurrence rank shuffles
    48-bit digests (never text), and the per-doc rollup reuses a
    doc_id-sized aggregate — both exchanges are digest-width no matter
    the corpus size. (The reference has no text surface; this extends
    its exact-key dedup shape, ref: src/cuda/hashTable.cuh:94-110, to
    sub-document granularity.)"""
    from pyspark.sql import Window as W

    from bishe_gpu_database_spark.operators.text_analysis import widen_docs

    SPAN = 10
    d = widen_docs(spark, sf_dir)
    # NULL text folds to the empty doc (one empty span), mirrored in the
    # oracle — r5 NULL-text axis.
    toks = d.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("tk")
    )
    n_spans = F.greatest(F.ceil(F.size("tk") / SPAN).cast("int"), F.lit(1))
    spans = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_spans),
                lambda i: h48(F.concat_ws(" ", F.slice(F.col("tk"), (i - 1) * SPAN + 1, SPAN))),
            )
        ),
    ).select("doc_id", (F.col("pos") + 1).cast("int").alias("span_idx"), F.col("col").alias("fp"))
    w = W.partitionBy("fp").orderBy("doc_id", "span_idx")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.expr(
            "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000"
            " DIV count(1)"
        ).alias("kept_ppm"),
    )


@register(
    "dedup_eval_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE 3 * i.n_inter >= sa.n_sh + sb.n_sh
    ),
    sigs AS (
      SELECT doc_id,
             list_transform(generate_series(0, {_N_HASHES - 1}), i ->
               list_min(list_transform(
                 list_transform({_SQL_SHINGLES}, s -> {_SQL_H48.format(x='s')}),
                 x -> ((2 * i + 1) * x + 1000003 * i) % {MINHASH_PRIME}))) AS sigs
      FROM documents
      WHERE len({_SQL_SHINGLES}) > 0
    ),
    bands AS (
      SELECT doc_id, b AS band_id,
             md5(array_to_string(sigs[b * {_BAND_SIZE} + 1 : (b + 1) * {_BAND_SIZE}],
                                 '_')) AS band_hash
      FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {_N_HASHES // _BAND_SIZE - 1})) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    hit AS (
      SELECT count(*) AS n_hit
      FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_cand,
           (SELECT n_hit FROM hit) AS n_hit,
           CAST(CAST((SELECT n_hit FROM hit) AS HUGEINT) * 1000000
                // nullif((SELECT count(*) FROM cand), 0) AS BIGINT) AS precision_ppm,
           CAST(CAST((SELECT n_hit FROM hit) AS HUGEINT) * 1000000
                // nullif((SELECT count(*) FROM truth), 0) AS BIGINT) AS recall_ppm
    """,
)
def dedup_eval_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality evaluation: precision/recall of the MinHash-LSH
    candidate pairs against exact-Jaccard ≥ ½ ground truth (the integer
    inequality 3·|∩| ≥ |A|+|B| — no float threshold to disagree on).
    This is the measurement behind choosing bands × rows BEFORE running
    banding over a full corpus; at 100 TB the truth side runs on a
    sampled stratum exactly like this fixture. Composes the registered
    LSH operator with the shingle-join truth pipeline in one plan;
    output is a single audit row."""
    d = widen(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toks.select("doc_id", F.explode(shingles_of(F.col("toks"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b").hint("shuffle_hash")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    truth = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(3 * F.col("n_inter") >= F.col("n_a") + F.col("n_b"))
        .select("doc_a", "doc_b")
    )
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    stats = (
        truth.withColumn("in_t", F.lit(1))
        .join(cand.withColumn("in_c", F.lit(1)), ["doc_a", "doc_b"], "full")
        .agg(
            F.count("in_t").cast("bigint").alias("n_truth"),
            F.count("in_c").cast("bigint").alias("n_cand"),
            # coalesce: SUM over an empty pair set is NULL, the oracle's
            # count(*) is 0 (r5 empty-fixture axis)
            F.coalesce(F.sum(F.col("in_t") * F.col("in_c")), F.lit(0))
            .cast("bigint")
            .alias("n_hit"),
        )
    )
    return stats.select(
        "n_truth",
        "n_cand",
        "n_hit",
        # DECIMAL(38,0): global pair counts·10⁶ wrap int64 at corpus scale
        F.expr(
            "CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 DIV nullif(n_cand, 0) AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 DIV nullif(n_truth, 0) AS BIGINT)"
        ).alias("recall_ppm"),
    )


@register(
    "dedup_prefix_filter_join",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.3
    """,
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard >= 0.3) via PREFIX
    FILTERING (Chaudhuri et al. 2006 / PPJoin) — the scalable exact-dup
    path that complements LSH's approximate one: sort each doc's shingle
    set in a global order and index only its first n − ceil(tau*n) + 1
    shingles. Completeness proof: J(A,B) >= tau implies |A inter B| >=
    ceil(tau*|A|); let e = min(A inter B) in the global order — at least
    |A inter B| − 1 elements of A sort after e, so e sits within A's
    prefix, and symmetrically within B's — every qualifying pair shares
    a PREFIX shingle. The oracle is the brute-force all-pairs join, so
    the hash gate proves the filter loses nothing. Shape: the only
    pairwise step is the equi-join on prefix shingles (fan-out bounded
    by prefix rarity); verification reads the two sorted arrays per
    CANDIDATE pair (array_intersect), never all pairs.

    r11 (guide §1.2/§2.3, measured 4.9 → 1.2 s at sf0.1):

    - The ``filter(n > 0)`` now sits ABOVE the checkpoint. Below it,
      predicate pushdown clones ``size(array_sort(shingles_of(...)))``
      into a filter under the projection and CollapseProject inlines the
      token split into every shingle position of that clone — the whole
      shingle pipeline re-ran quadratically inside the checkpoint job
      (the exact trap dedup_minhash's token-count filter documents).
      Above the checkpoint the filter reads a materialized column.
    - The prefix index joins on 48-bit DIGESTS of the prefix shingles
      instead of the 5-word strings (the docstring's own 100 TB design):
      bigint join keys, ~5x fewer exchange bytes. Losslessness: equal
      strings hash equal, so every qualifying pair still meets on its
      prefix element; a hash collision can only ADD candidates, and the
      exact string-array verify discards them — output unchanged.
    - PPJoin's length filter rides the candidate join: J >= 0.3 forces
      10*min(|A|,|B|) >= 3*max(|A|,|B|) (J <= min/max), an exact integer
      predicate that prunes candidates before the distinct.
    - The verify keeps jaccard >= tau as the exact integer inequality
      13*I >= 3*(n_a+n_b) (algebra of I/(n_a+n_b-I) >= 3/10; equivalent
      to the double compare for any I, U with U <= ~1e12 since the
      nearest rational below 3/10 at denominator U is 1/(10U) away,
      >> one ulp of 0.3), so the pushed-into-join-condition predicate
      costs ONE array_intersect fold instead of two; the output jaccard
      double is computed once per SURVIVOR, exactly as before.

    A rarest-first (document-frequency-ascending) prefix ordering was
    also built and measured: the df table + per-doc re-rank cost more
    than the fan-out it saved at every tested scale (max prefix group
    size here is 4 — candidate fan-out is already rarity-bounded), so
    the lexical order stays."""
    tau = 0.3
    d = widen(t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    sets = (
        toks.select("doc_id", F.array_sort(shingles_of(F.col("toks"))).alias("sh"))
        .withColumn("n", F.size("sh"))
        .localCheckpoint()  # read 3x (prefix index + both verify sides)
        .filter(F.col("n") > 0)
    )
    plen = (F.col("n") - F.ceil(F.col("n") * F.lit(tau)) + 1).cast("int")
    pref = sets.select(
        "doc_id",
        "n",
        F.explode(F.transform(F.slice("sh", F.lit(1), plen), h48)).alias("p"),
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                10 * F.least(F.col("a.n"), F.col("b.n"))
                >= 3 * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .filter(13 * F.col("n_inter") >= 3 * (F.col("n_a") + F.col("n_b")))
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_editdist_fastss",
    oracle="""
    WITH seg AS (
      SELECT c_custkey AS k, c_name AS name FROM customer
      WHERE c_mktsegment = 'BUILDING'
    )
    SELECT a.k AS u, b.k AS v,
           a.name AS u_name, b.name AS v_name,
           levenshtein(a.name, b.name) AS ed
    FROM seg a JOIN seg b
      ON a.k < b.k AND levenshtein(a.name, b.name) <= 1
    """,
)
def dedup_editdist_fastss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join (all BUILDING-segment customer
    name pairs within Levenshtein distance 1) via the FastSS deletion
    neighborhood: each name generates its ≤k-deletion variants (k=1:
    itself plus the L delete-one-char strings), and two strings are
    within edit distance 1 **iff their variant sets intersect** — a
    substitution pair shares the delete-the-differing-position variant,
    an insert/delete pair shares the shorter string itself. Candidate
    generation is therefore an EQUI-join on the variant string (never the
    quadratic all-pairs the oracle brute-forces), followed by an exact
    bounded `levenshtein(u, v, 1)` verify, which early-exits at the
    threshold. Fan-out is L+1 keys per row (19 here) and variant groups
    are true near-matches only — on common-prefix-heavy data like these
    names, prefix/segment blocking schemes (PassJoin, positional q-grams)
    degenerate to all-pairs while deletion variants stay selective. At
    100 TB: map-side variant generation, one shuffle, per-group fan-out
    bounded by real duplicate density. Complements the token-level
    similarity joins (``dedup_prefix_filter_join``, MinHash/LSH): this is
    the CHARACTER-level fuzzy key-matching used for entity resolution.
    Unit of edit: Spark's levenshtein counts Unicode characters while
    some engines count bytes — identical on the ASCII keys this targets
    (ids, SKUs, account names); normalize or transliterate first for
    multi-byte alphabets."""
    return _fastss_pairs(spark, sf_dir)


def _fastss_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastSS candidate generation + bounded verify shared by the full
    pair emitter (``dedup_editdist_fastss``) and the capped per-record
    variant (``dedup_editdist_topk``). Returns u < v pairs with ed ≤ 1."""
    seg = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    variants = seg.select(
        "k",
        "name",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("name")),
                    F.expr(
                        "transform(sequence(1, length(name)),"
                        " i -> concat(substr(name, 1, i - 1), substr(name, i + 1)))"
                    ),
                )
            )
        ).alias("variant"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("u"),
            F.col("b.k").alias("v"),
            F.col("a.name").alias("u_name"),
            F.col("b.name").alias("v_name"),
        )
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col("u_name"), F.col("v_name"), 1) >= 0
    ).withColumn("ed", F.levenshtein("u_name", "v_name"))


@register(
    "dedup_editdist_topk",
    oracle="""
    WITH seg AS (
      SELECT c_custkey AS k, c_name AS name FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    pairs AS (
      SELECT a.k AS u, b.k AS v, levenshtein(a.name, b.name) AS ed
      FROM seg a JOIN seg b
        ON a.k <> b.k AND levenshtein(a.name, b.name) <= 1
    ),
    ranked AS (
      SELECT u, v, ed,
             CAST(row_number() OVER (PARTITION BY u ORDER BY ed, v) AS BIGINT) AS rk
      FROM pairs
    )
    SELECT u, v, ed, rk FROM ranked WHERE rk <= 2
    """,
)
def dedup_editdist_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped variant of the FastSS edit-distance join (r7 verdict item
    6): each record keeps only its TOP-K nearest neighbors (k = 2,
    ordered by (ed, v) — deterministic because v is unique per u) instead
    of every within-threshold pair. The uncapped join's output is
    output-bound by construction — an m-record duplicate clique MUST emit
    C(m,2) pairs — which is correct for audit-style dedup but quadratic
    in clique size for pipeline use; the cap bounds per-record output at
    k rows, so total output is ≤ k·N no matter how large the cliques
    grow (the canonical-assignment consumers downstream only need a few
    candidate edges per record anyway). Candidate generation is the SAME
    deletion-variant equi-join (never all-pairs); the cap is one
    row_number window partitioned by record key — group size = that
    record's neighbor count, partition count = N, both scale-free."""
    from pyspark.sql import Window as W

    # Symmetrize map-side (explode both orientations of each pair) so the
    # candidate join runs ONCE — a union of two selects re-executes the
    # whole FastSS join per branch (observed in the physical plan).
    pairs = _fastss_pairs(spark, sf_dir).select("u", "v", "ed")
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u").alias("u"), F.col("v").alias("v"), F.col("ed").alias("ed")
                ),
                F.struct(
                    F.col("v").alias("u"), F.col("u").alias("v"), F.col("ed").alias("ed")
                ),
            )
        ).alias("p")
    ).select("p.u", "p.v", "p.ed")
    w = W.partitionBy("u").orderBy("ed", "v")
    return (
        sym.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 2)
        .select("u", "v", "ed", "rk")
    )
