"""Corpus-curation operators for LLM training-data pipelines:
benchmark decontamination, deterministic sharding, domain-mixing
weights, and repetition-based quality scoring.

These extend the north-star text-analysis surface (BASELINE.json; the
reference delegates all data processing to an external scraper,
dags/update_tr_from_ex_dag.py:88-90) with the four curation steps every
large pretraining pipeline runs between "raw corpus" and "training
shards".  Everything is built-in-expression based — split/transform/
sequence/slice for n-grams, md5 for sharding — so the hot path stays in
whole-stage codegen and the only shuffles are the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.functions.core import spread_for_compute
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


def _tokens(text_col) -> "F.Column":
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), r"\s+")


def word_ngrams(text_col, n: int) -> "F.Column":
    """All word n-grams of ``text_col`` as an array<string>.

    Pure expression (sequence + transform + slice + array_join): stays
    inside codegen, no Python, no shuffle.  A document shorter than
    ``n`` tokens yields its single truncated gram — same convention as
    the DuckDB oracles (list_slice truncates identically).
    """
    toks = _tokens(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def decontaminate(
    train: DataFrame, eval_df: DataFrame, text_col: str, id_col: str, *, n: int = 4
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with the evaluation set.

    Physical shape: the eval side reduces to DISTINCT grams and is
    broadcast — the realistic case, since eval benchmarks are MBs while
    the training corpus is TBs; the 100 TB side is touched exactly
    once, map-side, with no shuffle of document text.  If the eval set
    ever outgrew broadcast, the same plan degrades gracefully to a
    shuffled semi-join on ``xxhash64(gram)`` (8-byte keys, not gram
    strings).

    Returns ``train`` plus a boolean ``contaminated`` column.
    """
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("gram")).distinct()
    )
    hits = (
        spread_for_compute(train)
        .select(F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram"))
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return train.join(hits, id_col, "left").fillna(False, ["contaminated"])


@declared(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(lower(text), '\\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(t) - 3, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 3), ' '))) AS gram
      FROM toks
    ), eval_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0
    ), contam AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN eval_grams e USING (gram)
      WHERE g.doc_id % 20 <> 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated
    FROM documents d LEFT JOIN contam c USING (doc_id)
    WHERE d.doc_id % 20 <> 0
    GROUP BY lang
    """,
)
def q_decontaminate(spark, sf_dir):
    """Decontamination rollup: train docs (doc_id % 20 != 0) checked
    for 4-gram overlap against the held-out eval split (doc_id % 20 ==
    0); per-lang document and contamination counts."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 20 != 0)
    eval_df = d.filter(F.col("doc_id") % 20 == 0)
    flagged = decontaminate(train, eval_df, "text", "doc_id", n=4)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
    )


@declared(
    "q_shard",
    oracle="""
    SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS BIGINT)
             AS n_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY shard
    """,
)
def q_shard(spark, sf_dir):
    """Deterministic training-shard assignment: shard = first hex char
    of md5(doc_id) — 16 uniform, engine-portable shards (md5 hex is
    identical everywhere, unlike engine-native hash functions).  At
    100 TB the same expression feeds ``write.partitionBy("shard")`` so
    every trainer reads its shard with partition pruning; here it rolls
    up per-shard doc/token/source balance, which is also the skew check
    you run before committing to a shard count."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    return (
        d.withColumn("shard", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(_tokens("text"))).alias("n_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@declared(
    "q_mix_weights",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), t AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS n_src
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           round(least(1.0, (total / n_src) / n_tokens), 6) AS weight
    FROM s, t
    """,
)
def q_mix_weights(spark, sf_dir):
    """Domain-mixing weights: per-source sampling weight that equalizes
    token budget across sources (weight = min(1, fair_share/tokens)) —
    the deterministic arithmetic behind temperature/uniform data-mixing
    schedules.  Two tiny shuffles (per-source agg, then a 1-row
    broadcast of the totals); the corpus itself is read once."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens("text"))).alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_src"),
    )
    fair = F.col("total") / F.col("n_src")
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.least(F.lit(1.0), fair / F.col("n_tokens")), 6).alias("weight"),
    )


@declared(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(lower(text), '\\s+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, lang,
             list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 1), ' ')) AS grams
      FROM toks
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(avg(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)), 6)
             AS avg_repetition
    FROM g GROUP BY lang
    """,
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signal: per-document duplicate
    word-bigram fraction (1 - distinct/total), averaged per language.
    Pure map-side expression + one agg shuffle of (lang, double)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    grams = word_ngrams("text", 2)
    rep = 1.0 - F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    return (
        spread_for_compute(d)
        .select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("rep"), 6).alias("avg_repetition"),
        )
    )
