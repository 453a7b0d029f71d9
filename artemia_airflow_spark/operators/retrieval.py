"""Lexical and hybrid retrieval operators: BM25 ranking over an
inverted-index-shaped term relation, and reciprocal-rank fusion (RRF)
of heterogeneous retriever outputs — the retrieval stack a training-
data pipeline runs for decontamination audits, more-like-this corpus
expansion, and RAG-style eval-set construction.

Everything stays in built-in expressions (the one float transcendental,
BM25's idf ``ln``, follows the q_text_tfidf precedent: JVM and libm
``log`` agree far below the 1e-6 quantization applied before any
cross-engine comparison).  Per-term contributions are quantized to
exact scaled BIGINTs *before* the per-document summation, so scores
are order-free integer sums — never an order-dependent float
aggregate — and the DuckDB oracles attest ranking and score values
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.operators.similarity import (
    _bounded_topk,
    _portable_exact_rerank,
    embedding_comps,
)
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    text_col: str,
    id_col: str,
    query_id_col: str,
    term_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Per-query BM25 top-``k`` documents (Lucene ``+1`` idf variant,
    always positive): ``score = sum_t idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))``.

    Returns (query_id, id, score_e6, rank): per-term contributions are
    half-up quantized to 1e-6-scaled BIGINTs before the per-document
    sum, so the score is an exact integer aggregate (order-free) and
    the (score desc, id) ranking is engine-portable.

    Scale shape: the corpus is scanned twice, both column-pruned to
    ``text_col`` — once exploded for per-(doc, term) frequencies
    (map-side combined), once *unexploded* for the two corpus scalars
    (doc count, token total -> avgdl), which enter the plan as a
    broadcast 1-row aggregate instead of a driver count() or an
    unpartitioned window over a corpus-sized relation.  Document
    length rides the tf relation as a per-doc window sum (the tf
    aggregate already clustered rows by doc, so no third scan).  The
    query relation broadcasts by contract (a query set is small); the
    doc-frequency relation is vocabulary-sized and meets the
    query-filtered tf rows in a token-keyed shuffle join.  The final
    per-query ranking goes through the shared two-phase
    ``_bounded_topk`` cut, so a stop-word query term never drags a
    corpus-sized candidate set into one reducer.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__term"),
    )
    tf = toks.groupBy(id_col, "__term").agg(F.count(F.lit(1)).alias("tf"))
    dl = F.sum("tf").over(Window.partitionBy(id_col))
    tf = tf.withColumn("dl", dl)
    dfreq = (
        toks.select(id_col, "__term").distinct()
        .groupBy("__term").agg(F.count(F.lit(1)).alias("df"))
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(F.size(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("__n_tok"),
    )
    hits = (
        tf.join(
            F.broadcast(queries.select(query_id_col, F.col(term_col).alias("__term"))),
            "__term",
        )
        .join(dfreq, "__term")
        .crossJoin(F.broadcast(totals))
    )
    n_docs = F.col("__n_docs").cast("double")
    avgdl = F.col("__n_tok").cast("double") / F.col("__n_docs")
    idf = F.log(
        (n_docs - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    norm = (tfd * F.lit(k1 + 1)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    contrib = F.floor(idf * norm * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    scored = (
        hits.select(query_id_col, id_col, contrib.alias("__c"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__c").alias("score_e6"))
        .withColumn("__score", F.col("score_e6").cast("double"))
    )
    return _bounded_topk(
        scored, probe_id_col=query_id_col, id_col=id_col,
        score_col="__score", k=k,
    ).select(query_id_col, id_col, "score_e6", "rank")


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    probe_id_col: str,
    id_col: str,
    rank_col: str = "rank",
    kconst: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N retriever outputs (lexical, vector,
    ...): ``rrf_e6 = sum_lists 1000000 DIV (kconst + rank)`` — pure
    integer arithmetic, so fusion is exactly engine-portable.  A
    document absent from a list contributes nothing for that list
    (standard top-K-list RRF, the production shape: each retriever
    hands over a BOUNDED top-K, never its full ranking).

    Scale shape: the fused relation is at most ``sum(K_i)`` rows per
    probe by construction, so the final per-probe (rrf desc, id)
    window never sees more than a few hundred rows per probe — no
    partial cut needed.  Inputs union by position-independent column
    NAME (each is projected to the shared triple first).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = F.expr(f"CAST(1000000 DIV ({kconst} + {rank_col}) AS BIGINT)")
    unioned = None
    for r in rankings:
        part = r.select(F.col(probe_id_col), F.col(id_col), contrib.alias("__c"))
        unioned = part if unioned is None else unioned.unionByName(part)
    fused = (
        unioned.groupBy(probe_id_col, id_col)
        .agg(F.sum("__c").alias("rrf_e6"))
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("rrf_e6").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Declared queries
# --------------------------------------------------------------------------

_BM25_CTES = """
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dltab AS (
      SELECT doc_id, term, tf, SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM tf
    ), dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), totals AS (
      SELECT COUNT(*) AS n_docs,
             SUM(len(regexp_split_to_array(lower(text), '\\s+'))) AS n_tok
      FROM documents
    ), q AS (
      SELECT DISTINCT doc_id AS query_id, term FROM toks WHERE doc_id < 3
    ), contrib AS (
      SELECT q.query_id, d.doc_id,
        CAST(floor(
          ln((CAST(t.n_docs AS DOUBLE) - f.df + 0.5) / (f.df + 0.5) + 1.0)
          * ((CAST(d.tf AS DOUBLE) * 2.2)
             / (CAST(d.tf AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                                        / (CAST(t.n_tok AS DOUBLE) / t.n_docs)))))
          * 1000000.0 + 0.5) AS BIGINT) AS c
      FROM dltab d JOIN q USING (term) JOIN dfreq f USING (term)
      CROSS JOIN totals t
    ), scored AS (
      SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_e6
      FROM contrib GROUP BY query_id, doc_id
    ), lex AS (
      SELECT query_id, doc_id, score_e6,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_e6 DESC, doc_id) AS rank
      FROM scored
    )
"""


@declared(
    "q_retrieval_bm25",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, score_e6, CAST(rank AS BIGINT) AS rank
    FROM lex WHERE rank <= 10
    """,
)
def q_retrieval_bm25(spark, sf_dir):
    """BM25 more-like-this retrieval, FULL hash-match oracle: the
    distinct tokens of docs 0-2 are three query term-sets; top-10 docs
    per query by BM25 (k1=1.2, b=0.75, Lucene +1 idf).  Per-term
    contributions quantize to exact 1e-6 BIGINTs BEFORE the per-doc
    sum (order-free integer aggregate — float summation order never
    enters), so DuckDB attests scores and ranking bit-for-bit; the
    one transcendental (idf's ln) sits far above the quantization
    (q_text_tfidf precedent)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    qterms = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
        ).alias("term"),
    )
    out = bm25_topk(
        d, qterms, text_col="text", id_col="doc_id",
        query_id_col="query_id", term_col="term", k=10,
    )
    return out.select(
        "query_id", "doc_id", "score_e6", F.col("rank").cast("bigint").alias("rank")
    )


@declared(
    "q_retrieval_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    lexk AS (SELECT query_id, doc_id, rank FROM lex WHERE rank <= 50),
    comps AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS BIGINT) AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS v6
      FROM embeddings
    ), norms AS (
      SELECT vec_id, SUM(v6 * v6) AS n12 FROM comps GROUP BY vec_id
    ), dots AS (
      SELECT cp.vec_id AS probe_id, cc.vec_id, SUM(cc.v6 * cp.v6) AS dot12
      FROM comps cc JOIN comps cp ON cp.d = cc.d AND cp.vec_id < 3
      GROUP BY cp.vec_id, cc.vec_id
    ), vecranked AS (
      SELECT d.probe_id, d.vec_id,
             ROW_NUMBER() OVER (PARTITION BY d.probe_id ORDER BY
               CAST(d.dot12 AS DOUBLE)
                 / (sqrt(CAST(nc.n12 AS DOUBLE)) * sqrt(CAST(np.n12 AS DOUBLE)))
               DESC, d.vec_id) AS rank
      FROM dots d JOIN norms nc ON nc.vec_id = d.vec_id
                  JOIN norms np ON np.vec_id = d.probe_id
    ), veck AS (SELECT probe_id, vec_id, rank FROM vecranked WHERE rank <= 50),
    fused AS (
      SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_e6 FROM (
        SELECT query_id, doc_id, 1000000 // (60 + rank) AS c FROM lexk
        UNION ALL
        SELECT probe_id AS query_id, vec_id AS doc_id,
               1000000 // (60 + rank) AS c FROM veck
      ) GROUP BY query_id, doc_id
    ), final AS (
      SELECT query_id, doc_id, rrf_e6,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_e6 DESC, doc_id) AS rank
      FROM fused
    )
    SELECT query_id, doc_id, rrf_e6, CAST(rank AS BIGINT) AS rank
    FROM final WHERE rank <= 10
    """,
)
def q_retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion, FULL hash-match
    oracle: the BM25 top-50 (lexical arm) fuses with the exact-cosine
    top-50 (vector arm, scaled-int portable recipe) under
    ``1000000 DIV (60 + rank)`` — all-integer fusion, so DuckDB
    replays both arms and the fused ranking value-for-value.  The
    fixture convention doc_id == vec_id aligns the two id spaces.  At
    scale each arm hands RRF a bounded top-K (here 50), never a full
    ranking — the vector arm's all-pairs candidate set here is the
    3-probe exact tier; production swaps in an ANN tier behind the
    same (probe, id, rank) contract."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    emb = scan(spark, sf_dir, "embeddings")
    qterms = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
        ).alias("term"),
    )
    lex = bm25_topk(
        d, qterms, text_col="text", id_col="doc_id",
        query_id_col="query_id", term_col="term", k=50,
    ).select("query_id", "doc_id", "rank")
    comps = embedding_comps(emb, id_col="vec_id", vec_col="embedding")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id")
    )
    cand = emb.select("vec_id").crossJoin(F.broadcast(probes))
    vec = _portable_exact_rerank(comps, cand, k=50).select(
        F.col("probe_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        "rank",
    )
    fused = rrf_fuse(
        [lex, vec], probe_id_col="query_id", id_col="doc_id", k=10
    )
    return fused.select("query_id", "doc_id", "rrf_e6", "rank")
