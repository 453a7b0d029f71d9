"""Deduplication operators for LLM training-data pipelines (B40-B41).

Four tiers, cheapest-exact to fuzziest:

- exact:   normalized-text SHA-256 -> keep min id per hash (one shuffle
           on a 64-char key, never on the full document text).
- minhash: word-shingle MinHash signatures + LSH banding -> candidate
           buckets -> keep min id per duplicate cluster.
- simhash: 64-bit SimHash fingerprint; near-dups collide on rotated
           prefix bands (hamming-adjacent docs share a band key).
- ngram:   character n-gram Jaccard verification over LSH candidates
           (the "verify" stage after minhash's "generate").

All stages are DataFrame ops (hashing via built-in xxhash64/sha2,
signatures via tight Pandas UDF batches); nothing collects to the
driver, so the same code runs at 100 TB — the LSH band trick keeps the
candidate join linear-ish in corpus size instead of O(n^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from artemia_airflow_spark.catalog import scan
from artemia_airflow_spark.plans.registry import declared
from artemia_airflow_spark.session import ensure_engine_conf

# Universal-hash modulus for the minhash permutation family.  31-bit
# Mersenne prime: operands stay < 2^31, so a*h+b < 2^62 — no int64
# overflow under ANSI arithmetic (Spark 4 default).
_MERSENNE = (1 << 31) - 1


def normalized_text(col) -> "F.Column":
    """Canonical dedup key: lowercase, trimmed, whitespace-collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """B40: exact dedup — keep the min-id row per normalized-text hash.

    Shuffles on the 256-bit digest (fixed width) rather than the raw
    text; at 100 TB that is the difference between shuffling ~32 B/row
    and shuffling whole documents.
    """
    h = F.sha2(normalized_text(text_col), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, *, num_hashes: int = 32, shingle_size: int = 3
) -> DataFrame:
    """Word-shingle MinHash signature per row (adds ``__minhash``:
    array<bigint> of length ``num_hashes``).

    Signature = per-permutation min over shingle hashes, computed with
    built-in expressions only: shingles via sliding slice, base hash via
    xxhash64, permutations via (a*h+b) mod p — all inside whole-stage
    codegen, no Python in the loop.
    """
    tokens = F.split(normalized_text(text_col), " ")
    n_sh = F.greatest(F.size(tokens) - (shingle_size - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i + 1, shingle_size))),
    )
    def perm(i: int):
        # universal-hash permutation i: (a_i * h + b_i) mod p, on the
        # non-negative projection of xxhash64.  Factory (not a default
        # arg!) — a 2-arg lambda would make F.transform bind the array
        # index over `i`.
        def apply(h):
            return (
                F.lit(2 * i + 1) * F.pmod(h, F.lit(_MERSENNE)) + F.lit(7919 * (i + 1))
            ) % F.lit(_MERSENNE)

        return apply

    sig = F.array(
        *[F.array_min(F.transform(shingles, perm(i))) for i in range(num_hashes)]
    )
    return df.withColumn("__minhash", sig)


def minhash_lsh_candidates(
    df: DataFrame, id_col: str, *, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows keyed by
    (band_idx, hash(band slice)); docs sharing any band key are
    candidate near-duplicates.  Returns (band_key, id) pairs.
    """
    rows_per_band = num_hashes // bands
    band_rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("__minhash"), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ))
                ).alias("band_hash"),
            ),
        )
    )
    return df.select(F.col(id_col), band_rows.alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash")
    )


def minhash_dedup(
    df: DataFrame, text_col: str, id_col: str, *, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """B41: near-dedup — min-id survivor per LSH cluster.

    Cluster rule (single-link lite): a row is dropped if ANY of its
    band buckets contains a smaller id; the corpus-wide min of each
    connected component always survives.  One extra iteration of
    min-propagation would give full connected components; for dedup
    "keep one representative, drop the rest" this one-pass rule is the
    standard scale trick (greedy suppression).
    """
    sigs = minhash_signatures(df, text_col, num_hashes=num_hashes)
    cand = minhash_lsh_candidates(sigs, id_col, num_hashes=num_hashes, bands=bands)
    min_per_bucket = cand.groupBy("band", "band_hash").agg(F.min(id_col).alias("__bucket_min"))
    keep = (
        cand.join(min_per_bucket, ["band", "band_hash"])
        .groupBy(id_col)
        .agg(F.min("__bucket_min").alias("__cluster_min"))
        .filter(F.col(id_col) == F.col("__cluster_min"))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def simhash(df: DataFrame, text_col: str, *, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per row (adds ``__simhash`` bigint).

    Each token votes +1/-1 on each bit of its xxhash64; the sign of the
    per-bit total is the fingerprint bit.  Pure expression pipeline:
    explode-free (aggregate over the token array), codegen-friendly.
    """
    tokens = F.split(normalized_text(text_col), " ")
    th = F.transform(tokens, lambda t: F.xxhash64(t))

    def vote(i: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return merge

    bit_votes = [F.aggregate(th, F.lit(0), vote(i)) for i in range(bits)]
    fp = None
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return df.withColumn("__simhash", fp)


def simhash_dedup(df: DataFrame, text_col: str, id_col: str, *, prefix_bits: int = 16) -> DataFrame:
    """B41 variant: SimHash near-dedup by 4-band prefix blocking —
    fingerprints within hamming distance <= 3 share at least one intact
    16-bit band (pigeonhole), so banding finds all such pairs without a
    quadratic self-join."""
    fp = simhash(df, text_col)
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("__simhash"), i * prefix_bits)
                    .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                    .alias("band_val"),
                )
                for i in range(64 // prefix_bits)
            ]
        )
    )
    cand = fp.select(id_col, bands.alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.band_val").alias("band_val")
    )
    min_per_bucket = cand.groupBy("band", "band_val").agg(F.min(id_col).alias("__bucket_min"))
    keep = (
        cand.join(min_per_bucket, ["band", "band_val"])
        .groupBy(id_col)
        .agg(F.min("__bucket_min").alias("__cluster_min"))
        .filter(F.col(id_col) == F.col("__cluster_min"))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, *, n: int = 3, threshold: float = 0.8,
    num_hashes: int = 32, bands: int = 8,
) -> DataFrame:
    """B41 verify stage: exact word-``n``-gram Jaccard over LSH candidate
    pairs only.  Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.

    The candidate join is keyed on LSH buckets, so the quadratic blow-up
    is confined to same-bucket groups (bounded by band width at scale).
    """
    tokens = F.split(normalized_text(text_col), " ")
    n_sh = F.greatest(F.size(tokens) - (n - 1), F.lit(1))
    shingle_set = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )
    base = df.select(F.col(id_col), shingle_set.alias("__shingles"))
    sigs = minhash_signatures(df, text_col, num_hashes=num_hashes)
    cand = minhash_lsh_candidates(sigs, id_col, num_hashes=num_hashes, bands=bands)
    a = cand.alias("a")
    b = cand.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col(id_col).alias("id_a"), F.col("__shingles").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("__shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# Declared queries
# --------------------------------------------------------------------------

@declared(
    "q_dedup_exact",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT *, MIN(doc_id) OVER (
        PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS __min_id
      FROM documents
    ) t
    WHERE doc_id = __min_id
    GROUP BY lang
    """,
)
def q_dedup_exact(spark, sf_dir):
    """B40: exact dedup -> per-lang survivor stats.  Oracle uses the
    hash-free min-per-normalized-text formulation (identical kept set —
    SHA-256 collisions are not a thing at any relevant corpus size)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    kept = exact_dedup(d, "text", "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@declared("q_dedup_minhash")
def q_dedup_minhash(spark, sf_dir):
    """B41 (rows-only): MinHash-LSH near-dedup -> per-lang survivor
    counts.  Probabilistic (signature family), so no value-hash oracle."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    kept = minhash_dedup(d, "text", "doc_id")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@declared("q_dedup_simhash")
def q_dedup_simhash(spark, sf_dir):
    """B41 (rows-only): SimHash near-dedup -> per-source survivor counts."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    kept = simhash_dedup(d, "text", "doc_id")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


@declared("q_dedup_ngram")
def q_dedup_ngram(spark, sf_dir):
    """B41 (rows-only): n-gram Jaccard verification pairs over LSH
    candidates (threshold 0.8)."""
    ensure_engine_conf(spark)
    d = scan(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", threshold=0.8)
