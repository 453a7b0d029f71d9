"""Custom join operators Spark lacks natively (SURVEY.md §4.2).

Currently: as-of join (B16) and skew-salted equi-join.  Both are
compositions of built-in DataFrame ops so Catalyst still owns the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    how: str = "inner",
    left_id: str | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the same
    key and the greatest ``right_time <= left_time`` (ties broken by the
    greatest ``tiebreak``, which must be unique on the right).

    Semantics pinned per SURVEY.md §7 H4 so the DuckDB oracle can use
    the identical window formulation (DuckDB's native ASOF JOIN breaks
    ties differently).

    Physical shape: equi-join on the key (hash/SMJ — Catalyst decides,
    broadcast if the right side is small) with the time bound as a join
    residual, then a per-left-row top-1.  Two top-1 strategies:

    - ``"agg"`` (default): ``max(struct(right_time, tiebreak, ...))``
      per left row — lexicographic struct-max equals the (time desc,
      tiebreak desc) ordering, and unlike a window it PARTIAL-
      aggregates map-side: the post-join exchange carries one candidate
      per (partition, left row) instead of the full join fan-out.  At
      100 TB with deep per-key right history this is the difference
      between shuffling every matched pair and shuffling ~|left| rows.
    - ``"window"``: ``row_number`` over (left row) ordered by
      (time desc, tiebreak desc) — the original formulation; use when a
      right column's type is not orderable inside a struct (map
      columns) since those can't ride the agg's ordering struct.

    If the right side has many rows per key (unbounded history),
    pre-reduce it with the same top-1 *before* the join or bucket both
    sides on the key; the dominant cost is the join fan-out itself.

    ``left_id`` MUST be unique per left row when given: the "agg"
    strategy recovers the other left columns with ``first()``, which is
    value-deterministic only because they are functionally dependent on
    a unique grouping id.  A non-unique ``left_id`` would collapse
    distinct left rows into one group and mix their attribute values
    silently — pass ``left_id=None`` (group by all left columns) for
    non-unique keys; the window strategy has the same requirement for
    one-row-per-left-row output.
    """
    cond = (left[left_on] == right[right_on]) & (right[right_time] <= left[left_time])
    joined = left.join(right, cond, how)
    # Top-1 key: a unique left id if the caller has one (narrow shuffle
    # key), else all left columns (correct but wider exchange).
    part_cols = [left_id] if left_id else list(left.columns)
    if strategy == "agg":
        rcols = list(right.columns)
        # ordering fields first: struct comparison is field-by-field, and
        # tiebreak uniqueness means later fields never decide the max
        ordered = [right_time, tiebreak] + [
            c for c in rcols if c not in (right_time, tiebreak)
        ]
        other_left = [c for c in left.columns if c not in part_cols]
        out = joined.groupBy(*part_cols).agg(
            # left cols are functionally dependent on the grouping key
            # (unique id, or the key IS all left cols): first() is
            # deterministic in value
            *[F.first(c).alias(c) for c in other_left],
            F.max(F.struct(*ordered)).alias("__pick"),
        )
        return out.select(
            *list(left.columns),
            *[F.col(f"__pick.{c}").alias(c) for c in rcols],
        )
    w = Window.partitionBy(*part_cols).orderBy(
        F.col(right_time).desc(), F.col(tiebreak).desc()
    )
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: explode the hot-key concentration by
    salting the LEFT (large, skewed) side with a random shard id and
    replicating the RIGHT side once per shard.

    A shuffled equi-join hashes each key to ONE reducer — a key holding
    10% of 100 TB lands 10 TB on a single task.  Salting splits every
    key's rows uniformly across ``salt`` shards (join key becomes
    (key, shard)), bounding any task's share of a hot key to 1/salt of
    it.  The right side is replicated ``salt``× via an exploded
    literal range — acceptable when the right side is much smaller
    than the skewed left (the usual shape: fact × medium dim that is
    too big to broadcast but small enough to replicate 8×).

    AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
    cases at runtime and should be tried first; explicit salting is
    for the pathological single-key hotspots AQE re-splitting cannot
    fix (e.g. one key larger than executor memory), and for
    deterministic plan shapes in recurring production jobs.

    The salt uses a hash of the left row's full tuple, not `rand()`,
    so the result is deterministic and retry-safe (a recomputed task
    re-derives identical shards).

    Supported ``how``: inner / left / left_semi / left_anti — shapes
    where every output row is driven by a left row, which lives in
    exactly one shard.  right/full outer are rejected: an unmatched
    RIGHT row exists in all ``salt`` replicas and would be emitted
    ``salt`` times (one null-extended row per shard).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right/full outer would "
            f"emit each unmatched right row {salt}x (one per salt replica); "
            "use AQE skew-join handling for outer-right shapes"
        )
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__shard", shard)
    r_salted = right.withColumn(
        "__shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = l_salted.join(r_salted, [on, "__shard"], how)
    return joined.drop("__shard")


def deletion_variants(
    df: DataFrame, text_col: str, id_col: str, *, max_edits: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """(id, variant) relation of every string obtainable by deleting up
    to ``max_edits`` characters — the SymSpell blocking key: two
    strings with edit distance <= k ALWAYS share a common <= k-deletion
    variant (each edit is covered by at most one deletion on each
    side), so the variant equi-join has EXACT recall for the verify
    stage.  Variant count is C(len, <=k) per string (len+1 at k=1) —
    the blocking trade: cheap codegen explode instead of any all-pairs
    comparison.  Position 0 = the string itself.

    ``max_len`` guards the blowup (VERDICT r10 #4): C(len, <=k) rows x
    len bytes per string is fine for entity keys (len 64, k=2 ->
    ~2,145 variants, ~137 KB worst case) and catastrophic for document
    text (len 10,000, k=2 -> ~50M rows x 10 KB per document — an
    executor OOM).  An overlong string fails LOUDLY with a clear
    message via a guard expression compiled into the plan
    (F.raise_error), the first moment data meets the operator — raise
    ``max_len`` deliberately for longer keys; route document text
    through the n-gram/winnowing dedup family instead.  No silent
    prefix truncation: truncated blocking forfeits the exact-recall
    guarantee (an edit can shift characters across the prefix
    boundary), and this operator's contract IS exact recall."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    guarded = F.when(
        F.length(F.col(text_col)) > max_len,
        F.raise_error(F.concat(
            F.lit(f"deletion_variants: {text_col!r} value of length "),
            F.length(F.col(text_col)).cast("string"),
            F.lit(
                f" exceeds max_len={max_len}: C(len,<={max_edits}) variant"
                " generation would blow up on long strings — raise max_len"
                " only for short entity keys, never document text"
            ),
        )),
    ).otherwise(F.col(text_col))
    out = df.select(F.col(id_col), guarded.alias("variant"))
    cur = out
    for round_ in range(max_edits):
        cur = (
            cur.select(
                id_col,
                "variant",
                F.explode(
                    F.sequence(F.lit(1), F.greatest(F.length("variant"), F.lit(1)))
                ).alias("i"),
            )
            .select(
                id_col,
                F.expr(
                    "concat(substring(variant, 1, i - 1), "
                    "substring(variant, i + 1, length(variant)))"
                ).alias("variant"),
            )
        )
        if round_ < max_edits - 1:
            # dedup between rounds: repeated characters produce the
            # same 1-deletion variant many times, and each copy would
            # explode again next round (r10 review) — the final
            # distinct() alone lets the blowup happen first
            cur = cur.distinct()
        out = out.unionByName(cur)
    return out.distinct()


def fuzzy_join(
    left: DataFrame, right: DataFrame, *, left_col: str, right_col: str,
    left_id: str, right_id: str, max_edits: int = 1,
    antisymmetric: bool = False, max_len: int = 64,
) -> DataFrame:
    """Entity-resolution approximate string join (r10): pairs whose
    ``levenshtein(left_col, right_col) <= max_edits``, computed at
    scale as SymSpell deletion-variant blocking (exact recall — see
    :func:`deletion_variants`) -> variant EQUI-join -> distinct
    candidate pairs -> exact levenshtein verify.  The verify prunes
    the false positives blocking admits; nothing is ever all-pairs,
    and every stage is codegen + one hash join on a short string key.

    Same-schema inputs are the natural call shape, so every column is
    aliased internally (identical left/right names never collide —
    r10 review); the OUTPUT id columns get ``_l``/``_r`` suffixes when
    ``left_id == right_id``.  ``antisymmetric=True`` (self-join
    dedup) keeps only ``left id < right id`` pairs, applied at the
    CANDIDATE stage so each unordered pair is distinct-shuffled,
    re-joined, and levenshtein-verified once instead of twice (and
    self-pairs never reach the verify).

    Returns (left-id, right-id, edit_distance).  At 100 TB: the
    variant relation is (k+1 choose <=k)x rows of short strings, the
    join is an ordinary shuffled/broadcast hash join AQE can plan, and
    the levenshtein verify runs only on blocked candidates — the
    standard generate-verify shape shared with the n-gram dedup
    family."""
    out_l = left_id if left_id != right_id else f"{left_id}_l"
    out_r = right_id if left_id != right_id else f"{right_id}_r"
    ls = left.select(
        F.col(left_id).alias("__lid"), F.col(left_col).alias("__ltext")
    )
    rs = right.select(
        F.col(right_id).alias("__rid"), F.col(right_col).alias("__rtext")
    )
    lv = deletion_variants(ls, "__ltext", "__lid", max_edits=max_edits,
                           max_len=max_len)
    rv = deletion_variants(rs, "__rtext", "__rid", max_edits=max_edits,
                           max_len=max_len)
    cand = lv.join(rv, "variant").select("__lid", "__rid")
    if antisymmetric:
        cand = cand.filter(F.col("__lid") < F.col("__rid"))
    cand = cand.distinct()
    joined = cand.join(ls, "__lid").join(rs, "__rid")
    return (
        joined.withColumn(
            "edit_distance",
            F.levenshtein(F.col("__ltext"), F.col("__rtext")),
        )
        .filter(F.col("edit_distance") <= max_edits)
        .select(
            F.col("__lid").alias(out_l),
            F.col("__rid").alias(out_r),
            "edit_distance",
        )
    )


def _register_queries() -> None:
    from artemia_airflow_spark.catalog import scan
    from artemia_airflow_spark.plans.registry import declared
    from artemia_airflow_spark.session import ensure_engine_conf

    @declared(
        "q_join_fuzzy",
        oracle="""
        WITH v AS (
          SELECT DISTINCT s_suppkey AS id,
                 CASE WHEN i = 0 THEN s_name
                      ELSE substr(s_name, 1, CAST(i - 1 AS INT))
                           || substr(s_name, CAST(i + 1 AS INT), len(s_name))
                 END AS variant
          FROM (SELECT s_suppkey, s_name,
                       unnest(range(0, len(s_name) + 1)) AS i
                FROM supplier)
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM v a JOIN v b USING (variant)
          WHERE a.id < b.id
        ), pairs AS (
          SELECT id_a, id_b,
                 levenshtein(sa.s_name, sb.s_name) AS d
          FROM cand JOIN supplier sa ON sa.s_suppkey = cand.id_a
                    JOIN supplier sb ON sb.s_suppkey = cand.id_b
          WHERE levenshtein(sa.s_name, sb.s_name) <= 1
        )
        SELECT CAST(d AS INT) AS edit_distance,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(id_a) AS BIGINT) AS sum_left_keys,
               CAST(SUM(id_b) AS BIGINT) AS sum_right_keys
        FROM pairs GROUP BY d
        """,
    )
    def q_join_fuzzy(spark, sf_dir):
        """Entity-resolution fuzzy join (r10, B-extension),
        ORACLE-CHECKED: supplier-name self-join at edit distance <= 1
        via SymSpell deletion-variant blocking + exact levenshtein
        verify — both engines implement levenshtein as the exact DP
        (verified value-identical), and the variant construction is
        plain substring arithmetic, so the whole generate-verify
        pipeline hash-matches.  Key sums attest the exact pair set
        without emitting thousands of pair rows."""
        ensure_engine_conf(spark)
        sup = scan(spark, sf_dir, "supplier")
        a = sup.select(
            F.col("s_suppkey").alias("id_a"), F.col("s_name").alias("name_a")
        )
        b = sup.select(
            F.col("s_suppkey").alias("id_b"), F.col("s_name").alias("name_b")
        )
        pairs = fuzzy_join(
            a, b, left_col="name_a", right_col="name_b",
            left_id="id_a", right_id="id_b", max_edits=1,
            antisymmetric=True,
        )
        return pairs.groupBy(
            F.col("edit_distance").cast("int").alias("edit_distance")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("id_a").cast("bigint").alias("sum_left_keys"),
            F.sum("id_b").cast("bigint").alias("sum_right_keys"),
        )

    @declared(
        "q_join_salted",
        oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """,
    )
    def q_join_salted(spark, sf_dir):
        """Skew-salted equi-join, ORACLE-CHECKED: salting is a pure
        execution-layer rewrite (key -> (key, deterministic shard),
        right side replicated salt x), so the result must be
        value-identical to the plain join — which is exactly what the
        oracle runs.  A hash match certifies the whole salting
        machinery (shard derivation, replica explode, shard-key join)
        changes WHERE rows meet, never WHAT joins."""
        ensure_engine_conf(spark)
        o = scan(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        c = scan(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        joined = salted_join(
            o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salt=8
        )
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )


_register_queries()
