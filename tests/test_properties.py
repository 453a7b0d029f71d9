"""Property-based tests (hypothesis): the determinism contracts that
the oracle suite relies on, checked on adversarial random data rather
than the fixtures.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from artemia_airflow_spark.functions.core import dec_sum
from tests.conftest import SF_SMOKE

money = st.decimals(
    min_value=-10**9, max_value=10**9, places=2, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(money, min_size=1, max_size=60), st.integers(min_value=1, max_value=7))
def test_dec_sum_is_partitioning_invariant(spark, values, nparts):
    """dec_sum must give the bit-identical double for ANY partitioning —
    the property that makes distributed money aggregation reproducible
    (plain float sum fails this)."""
    doubles = [float(v) for v in values]
    df1 = spark.createDataFrame([(x,) for x in doubles], "v double").coalesce(1)
    dfn = spark.createDataFrame([(x,) for x in doubles], "v double").repartition(nparts)
    a = df1.agg(dec_sum("v").alias("s")).collect()[0].s
    b = dfn.agg(dec_sum("v").alias("s")).collect()[0].s
    assert a == b  # bit-exact, not approx
    want = float(sum(values))  # exact decimal sum in Python
    assert math.isclose(a, want, rel_tol=1e-12)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=100), # left time
        ),
        min_size=1, max_size=20,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=100), # right time
        ),
        min_size=1, max_size=20,
    ),
)
def test_asof_join_matches_python_reference(spark, left_rows, right_rows):
    """asof_join == the obvious per-row Python maximization: for each
    left row, the right row with same key, max time <= left time,
    ties -> max unique id."""
    from artemia_airflow_spark.operators.joins import asof_join

    left = [(i, k, t) for i, (k, t) in enumerate(left_rows)]
    right = [(j, k, t) for j, (k, t) in enumerate(right_rows)]
    ldf = spark.createDataFrame(left, "lid long, k long, lt long")
    rdf = spark.createDataFrame(right, "rid long, rk long, rt long")
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf,
            left_on="k", right_on="rk", left_time="lt", right_time="rt",
            tiebreak="rid", left_id="lid",
        ).collect()
    }
    want = {}
    for lid, k, lt in left:
        cands = [(rt, rid) for rid, rk, rt in right if rk == k and rt <= lt]
        if cands:
            want[lid] = max(cands)[1]
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=15))
def test_exact_dedup_keeps_one_per_normalized_text(spark, texts):
    """exact_dedup keeps exactly the min-id row per normalized text,
    including on whitespace-degenerate inputs."""
    import re

    from artemia_airflow_spark.operators.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in exact_dedup(df, "text", "doc_id").collect())
    norm = lambda t: re.sub(r"\s+", " ", t.strip().lower())  # noqa: E731
    want_keys = {}
    for i, t in rows:
        want_keys.setdefault(norm(t), i)  # first occurrence = min id
    assert kept == sorted(want_keys.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=-100, max_value=100),
        min_size=0, max_size=10,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.booleans(),  # is_delete
        ),
        min_size=0, max_size=10,
    ),
)
def test_merge_upsert_matches_dict_reference(spark, target_map, change_map):
    """merge_upsert == the obvious dict semantics: apply updates/
    inserts, drop deletes, keep everything else — on random key/value
    change sets including deletes of absent keys."""
    from artemia_airflow_spark.operators.cdc import merge_upsert

    want = dict(target_map)
    for k, (v, is_del) in change_map.items():
        if is_del:
            want.pop(k, None)
        else:
            want[k] = v

    target = spark.createDataFrame(
        [(k, v) for k, v in target_map.items()] or [(None, None)], "k: long, v: long"
    ).filter(F.col("k").isNotNull())
    changes = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in change_map.items()] or [(None, None, None)],
        "k: long, v: long, d: boolean",
    ).filter(F.col("k").isNotNull())
    got = {
        r.k: r.v
        for r in merge_upsert(target, changes, "k", delete_col="d").collect()
    }
    assert got == want


def test_merge_upsert_duplicate_change_key_fails_loud(spark):
    """A duplicate key on the changes side violates the MERGE
    precondition (one key, two verdicts); the in-plan guard (r17b)
    must raise at action time instead of silently fanning the
    duplicate through the full-outer join."""
    import pytest

    from artemia_airflow_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([(1, 10)], "k: long, v: long")
    changes = spark.createDataFrame(
        [(1, 11, False), (1, 12, False)], "k: long, v: long, d: boolean"
    )
    with pytest.raises(Exception, match="duplicate change rows"):
        merge_upsert(target, changes, "k", delete_col="d").collect()


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=12,
    ),
)
def test_asof_join_strategies_agree(spark, left_rows, right_rows):
    """The partial-agg (default) and window formulations of asof_join
    must produce identical results — the agg path is a pure physical
    optimization."""
    from artemia_airflow_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "lid long, k long, lt long"
    )
    rdf = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(right_rows)], "rid long, rk long, rt long"
    )
    kw = dict(left_on="k", right_on="rk", left_time="lt", right_time="rt",
              tiebreak="rid", left_id="lid")
    agg = {tuple(r) for r in asof_join(ldf, rdf, strategy="agg", **kw).collect()}
    win = {tuple(r) for r in asof_join(ldf, rdf, strategy="window", **kw).collect()}
    assert agg == win


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
            ),
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_scrub_web_noise_is_idempotent(spark, words):
    """scrub(scrub(x)) == scrub(x): every replacement token ([URL],
    [EMAIL], single spaces) is itself noise-free, so a second pass must
    be a no-op — the property that makes the scrub safe to re-run in a
    resumed pipeline."""
    from artemia_airflow_spark.operators.curation import scrub_web_noise

    text = " ".join(
        ["https://a.example/x?q=1", *words, "<p>tag</p>", "u@d.example", "!!!!"]
    )
    df = spark.createDataFrame([(text,)], "text string")
    once = scrub_web_noise(df, "text", out_col="clean").select(
        F.col("clean").alias("text")
    )
    twice = scrub_web_noise(once, "text", out_col="clean")
    row = twice.select(F.col("text").alias("once"), "clean").collect()[0]
    assert row.once == row.clean


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # id
            st.integers(min_value=0, max_value=4),      # group
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),
)
def test_cap_per_group_keeps_min_of_cap_and_group_size(spark, rows, cap):
    """|kept per group| == min(cap, |group|) for arbitrary id/group
    data, and the kept set is stable across recomputation."""
    from collections import Counter

    from artemia_airflow_spark.operators.curation import cap_per_group

    df = spark.createDataFrame(rows, "doc_id long, source int")
    kept = cap_per_group(df, "source", "doc_id", max_rows=cap).collect()
    sizes = Counter(r.source for r in kept)
    want = Counter(g for _, g in rows)
    for g, n in want.items():
        assert sizes[g] == min(cap, n), (g, sizes[g], n, cap)
    again = cap_per_group(df, "source", "doc_id", max_rows=cap).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            # (op, keys, payload)
            st.tuples(
                st.just("append"),
                st.lists(st.integers(0, 49), min_size=1, max_size=5, unique=True),
            ),
            st.tuples(
                st.just("merge"),
                st.lists(st.integers(0, 59), min_size=1, max_size=5, unique=True),
            ),
            st.tuples(
                st.just("delete_even"),
                st.just([]),
            ),
            st.tuples(st.just("compact"), st.just([])),
            st.tuples(st.just("checkpoint"), st.just([])),
            st.tuples(st.just("checkpoint_parquet"), st.just([])),
            st.tuples(st.just("rename"), st.just([])),
            st.tuples(st.just("vacuum"), st.just([])),
        ),
        min_size=1,
        max_size=6,
    )
)
@example(
    # pinned adversarial sequence (always runs regardless of random
    # draw): rename mid-history, parquet checkpoint AFTER the rename,
    # then writes/deletes/vacuum THROUGH the mapping and a second
    # rename back — the r9 feature-interaction worst case
    [
        ("merge", [3, 7]),
        ("rename", []),
        ("checkpoint_parquet", []),
        ("append", [1, 2]),
        ("delete_even", []),
        ("rename", []),
        ("vacuum", []),
    ]
)
def test_txtable_model_based(spark, ops):
    """Model-based check for the transactional table: a random sequence
    of append/merge/delete/compact/checkpoint/rename against TxTable
    must agree with a plain Python dict model after EVERY operation.
    Catches cross-operation interactions (merge after compact,
    checkpoint mid-history, delete of merged keys, appends/merges
    THROUGH a rename, resolution through a parquet checkpoint written
    mid-history — both r9 features) that single-op tests cannot."""
    import shutil
    import tempfile

    from artemia_airflow_spark.sources.txtable import TxTable

    root = tempfile.mkdtemp(prefix="aas_txmodel_")
    try:
        seed = [(k, float(k)) for k in range(10)]
        t = TxTable.create(
            spark,
            spark.createDataFrame(seed, "k long, v double"),
            root,
            key_col="k",
        )
        model = dict(seed)
        cur = "v"  # current logical name of the value column
        step = 0
        for op, keys in ops:
            step += 1
            if op == "append":
                # appends must be fresh keys (MERGE precondition: keys
                # unique per side) — offset into a disjoint range per step
                fresh = [k + 1000 * step for k in keys]
                t.append(
                    spark.createDataFrame(
                        [(k, float(-k)) for k in fresh], f"k long, {cur} double"
                    )
                )
                model.update({k: float(-k) for k in fresh})
            elif op == "merge":
                t.merge(
                    spark.createDataFrame(
                        [(k, float(k * 100 + step)) for k in keys],
                        f"k long, {cur} double",
                    )
                )
                model.update({k: float(k * 100 + step) for k in keys})
            elif op == "delete_even":
                t.delete("k % 2 = 0")
                model = {k: v for k, v in model.items() if k % 2 != 0}
            elif op == "compact":
                t.compact(target_files=1)
            elif op == "checkpoint":
                t.checkpoint()
            elif op == "checkpoint_parquet":
                t.checkpoint(format="parquet")
            elif op == "rename":
                # metadata-only column mapping toggle (r9): values are
                # unchanged, only the logical name flips — every later
                # append/merge/read must go through the mapping
                new = "val" if cur == "v" else "v"
                t.rename_column(cur, new)
                cur = new
            elif op == "vacuum":
                # retention 0 is safe here: single-writer test; the
                # model is unaffected (vacuum never touches live data)
                t.vacuum(retention_sec=0)
            got = {r.k: r[cur] for r in t.snapshot().collect()}
            assert got == model, f"diverged after step {step} ({op})"
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abcde", min_size=0, max_size=8),
        min_size=2, max_size=14, unique=True,
    ),
    st.integers(min_value=1, max_value=2),
)
def test_fuzzy_join_matches_brute_force_on_random_strings(spark, texts, k):
    """fuzzy_join (r10) == brute-force levenshtein cross join for ANY
    strings and k in {1,2} — the SymSpell blocking exact-recall claim
    on adversarial inputs (tiny alphabet maximizes deletion-variant
    collisions, empty strings included)."""
    import itertools

    from artemia_airflow_spark.operators.joins import fuzzy_join

    def ed(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, name string")
    want = {
        (i, j, ed(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if ed(a, b) <= k
    }
    got = {
        (r.id_l, r.id_r, r.edit_distance)
        for r in fuzzy_join(
            df, df, left_col="name", right_col="name",
            left_id="id", right_id="id", max_edits=k, antisymmetric=True,
        ).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # probe
            st.floats(min_value=-1, max_value=1,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=80,
    ),
    st.integers(min_value=1, max_value=6),  # r
    st.integers(min_value=1, max_value=7),  # partitions
)
def test_grouped_partial_topk_cut_invariant(spark, rows, r, nparts):
    """The two-phase ADC candidate cut (r10) equals the naive global
    window for ANY scores, group sizes, cut size, and partitioning —
    the subset property on adversarial data, not just the fixture."""
    from pyspark.sql import Window

    from artemia_airflow_spark.operators.similarity import (
        _adc_candidate_cut,
    )

    data = [(p, i, s) for i, (p, s) in enumerate(rows)]
    scored = spark.createDataFrame(
        data, "probe_id int, vec_id int, __adc double"
    ).repartition(nparts)
    got = {
        (x.probe_id, x.vec_id)
        for x in _adc_candidate_cut(
            scored, probe_id_col="probe_id", id_col="vec_id", r=r
        ).collect()
    }
    w = Window.partitionBy("probe_id").orderBy(
        F.col("__adc").desc(), F.col("vec_id")
    )
    want = {
        (x.probe_id, x.vec_id)
        for x in scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= r)
        .collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # probe_id
            st.sampled_from([0.1, 0.25, 0.25, 0.5, 0.9,
                             float("nan"), None]),           # score ties+bad
        ),
        min_size=1, max_size=120,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_bounded_topk_matches_naive_window(spark, rows, k):
    """_bounded_topk (r11, the helper EVERY similarity rerank now
    routes through) == the naive per-probe window over FINITE scores,
    including the rank column, for arbitrary partitionings, heavy
    score ties, and NaN/NULL rows that must be excluded by contract."""
    from pyspark.sql import Window

    from artemia_airflow_spark.operators.similarity import _bounded_topk

    data = [(p, i, s) for i, (p, s) in enumerate(rows)]
    scored = spark.createDataFrame(
        data, "probe_id int, vec_id int, cos_sim double"
    ).repartition(7)
    got = {
        (r.probe_id, r.vec_id, r.rank)
        for r in _bounded_topk(
            scored, probe_id_col="probe_id", id_col="vec_id",
            score_col="cos_sim", k=k,
        ).collect()
    }
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    want = {
        (r.probe_id, r.vec_id, r.rank)
        for r in scored.filter(
            F.col("cos_sim").isNotNull() & ~F.isnan("cos_sim")
        ).withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=40),
    st.integers(min_value=5, max_value=60),
    st.integers(min_value=1, max_value=4),
)
def test_firstfit_packing_matches_python_reference(spark, n_tokens, capacity, shards):
    """pack_sequences_firstfit == the obvious per-shard Python loop on
    adversarial random token counts (r12 — the same recurrence the new
    DuckDB recursive-CTE oracle replays on the fixtures): walk docs in
    id order within each shard, open a new sequence whenever the
    current one would overflow capacity, oversize docs get their own
    sequence."""
    from artemia_airflow_spark.operators.curation import pack_sequences_firstfit

    # synthesize texts with exactly the drawn token counts
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.seq_id)
        for r in pack_sequences_firstfit(
            df, "text", "doc_id", capacity=capacity, shards=shards
        ).collect()
    }
    want = {}
    for shard in range(shards):
        seq, used = 0, 0
        for i, n in enumerate(n_tokens):
            if i % shards != shard:
                continue
            if used > 0 and used + n > capacity:
                seq, used = seq + 1, 0
            want[i] = (shard, seq)
            used += n
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.one_of(st.none(), st.floats(min_value=-1e12, max_value=1e12,
                                           allow_nan=False, allow_infinity=False)),
            st.one_of(st.none(), st.floats(min_value=-1e12, max_value=1e12,
                                           allow_nan=False, allow_infinity=False)),
        ),
        min_size=1, max_size=30,
    ),
)
def test_stacked_histogram_matches_single_metric_on_random_data(spark, rows):
    """Property form of the r12 stacked-sketch equivalence: on random
    data including NULLs and far-out-of-domain values (exercising the
    NULL-guard-before-clamp and the long-clamp edge bins), the stacked
    partials equal the union of per-metric single-scan partials
    bit-for-bit."""
    from artemia_airflow_spark.operators.sketches import (
        MetricSpec,
        histogram_partials,
        histogram_partials_stacked,
    )

    df = spark.createDataFrame(
        [(g, x, y) for g, x, y in rows], "grp int, x double, y double"
    )
    specs = [
        MetricSpec("x", "x", 0.5, 0.0, 64.0, 8),
        MetricSpec("y", "y", 0.9, -1024.0, 1024.0, 16),
    ]
    got = sorted(
        map(tuple, histogram_partials_stacked(df, specs, ["grp"]).collect())
    )
    want = sorted(
        (r.grp, s.metric, r.bin, r.cnt)
        for s in specs
        for r in histogram_partials(
            df, s.value_col, ["grp"], lo=s.lo, hi=s.hi, bins=s.bins
        ).collect()
    )
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab ", min_size=0, max_size=20),
            st.integers(min_value=0, max_value=50),  # score
        ),
        min_size=1, max_size=15,
    )
)
def test_dedup_keep_best_matches_python_reference(spark, rows):
    """dedup_keep_best keeps exactly the (score desc, id asc) argmax
    per normalized text — checked against the obvious Python loop on
    adversarial inputs including whitespace-degenerate texts and score
    ties (r12)."""
    import re

    from artemia_airflow_spark.operators.dedup import dedup_keep_best

    data = [(i, t, sc) for i, (t, sc) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string, score long")
    kept = sorted(
        r.doc_id
        for r in dedup_keep_best(df, "text", "doc_id", "score").collect()
    )
    norm = lambda t: re.sub(r"\s+", " ", t.strip().lower())  # noqa: E731
    best = {}
    for i, t, sc in data:
        k = norm(t)
        if k not in best or (-sc, i) < best[k][0]:
            best[k] = ((-sc, i), i)
    assert kept == sorted(v[1] for v in best.values())


def test_every_declared_e6_product_guarded_decimal_or_bounded(spark):
    """Registry-wide int64-headroom audit (VERDICT r15 #7): walk EVERY
    declared query's optimized plan and classify each integer
    parts-per-million product (``x * 1000000``).  Each site must be

    - GUARDED: the product's left operand is the inline headroom CASE
      (``... END * 1000000`` — the guarded_e6_ratio shape), so a
      numerator past 2^62/1e6 raises a named error before the multiply;
    - DECIMAL: the left operand is decimal-typed (widened arithmetic
      cannot overflow at e6 scale); or
    - in the ALLOWLIST below with the boundedness argument written out
      — per-document numerators (bounded by one document's length, not
      the corpus), k-bounded numerators, or a guard that rides a PRIOR
      projection (the epoch-plan placement, which the optimizer keeps
      as a separate Project because raise_error blocks collapse — the
      product then references the guarded attribute, invisible to the
      textual END check).

    A new e6 ratio added without a guard or a written-down bound fails
    here by name.  Double-typed quantizations (``* 1000000.0 + 0.5``
    then floor) are out of scope: they cannot overflow, only round.
    """
    import re

    from artemia_airflow_spark.plans import registry

    registry.load_all_query_modules()

    ALLOWLIST = {
        # numerator < n_tokens of ONE source, which a projection ABOVE
        # this product replaces with a raise past 2^62/1e6 (the
        # epoch-plan guard); the remainder term is < n_tokens by
        # construction of %
        "q_mix_epoch_plan",
        # total_tokens is the guarded attribute from the prior
        # projection (source_influence's withColumn guard); all six
        # products consume it or values <= it
        "q_select_influence",
        # numerator = length(text) of ONE document (chars-per-token
        # score): per-document bound, not corpus-scale
        "q_curriculum",
        # per-document containment: hits <= n_grams of one document
        # (the per-SOURCE rollup above it is guarded)
        "q_leakage_audit",
        # per-document novelty: unique-gram count of one document
        "q_text_novelty",
        # n_hits <= k = 10 by construction of the top-k intersection
        "q_sim_recall_portable",
        # numerator = wordpiece char count of ONE document (the
        # quality-score projection feeding the budget cut)
        "q_select_budget",
        # both numerators are DECIMAL(38,0) ATTRIBUTES (__s, the margin
        # cross-term sum, and the N*D - S difference built from it) —
        # overflow-free by type, but the textual check cannot see an
        # attribute's type, only inline casts
        "q_agreement_kappa",
    }

    def opt_plan(df):
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("extended"))
        a = s.find("== Optimized Logical Plan ==")
        b = s.find("== Physical Plan ==")
        return s[a:b]

    # Faces whose BUILDER performs real work (table writes, stream
    # drains, ledger commits — bench.py's SKIP set plus the two
    # stream/table index loops): constructing them just to regex a
    # plan string would re-run minutes of I/O and couple this unit
    # test to shared table names (r16 review).  Their query tails are
    # built from the same audited operator recipes, so the audit
    # loses no unique e6 surface.
    import bench

    heavy = set(bench.SKIP) | {
        "q_index_stream_portable", "q_index_upsert_portable",
    }

    # a decimal cast closing immediately left of the product (any
    # paren depth): the multiply is decimal-typed, overflow-free
    decimal_re = re.compile(r"as decimal\(\d+,\d+\)\)+\s*$")
    offenders = {}
    for name, fn in registry.QUERIES.items():
        if name in heavy:
            continue
        p = opt_plan(fn(spark, SF_SMOKE))
        for m in re.finditer(r"\* 1000000(?![.\d])", p):
            pre = p[:m.start()].rstrip()
            if pre.endswith("END"):
                continue  # inline guard (guarded_e6_ratio)
            if decimal_re.search(p[max(0, m.start() - 40):m.start()]):
                continue  # decimal-widened product
            if name in ALLOWLIST:
                continue
            offenders.setdefault(name, []).append(
                p[max(0, m.start() - 70):m.start() + 12]
                .replace("\n", " "))
    assert not offenders, (
        "unguarded integer e6 products (add guarded_e6_ratio or a "
        f"written-down bound): {offenders}"
    )
