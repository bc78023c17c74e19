"""Adversarial-corpus parity fuzz (VERDICT r7 #3), pinned.

`tests/adversarial_corpus.py` writes two corpora the friendly driver
testdata never exercises — NULL group keys, empty/whitespace/CJK/
mixed-script texts, duplicate texts across sources, zero vectors,
tied timestamps, malformed props JSON ("edge"), and zero-row fact /
document / embedding / event tables ("empty"). Round-8's first sweep
over them surfaced 24 real divergences; these tests keep every one of
those bug classes closed by re-running the mirrored-oracle compare
for the affected queries on both corpora (the full 151-query sweep
stays a dev tool: `python tests/run_parity.py /tmp/gmall_adversarial/
edge`).

Bug classes pinned here (fix commit: round 8):
 - DuckDB array_to_string([]) is NULL, Spark concat_ws is '' —
   zero-token fingerprints (exact_dups / fingerprints /
   segment_dedup / doc_chunks / incremental_dedup oracles).
 - NULL user_id in distinct-user audits: exact counters follow
   count(DISTINCT) semantics, HLL never sees NULLs
   (uv_sketch_rollup / rolling_active_users_approx).
 - byte-length vs codepoint-length media math on CJK payloads +
   negative-doc_id video membership (media_* / video_frame_samples /
   frame_dedup hex-slice frame hashes).
 - ANSI CAST('' AS INT) aborts on digit-less/NULL group values
   (stratified_sample nullif, props_stats oracle TRY_CAST).
 - 0/0 and empty-aggregate NULLs (quality_scores mean_tok_len,
   funnel_conversion try_divide, data_quality_report coalesce).
 - Spark emits NO global row for CUBE/ROLLUP/GROUPING SETS over
   empty input; standard SQL emits the () row (HAVING count(*) > 0
   mirrors).
 - empty-table profiles list every column with zero counts (literal
   spine) instead of vanishing.
 - k-means / PQ / IVF-PQ crash-free on an empty embeddings table
   (seed-collect guards).

Round-8 SECOND sweep (corpus extended with failed-encoder embeddings
— NaN/±Inf/NULL-element/NULL/|x|≈float32-max vectors — plus NaN/Inf
event values, an undated event, and null-byte/combining-mark/RTL
docs) surfaced 18 more divergences in three classes, each closed by
a shared gate mirrored engine↔oracle:
 - similarity.valid_embeddings: vector operators consider only
   finite, non-null, in-domain (|x| ≤ EMB_MAX_ABS) vectors — NaN
   ordering differs between SQL engines and numpy kernels, and
   out-of-domain magnitudes overflow the exact int64 fixed-point
   kernels (Spark ANSI abort vs DuckDB conversion error).
 - functions.timeutil.dated: order-dependent operators (sessions,
   lag/lead transitions, bounce, trailing-frame scoring, event-time
   windows) exclude undated events — NULL ordering is engine-defined
   (Spark windows NULLS FIRST asc, DuckDB NULLS LAST).
 - functions.money: non-finite DOUBLE metrics aggregate as NULL —
   one NaN otherwise poisons a day's sum and the decimal cast itself
   diverges by engine/mode.

Round-8 THIRD sweep (NULL primary keys on documents/embeddings): 14
more divergences, closed by identity gates at the canonical loads —
a NULL doc_id/vec_id row is invalid ingest (it equi-joins in no
formulation, so window-keep vs join-drop formulations fork, and
driver-side seed sorts crash on None).  events keep NULL event_id
rows: their aggregates count page views, which need no identity.
"""

from __future__ import annotations

import pytest

from .adversarial_corpus import build
from .parity import compare, duck_connect

# queries whose round-8 fuzz divergence was fixed — re-checked on the
# edge corpus every run
EDGE_QUERIES = [
    "exact_dups", "fingerprints", "segment_dedup", "doc_chunks",
    "quality_scores", "stratified_sample", "props_stats",
    "media_features", "media_resize", "video_frame_samples",
    "frame_dedup", "uv_sketch_rollup", "rolling_active_users_approx",
    "incremental_dedup", "cross_source_dup_matrix", "lang_id",
    # round-8 second sweep (NaN/Inf/NULL embeddings + NULL-ts and
    # non-finite-value events + byte-level doc edges) — 18 more
    # divergences in three classes, all fixed:
    #  - valid_embeddings ingest gate (NULL/NaN/Inf/out-of-domain
    #    vectors excluded in engine + every oracle's FROM embeddings)
    "norm_histogram", "lsh_ann", "embedding_dups_lsh",
    "kmeans_clusters", "semdedup_prune", "ann_recall",
    "pq_codebook_audit", "ivfpq_ann", "ivfpq_recall",
    #  - dated(): order-dependent operators exclude undated events
    #    (Spark NULLS-FIRST vs DuckDB NULLS-LAST window ordering)
    "sessionize", "native_session_windows", "session_path_ngrams",
    "event_transitions", "user_jump_stats",
    #  - money(): non-finite metric values aggregate as NULL (Spark
    #    ANSI decimal-cast abort vs DuckDB conversion error vs
    #    legacy silent NULL)
    "daily_value_zscores", "visitor_stats_window",
    "visitor_stats_sliding", "event_stats_daily",
    # round-8 third sweep (NULL primary keys): a NULL identity joins
    # in no formulation, so window-based and join-based formulations
    # silently diverge, pandas int columns go float on the side that
    # keeps the row, and driver-side seed sorts compare None.  Fixed
    # by identity gates at the canonical loads (plans/_base._t for
    # documents; valid_embeddings id_col for vec_id), mirrored into
    # every oracle (registry.py FROM/JOIN documents wrap,
    # _EMB_VALID_SQL).
    # (video_frame_samples and the kmeans/PQ family, also hit, are
    # already listed above)
    "perplexity_buckets", "padding_waste_audit",
    "media_text_alignment", "near_dup_rate_by_source",
    "training_shard_plan", "minhash_signatures",
    "hashed_classifier_scores", "doc_length_percentiles_approx",
    # round-9 (ADVICE r8): a NULL event_id tied on ts inside one
    # user partition — every order-dependent tiebreak is now
    # ORDER BY ts, event_id NULLS FIRST (asc) / DESC NULLS LAST in
    # the oracles, matching Spark's window-sort defaults.  The two
    # queries below carry the tiebreak but were not yet pinned
    # (the rest of the class is already in the dated() block above).
    "first_visits", "linear_attribution",
    # round-9 seeded-fuzz finds (tests/fuzz_corpus.py, seed 9001),
    # each now a literal corpus fixture above:
    #  - props_stats: JSON-string k value (ANSI cast abort vs regex
    #    NULL) — already pinned; fixture added
    #  - profile_sketch_report: datasketches HLL ignores ''-updates,
    #    sketch inputs are 'v'-prefixed now
    #  - session_path_ngrams: NULL event_type in a trigram
    #    (concat_ws skip vs || propagate), coded '(null)' both sides
    "profile_sketch_report",
]
assert len(EDGE_QUERIES) == len(set(EDGE_QUERIES)), "duplicate pins"
# queries whose empty-input divergence was fixed — re-checked on the
# empty corpus (zero-row documents/embeddings/events/orders/lineitem)
EMPTY_QUERIES = [
    "region_segment_cube", "grouping_sets_revenue", "priority_rollup",
    "profile_drift", "profile_sketch_report", "data_quality_report",
    "funnel_conversion", "kmeans_clusters", "semdedup_prune",
    "pq_codebook_audit", "ivfpq_ann", "ivfpq_recall",
    "referential_integrity", "exact_dups", "corpus_funnel",
]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("adversarial"))
    return build(root)


@pytest.fixture(scope="module")
def edge_con(corpora):
    return duck_connect(corpora[0])


@pytest.fixture(scope="module")
def empty_con(corpora):
    return duck_connect(corpora[1])


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_parity(spark, corpora, edge_con, name):
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES

    problems = compare(QUERIES[name](spark, corpora[0]),
                       ORACLES[name], edge_con)
    assert not problems, problems


@pytest.mark.parametrize("name", EMPTY_QUERIES)
def test_empty_corpus_parity(spark, corpora, empty_con, name):
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES

    problems = compare(QUERIES[name](spark, corpora[1]),
                       ORACLES[name], empty_con)
    assert not problems, problems


def test_frame_dedup_multibyte_collision_detected(spark, corpora):
    """The planted identical CJK video pair (doc 26/29, 3-byte
    chars whose frame slices split codepoints) must collide frame-
    for-frame through the hex-slice hash path — the case the old
    md5-of-chars oracle could not express."""
    from gmall_flink_2021_spark.plans import QUERIES

    out = QUERIES["frame_dedup"](spark, corpora[0])
    rows = [r for r in out.collect() if r.first_doc == 26]
    assert rows, "expected colliding frames from the CJK video pair"
    assert all(r.video_ct == 2 for r in rows)


def test_kmeans_family_empty_embeddings_no_crash(spark, corpora):
    """Empty embeddings: the seed-collect guards return empty frames
    with the production schemas instead of numpy axis errors."""
    from gmall_flink_2021_spark.operators import similarity
    from gmall_flink_2021_spark.sources.tables import load_table

    emb = load_table(spark, corpora[1], "embeddings")
    assigned, vh = similarity.kmeans_assignments(emb)
    assert assigned.count() == 0
    assert set(assigned.columns) == {"cluster", "vec_id", "q", "v"}
    vh.unpersist()
    ann, ah = similarity.ivfpq_ann(emb)
    assert ann.count() == 0
    assert ann.columns == ["query_id", "neighbor_id", "rank",
                           "adc_dist"]
    ah.unpersist()


def test_valid_embeddings_gate_excludes_failed_encoder_shapes(spark):
    """The ingest gate's exact domain: NULL vector, NaN element, ±Inf
    element, NULL element and |x|>EMB_MAX_ABS are excluded; zero,
    tiny, constant and boundary(|x|=EMB_MAX_ABS) vectors survive."""
    from pyspark.sql import types as T

    from gmall_flink_2021_spark.operators.similarity import (
        EMB_MAX_ABS, valid_embeddings)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    inf, nan = float("inf"), float("nan")
    rows = [
        (0, [1.0, -2.0]),                    # plain: keep
        (1, [0.0, 0.0]),                     # zero vector: keep
        (2, [nan, 1.0]),                     # NaN element: drop
        (3, [inf, 1.0]),                     # +Inf: drop
        (4, [1.0, -inf]),                    # -Inf: drop
        (5, None),                           # NULL vector: drop
        (6, [1.0, None]),                    # NULL element: drop
        (7, [3.0e38, 1.0]),                  # out of domain: drop
        (8, [EMB_MAX_ABS, -EMB_MAX_ABS]),    # boundary: keep
        (9, [1e-30, 1e-30]),                 # denormal-ish: keep
    ]
    out = valid_embeddings(spark.createDataFrame(rows, schema))
    assert sorted(r.vec_id for r in out.collect()) == [0, 1, 8, 9]


def test_money_nulls_non_finite_and_dated_drops_null_ts(spark):
    """money(): NaN/±Inf double metrics aggregate as NULL (absent
    measurement) and never reach the decimal cast; decimal inputs are
    untouched.  dated(): NULL-ts rows leave the event-time domain."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from gmall_flink_2021_spark.functions import money
    from gmall_flink_2021_spark.functions.timeutil import dated

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 2.5),
         (2, datetime(2024, 1, 1), float("nan")),
         (3, datetime(2024, 1, 1), float("inf")),
         (4, datetime(2024, 1, 1), float("-inf")),
         (5, None, 10.0)],
        "event_id long, ts timestamp, value double")
    got = df.agg(F.sum(money("value")).alias("s")).collect()[0].s
    assert float(got) == 12.5  # 2.5 + 10.0; non-finite skipped
    assert [r.event_id for r in dated(df).collect()] == [1, 2, 3, 4]
    # decimal passthrough: exact, no double round-trip
    dec = spark.createDataFrame([("123456789012345.67",)], "v string") \
        .select(F.col("v").cast("decimal(18,2)").alias("v"))
    assert str(dec.select(money("v").alias("m")).collect()[0].m) \
        == "123456789012345.67"


def test_null_primary_keys_excluded_at_canonical_loads(spark, corpora):
    """Identity gates: the NULL-doc_id document never reaches a
    registry plan (plans/_base._t) and the NULL-vec_id vector never
    passes valid_embeddings — while raw load_table still surfaces
    both rows (the gate lives at the registry surface, not the
    reader)."""
    from pyspark.sql import functions as F

    from gmall_flink_2021_spark.operators.similarity import (
        valid_embeddings)
    from gmall_flink_2021_spark.plans._base import _t
    from gmall_flink_2021_spark.sources.tables import load_table

    raw_docs = load_table(spark, corpora[0], "documents")
    assert raw_docs.filter(F.col("doc_id").isNull()).count() == 1
    (gated_docs,) = _t(spark, corpora[0], "documents")
    assert gated_docs.filter(F.col("doc_id").isNull()).count() == 0

    raw_emb = load_table(spark, corpora[0], "embeddings")
    assert raw_emb.filter(F.col("vec_id").isNull()).count() == 1
    gated = valid_embeddings(raw_emb)
    assert gated.filter(F.col("vec_id").isNull()).count() == 0
