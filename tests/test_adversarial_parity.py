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
    "doc_length_percentiles",
]
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
