"""Learned-parameter memo (similarity.py module header): a repeat
index build of the same dataset+hyperparameters must (a) actually hit
the memo — skipping the Lloyd collect() round-trips — and (b) return
BIT-IDENTICAL output to the fresh build, because the loop is a
deterministic function of its inputs.  Also pins self-invalidation:
a different dataset signature misses."""

import os

from gmall_flink_2021_spark.operators import similarity
from gmall_flink_2021_spark.plans import registry

SF_SMOKE = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fresh(spark, fn):
    """Run fn with the memo emptied, return (rows, memo_after)."""
    similarity._centroid_memo.clear()
    out = _rows(fn())
    return out, dict(similarity._centroid_memo)


def test_kmeans_memo_hit_is_bit_identical(spark):
    emb = spark.read.parquet(os.path.join(SF_SMOKE,
                                          "embeddings.parquet"))
    key = similarity.dataset_signature(
        os.path.join(SF_SMOKE, "embeddings.parquet"))
    assert key is not None

    def build():
        out, h = similarity.kmeans_clusters(emb, memo_key=key)
        h.unpersist()
        return out

    fresh, memo = _fresh(spark, build)
    assert len(memo) == 1  # the loop populated the memo
    # second call: memo populated -> hit path (one assignment pass)
    warm = _rows(build())
    assert warm == fresh


def test_ivfpq_memo_hit_is_bit_identical(spark):
    emb = spark.read.parquet(os.path.join(SF_SMOKE,
                                          "embeddings.parquet"))
    key = similarity.dataset_signature(
        os.path.join(SF_SMOKE, "embeddings.parquet"))

    def build():
        out, h = similarity.ivfpq_ann(emb, memo_key=key)
        h.unpersist()
        return out

    fresh, memo = _fresh(spark, build)
    # coarse kmeans entry + pq entry
    assert len(memo) == 2
    warm = _rows(build())
    assert warm == fresh
    # and the recall audit reuses the same entries (no new keys)
    out, h = similarity.ivfpq_recall(emb, memo_key=key)
    h.unpersist()
    out.collect()
    assert set(similarity._centroid_memo) == set(memo)


def test_memo_misses_on_different_signature(spark):
    emb = spark.read.parquet(os.path.join(SF_SMOKE,
                                          "embeddings.parquet"))
    similarity._centroid_memo.clear()
    a, ah = similarity.kmeans_clusters(emb, memo_key=("sig-a",))
    ah.unpersist()
    a.collect()
    assert len(similarity._centroid_memo) == 1
    b, bh = similarity.kmeans_clusters(emb, memo_key=("sig-b",))
    bh.unpersist()
    b.collect()
    # a different dataset signature built (and memoized) separately
    assert len(similarity._centroid_memo) == 2
    similarity._centroid_memo.clear()


def test_registry_wrappers_share_one_index_build(spark):
    """ivfpq_ann then ivfpq_recall through the registry: the recall
    audit must reuse the ann build's memo entries (same _emb_key), and
    both match the memo-disabled (env-off) ground truth."""
    similarity._centroid_memo.clear()
    ann = _rows(registry.QUERIES["ivfpq_ann"](spark, SF_SMOKE))
    entries = dict(similarity._centroid_memo)
    assert len(entries) == 2
    rec = _rows(registry.QUERIES["ivfpq_recall"](spark, SF_SMOKE))
    assert set(similarity._centroid_memo) == set(entries)

    os.environ["SPARK_GRAFT_INDEX_MEMO"] = "0"
    try:
        assert _rows(registry.QUERIES["ivfpq_ann"](
            spark, SF_SMOKE)) == ann
        assert _rows(registry.QUERIES["ivfpq_recall"](
            spark, SF_SMOKE)) == rec
    finally:
        os.environ.pop("SPARK_GRAFT_INDEX_MEMO", None)
    similarity._centroid_memo.clear()


def test_dataset_signature_changes_on_rewrite(tmp_path, spark):
    p = str(tmp_path / "emb.parquet")
    emb = spark.read.parquet(os.path.join(SF_SMOKE,
                                          "embeddings.parquet"))
    emb.limit(10).write.mode("overwrite").parquet(p)
    s1 = similarity.dataset_signature(p)
    assert s1 is not None
    emb.limit(20).write.mode("overwrite").parquet(p)
    s2 = similarity.dataset_signature(p)
    assert s1 != s2
    assert similarity.dataset_signature(str(tmp_path / "nope")) is None


def test_novelty_gate_edge_cases(spark):
    """Empty snapshot -> everything novel; empty batch -> empty
    output; short (<3 token) docs classify without signatures."""
    from gmall_flink_2021_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s1", 22),
         (2, "xy", "en", "s1", 2)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    empty = docs.filter("doc_id < 0")

    out, h = dedup.incremental_dedup(empty, docs)
    rows = {r.doc_id: r.verdict for r in out.collect()}
    h.unpersist()
    assert rows == {1: "novel", 2: "novel"}

    out2, h2 = dedup.incremental_dedup(docs, empty)
    assert out2.count() == 0
    h2.unpersist()

    # exact dup of a short doc matches via fingerprint, sig_agree 0
    batch = spark.createDataFrame(
        [(9, "xy", "en", "s2", 2)], docs.schema)
    out3, h3 = dedup.incremental_dedup(docs, batch)
    r = out3.collect()[0]
    h3.unpersist()
    assert (r.verdict, r.matched_id, r.sig_agree) == ("exact_dup", 2, 0)


def test_winsorize_singleton_group(spark):
    """A 1-row group: lo == hi == the value, nothing clipped."""
    from gmall_flink_2021_spark.operators import analytics

    orders = spark.createDataFrame(
        [(1, 1, "O", 12.34, None, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    r = analytics.winsorized_price_stats(orders).collect()[0]
    assert (r.n, r.lo_cents, r.hi_cents, r.clipped_lo_ct,
            r.clipped_hi_ct, r.winsorized_sum_cents) == (1, 1234, 1234,
                                                         0, 0, 1234)
