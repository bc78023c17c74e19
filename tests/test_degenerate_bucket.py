"""Degenerate-bucket stress pins (VERDICT r11 #3 / ADVICE r11).

One bucket ≫ all others (hundreds of byte-identical texts /
identical vectors — the mass-duplicated corpus that skipped
exact-dedup): every LSH pairing shape must complete with the exact
closed-form pair count. minhash_band_pairs holds each bucket as ONE
collect_list array row (kept in r12 — measured faster at both
scales), so this is its single-row-buffer worst case;
simhash_band_pairs and embedding_dups stream pairs through
merge-hinted self-joins since r12 (the array shape measured 8.4×
slower on the x32 high-dup corpus), so for them this pins the
streamed path's pair semantics. Either way a wrong pair filter, a
lost distinct, or a buffer blow-up at this scale fails loudly.

Sizing: 400 identical docs → a 400-element bucket per band and
C(400,2) = 79 800 pairs after the cross-band distinct — big enough
that a quadratic mistake is obvious (and a per-row blow-up would be
too), small enough for the default pytest run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_DUP = 400
N_PAIRS = N_DUP * (N_DUP - 1) // 2


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [(i, "mass duplicated boilerplate text that skipped exact "
                "dedup entirely and lands every doc in one bucket",
             "en", "src0", 99) for i in range(N_DUP)]
    rows += [(N_DUP + i, f"unique filler document number {i} with its "
                         f"own distinct words {i * 7} and {i * 13}",
              "en", "src1", 60) for i in range(25)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


def test_minhash_band_pairs_degenerate_bucket(spark, dup_docs):
    from gmall_flink_2021_spark.operators.dedup import minhash_band_pairs

    pairs, h = minhash_band_pairs(dup_docs)
    try:
        got = pairs.filter(F.col("doc_a") < N_DUP).count()
        assert got == N_PAIRS, got
        # every pair obeys a < b exactly once (the distinct held)
        assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    finally:
        h.unpersist()


def test_minhash_chain_only_degenerate_bucket_is_linear(spark, dup_docs):
    """chain_only: the escape hatch for exactly this corpus — edge
    count must be LINEAR (m−1 within the duplicated block), and all
    N_DUP docs must land in one connected component."""
    from gmall_flink_2021_spark.operators.dedup import minhash_band_pairs

    pairs, h = minhash_band_pairs(dup_docs, chain_only=True)
    try:
        block = pairs.filter(F.col("doc_a") < N_DUP)
        assert block.count() == N_DUP - 1
    finally:
        h.unpersist()


def test_simhash_band_pairs_degenerate_bucket(spark, dup_docs):
    from gmall_flink_2021_spark.operators.dedup import simhash_band_pairs

    out = simhash_band_pairs(dup_docs)
    got = out.filter((F.col("doc_a") < N_DUP) & (F.col("hamming") == 0))
    assert got.count() == N_PAIRS


def test_embedding_dups_degenerate_bucket(spark):
    from gmall_flink_2021_spark.operators.similarity import embedding_dups

    n = 300
    vec = [float(1 + (d % 5)) for d in range(64)]
    rows = [(i, 1, vec) for i in range(n)]
    rows += [(n + i, 2, [float((i + d) % 9 - 4) for d in range(64)])
             for i in range(10)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")
    dups, h = embedding_dups(emb, threshold=0.99)
    try:
        got = dups.filter(F.col("label") == 1).count()
        assert got == n * (n - 1) // 2, got
    finally:
        h.unpersist()
