"""Literal fixture pins for the round-9 seeded-fuzz vector finds
(seed 9004), independent of the seed staying in rotation:

 - duplicate-heavy corpora COLLAPSE k-means/PQ seed clusters: a
   cluster that loses every member must drop out of later iterations
   (the unrolled oracle's semantics) instead of KeyErroring the
   engine's codeword dict;
 - a ZERO-NORM query vector makes every centroid cosine NULL, so the
   probe falls to the label tiebreak — and a NULL label (asc NULLS
   FIRST on Spark, NULLS LAST in SQL) silently emptied the query's
   candidate set on one side only. NULL labels are unaddressable
   inverted lists and are not probe-able.

The corpus is literal: vec 0 is the zero vector (a query, id < 5),
vecs 1-3 are exact duplicates of one another (collapsing the 4-seed
codebooks), vecs with NULL labels carry real data.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from .adversarial_corpus import _copy_relational, _doc_schema, \
    _emb_schema, _evt_schema, _write
from .parity import compare, duck_connect

AFFECTED = ["kmeans_clusters", "pq_codebook_audit", "ivfpq_ann",
            "ivfpq_recall", "ivf_ann", "knn_bruteforce", "lsh_ann",
            "semdedup_prune", "contrastive_pairs"]


@pytest.fixture(scope="module")
def vec_edge_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vec_edge"))
    _copy_relational(root)
    rng = np.random.default_rng(90040)
    rows = []

    def add(vec_id, label, vec):
        rows.append((vec_id, label,
                     [float(np.float32(x)) for x in vec]))

    add(0, 0, np.zeros(64))               # zero-norm QUERY vector
    dup = rng.normal(size=64)
    for i in (1, 2, 3):                   # collapse the 4-seed books
        add(i, i % 2, dup)
    for i in range(4, 20):
        add(i, None if i % 7 == 0 else i % 3, rng.normal(size=64))
    add(20, None, np.zeros(64))           # zero vector, NULL label
    _write(os.path.join(root, "embeddings.parquet"), _emb_schema(),
           rows)
    _write(os.path.join(root, "documents.parquet"), _doc_schema(),
           [(0, "one doc so the table is non-empty", "en", "s0", 33)])
    _write(os.path.join(root, "events.parquet"), _evt_schema(), [])
    return root


@pytest.mark.parametrize("name", AFFECTED)
def test_vector_edge_corpus_parity(spark, vec_edge_corpus, name):
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES

    problems = compare(QUERIES[name](spark, vec_edge_corpus),
                       ORACLES[name], duck_connect(vec_edge_corpus))
    assert not problems, problems


def test_zero_vector_query_still_gets_candidates(spark,
                                                 vec_edge_corpus):
    """The zero-norm query must probe a REAL label (not the NULL
    list) and emit candidates with NULL cos_sim ranked by id."""
    from gmall_flink_2021_spark.plans import QUERIES

    out = QUERIES["ivf_ann"](spark, vec_edge_corpus).collect()
    q0 = [r for r in out if r.query_id == 0]
    assert q0, "zero-vector query lost its candidate set"
    assert all(r.label is not None for r in q0)
    assert all(r.cos_sim is None for r in q0)
