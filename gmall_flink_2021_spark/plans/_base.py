"""Shared plan-module plumbing: table loading and cross-family constants."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity
from ..session import harden
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    harden(spark)
    return [load_table(spark, sf_dir, n) for n in names]

def _emb_key(sf_dir: str):
    """Learned-parameter memo key for the embeddings table (see
    similarity.py module header): path + per-file size/mtime, so the
    memo self-invalidates when the data is regenerated in place."""
    import os

    return similarity.dataset_signature(
        os.path.join(sf_dir, "embeddings.parquet"))

_DRIFT_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority")

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_RI_RELATIONS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey",
     "lineitem->orders"),
    ("orders", "o_custkey", "customer", "c_custkey",
     "orders->customer"),
    ("customer", "c_nationkey", "nation", "n_nationkey",
     "customer->nation"),
    ("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey",
     "lineitem->supplier"),
    ("events", "user_id", "customer", "c_custkey", "events->customer"),
]
