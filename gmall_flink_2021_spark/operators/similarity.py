"""Embedding similarity search over the embeddings table.

Training-data-pipeline extension: brute-force cosine top-k as the
exact baseline. The query set is broadcast against the corpus, so the
corpus side streams through without a shuffle — the right shape for
"few queries × huge corpus" at 100 TB. All arithmetic is JVM-side
higher-order functions (functions/vectors.py) and bit-reproducible in
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine


def knn_bruteforce(embeddings: DataFrame, n_queries: int = 5,
                   k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries vs the full
    corpus. Returns (query_id, neighbor_id, rank, cosine score)."""
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("vec_n"))
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("vec_q"))
    scored = (corpus.join(F.broadcast(queries))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cos_sim",
                          cosine(F.col("vec_q"), F.col("vec_n"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


def label_centroid_similarity(embeddings: DataFrame) -> DataFrame:
    """Cluster-level similarity: per-label centroid (element-wise mean
    via posexplode → avg → collect back), then each vector's cosine
    to its own label centroid, aggregated per label.

    This is the building block of the IVF-style ANN path: centroids
    come from exactly this aggregation; probe = broadcast-join query
    against centroids, then search the matching partition only.
    """
    expl = embeddings.select(
        "vec_id", "label",
        F.posexplode(as_double("embedding")).alias("pos", "x"))
    cent = (expl.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
            .groupBy("label")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "cx"))).alias("pairs"))
            .select("label",
                    F.transform("pairs", lambda p: p.cx).alias("centroid")))
    scored = (embeddings
              .join(F.broadcast(cent), "label")
              .withColumn("cos_sim",
                          cosine(as_double("embedding"),
                                 F.col("centroid"))))
    return (scored.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.min("cos_sim").alias("min_sim"),
                 F.max("cos_sim").alias("max_sim")))
