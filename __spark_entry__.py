"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``gmall_flink_2021_spark/``; the query ↔ oracle
pairs live in ``gmall_flink_2021_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tumbling-window visitor stats over the events
    table (the minimum end-to-end slice of SURVEY.md §7.2)."""
    from gmall_flink_2021_spark.plans.registry import q_visitor_stats_window

    return q_visitor_stats_window(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gmall_flink_2021_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gmall_flink_2021_spark.plans import ORACLES

    return dict(ORACLES)
