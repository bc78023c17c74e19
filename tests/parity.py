"""Shared Spark-vs-DuckDB comparison harness, mimicking the driver's
correctness gate: row count + column names + order-insensitive value
comparison (columns sorted by name, rows sorted)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if v is None:
        return ("null",)
    return (type(v).__name__, str(v))


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, con) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    sk = rows_key(s_cols, s_rows)
    dk = rows_key(d_cols, d_rows)
    if sk != dk:
        diff_s = [r for r in sk if r not in dk][:3]
        diff_d = [r for r in dk if r not in sk][:3]
        problems.append(f"values: spark-only={diff_s} duck-only={diff_d}")
    return problems
