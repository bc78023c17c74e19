"""Shared Spark-vs-DuckDB comparison harness, mimicking the driver's
correctness gate bit-for-bit.

The driver canonicalizes BOTH result sets through pandas
(``spark_df.toPandas()`` / ``duckdb_result.df()``), sorts columns by
name, sorts rows, and hashes the stringified cells.  Reproducing that
exact path locally matters: under pandas a DuckDB DECIMAL becomes
float64 (``'34607792.2'``) while a Spark DECIMAL stays
``Decimal('34607792.20')`` — equal values, different strings.  This
simulation reproduced the full 13-fail/36-pass hash split of
CORRECTNESS_r01 exactly (49/49), so a local pass here predicts a
driver-green hash.
"""

from __future__ import annotations

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the
        # stress corpora); driver testdata is single files — glob
        # accordingly so either layout oracles identically
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon_pandas(df) -> list[tuple[str, ...]]:
    """Driver-equivalent canonical form of a pandas frame: columns
    sorted by name, every cell stringified, rows sorted."""
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in row)
                  for row in df.itertuples(index=False))


def compare(spark_df, oracle_sql: str, con) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems = []
    spd = spark_df.toPandas()
    dpd = con.execute(oracle_sql).df()
    if sorted(spd.columns) != sorted(dpd.columns):
        problems.append(
            f"columns: spark={sorted(spd.columns)} duck={sorted(dpd.columns)}")
        return problems
    if len(spd) != len(dpd):
        problems.append(f"rowcount: spark={len(spd)} duck={len(dpd)}")
    sk = canon_pandas(spd)
    dk = canon_pandas(dpd)
    if sk != dk:
        sset, dset = set(sk), set(dk)
        diff_s = [r for r in sk if r not in dset][:3]
        diff_d = [r for r in dk if r not in sset][:3]
        problems.append(f"values: spark-only={diff_s} duck-only={diff_d}")
    return problems
