"""Batch loaders for the driver testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
/root/testdata/sf{0.001,0.01,0.1}/.

events.parquet stores its ``ts`` as parquet TIMESTAMP(NANOS), which
Spark cannot read natively; with ``spark.sql.legacy.parquet.nanosAsLong``
we read it as a long and rebuild a TIMESTAMP_NTZ (the generator emits
microsecond-aligned values, so ``div 1000`` is lossless). All other
timestamps arrive as TIMESTAMP_NTZ already, which matches DuckDB's
naive-timestamp semantics in the oracle comparisons.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def convert_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """nanos-since-epoch long → tz-independent TIMESTAMP_NTZ (the
    generator emits microsecond-aligned nanos, so ``div 1000`` is
    lossless). Shared by the batch loader and the streaming reader."""
    return df.withColumn(
        col,
        F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {_EPOCH_NTZ})"),
    )


def events_ts_is_nanos(path: str) -> bool:
    """True when the parquet footer stores ``ts`` as TIMESTAMP(NANOS).

    Probed from the file metadata (pyarrow) rather than by flipping
    ``spark.sql.legacy.parquet.nanosAsLong`` session-wide: the legacy
    flag changes how EVERY later parquet read in the session surfaces
    nanos timestamps, so it must only be set when this file actually
    needs it (the generator has emitted both encodings across rounds).
    """
    import pyarrow.parquet as pq

    try:
        return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"
    except Exception:
        return False


# Session-scoped TABLE memo (r12, guide §1/§6): `spark.read.parquet`
# costs ~120 ms per call on this rig (py4j + file listing + footer
# schema read), and the registry wrappers call load_table 2-3 times
# per query — across a 150-query bench sweep that is tens of seconds
# of pure repeated catalog work. Memoize the LAZY DataFrame per
# (session, path, file-stat signature): this is table registration
# (exactly what register_views/spark.table do), NOT result caching —
# the DataFrame is an unresolved scan and every action still reads
# the parquet bytes; the stat signature (mtime_ns, size) invalidates
# the entry whenever the file/directory is regenerated in place
# (directory mtime changes when part files are created/deleted).
# Kill switch: SPARK_GRAFT_TABLE_MEMO=0.
from weakref import WeakKeyDictionary

_TABLE_MEMO: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def _stat_sig(path: str):
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    memo_on = os.environ.get("SPARK_GRAFT_TABLE_MEMO", "1") != "0"
    key = (path, _stat_sig(path))
    if memo_on:
        cache = _TABLE_MEMO.setdefault(spark, {})
        hit = cache.get(key)
        if hit is not None:
            return hit
    df = _load_table_uncached(spark, path, name)
    if memo_on:
        cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str,
                         name: str) -> DataFrame:
    if name != "events":
        return spark.read.parquet(path)
    if not events_ts_is_nanos(path):
        return spark.read.parquet(path)
    # NANOS encoding: the legacy flag is required at scan time (Spark
    # refuses TIMESTAMP(NANOS) without it), so it intentionally stays
    # set for the session — the session genuinely contains nanos data.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] == "bigint":
        df = convert_events_ts(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
