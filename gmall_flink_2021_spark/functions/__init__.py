from pyspark.sql import Column
from pyspark.sql import functions as F

from . import text, timeutil, vectors  # noqa: F401


def money(col: Column | str, guard: bool = True) -> Column:
    """Cast to the engine's monetary type, DECIMAL(18,2); with
    ``guard=True`` a non-finite (NaN/±Inf) input becomes NULL
    (absent measurement).

    The reference carries every amount as BigDecimal
    (bean/OrderInfo.java:12-16); exact decimal arithmetic also makes
    aggregate results order-independent, which the DuckDB-oracle
    value-hash comparison requires (double sums are not associative).

    The non-finite guard is the dirty-data contract for STREAM metric
    columns (a crashed emitter writes NaN/Inf into events.value /
    CDC amounts): without it, one NaN poisons a whole day's sum AND
    the engines disagree on the decimal cast itself (Spark ANSI
    aborts, DuckDB conversion-errors, legacy Spark nulls silently).
    Mirrored in every oracle that casts events.value (CASE WHEN
    isnan/isinf THEN NULL...).

    Pass ``guard=False`` for WAREHOUSE columns (TPC-H prices,
    balances, quantities) whose dirty-data contract does NOT admit
    non-finites — their DuckDB oracles carry a plain cast, so the
    unguarded form is both the symmetric one and free of the per-row
    isnan/abs predicate on the serving/analytics hot paths."""
    c = F.col(col) if isinstance(col, str) else col
    if not guard:
        return c.cast("decimal(18,2)")
    d = c.cast("double")
    return (F.when(F.isnan(d) | (F.abs(d) == F.lit(float("inf"))),
                   F.lit(None))
            .otherwise(c).cast("decimal(18,2)"))


def wmoney(col: Column | str) -> Column:
    """``money(col, guard=False)`` — the warehouse-column form used
    at every TPC-H call site (prices / balances / quantities), whose
    dirty-data contract excludes non-finites and whose oracles carry
    the plain decimal cast."""
    return money(col, guard=False)


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    """Split a ``"name type, name type"`` DDL string on top-level
    commas (commas inside ``map<k,v>`` / ``struct<...>`` stay put)."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(ddl):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(ddl[start:i])
            start = i + 1
    fields.append(ddl[start:])
    out = []
    for f in fields:
        name, typ = f.strip().split(None, 1)
        out.append((name, typ.strip()))
    return out


def literal_frame(spark, rows: list[tuple], ddl: str,
                  max_inline: int = 64):
    """A small literal DataFrame WITHOUT the parallelize tax.

    ``spark.createDataFrame(rows, ddl)`` routes tiny literal lists
    through an RDD of pickled rows split into ``defaultParallelism``
    slices — on a 32-core master that is a 32-task scan stage, each
    task forking a Python worker to unpickle a handful of rows
    (measured 0.25-1.4 s of run time PER TASK under host load), and
    every broadcast join against the frame inherits the 32 partitions
    because there is no exchange for AQE to coalesce. Guide §4 (the
    Python boundary) and §2.4 (remove work the data does not need).

    Here instead:

    - up to ``max_inline`` rows of plain scalars become pure SQL —
      ``inline(arrays_zip(lit(col_a), lit(col_b), ...))`` over a
      single-split range: ONE column-wide array literal per field
      (one Literal node each, so codegen stays small — per-row
      ``struct(lit, lit, ...)`` trees measured ~14 ms/row in janino
      compilation), one JVM-only task, no Python workers;
    - anything larger (or containing None/nested values, which array
      literals don't express reliably) keeps the pickle path but
      through ``parallelize(rows, 1)``: one task, one Python-worker
      round trip, flat ~0.25 s at any size (measured vs 32 forks).

    Values are cast to the declared DDL types either way, so
    downstream semantics are identical to ``createDataFrame``.
    """
    if not rows:
        return spark.createDataFrame([], ddl)
    fields = _split_ddl(ddl)
    plain = (len(rows) <= max_inline
             and all(isinstance(v, (str, int, float, bool))
                     for row in rows for v in row))
    if not plain:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), ddl)
    cols = list(zip(*rows))
    arrs = [F.lit(list(vals)).cast(f"array<{t}>").alias(n)
            for vals, (n, t) in zip(cols, fields)]
    return (spark.range(0, 1, 1, 1)
            .select(F.inline(F.arrays_zip(*arrs))))


def spread(df, key: str = "doc_id"):
    """Repartition a frame by ``key`` to at least the cluster's
    default parallelism BEFORE a heavy per-row fan-out (shingle
    explode, n-gram hashing, trigram scoring).

    Why: small/tight parquet layouts (single row group) scan as ONE
    task, and an explode inherits that layout — so a 700x fan-out
    plus its md5 work runs serially no matter how many cores exist.
    Repartitioning first moves a shuffle of the RAW rows (cheap)
    ahead of the fan-out, and because the partitioning key matches
    the downstream per-doc aggregation key, Catalyst elides the
    post-fan-out exchange the groupBy would otherwise need — the
    plan swaps a big shuffle for a small one, at ANY scale. At
    100 TB the scan already has thousands of splits, so this is
    usually a no-op (max() keeps the larger side).
    """
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, df.rdd.getNumPartitions())
    return df.repartition(n, key)
