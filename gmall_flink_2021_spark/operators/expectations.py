"""Declarative data-quality expectations (the Deequ/Great-Expectations
capability class): a rule set is compiled into ONE conditional
aggregation pass over the table, returning integer-permille metrics
with pass/fail against thresholds — the validation gate a warehouse
runs before promoting a load, and a training pipeline runs before
trusting a corpus drop.

Each rule is a plain dict:
  {"name": ..., "kind": "not_null" | "unique" | "range" |
   "accepted_values", "column": c, ...kind params...,
   "min_permille": threshold}

Scale shape: every metric is a conditional sum in one map-side-
combined aggregate over one scan (uniqueness adds countDistinct,
which Spark plans into the same single-pass Expand); output is
|rules| rows. Integer permille end-to-end — oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


VERDICT_SCHEMA = ("rule string, metric_permille long, "
                  "min_permille long, passed long")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    if not rules:
        # explode(array()) cannot star-expand; an empty rule set is a
        # vacuous pass — return the empty verdict frame, not a crash
        return df.sparkSession.createDataFrame([], VERDICT_SCHEMA)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        c = F.col(r["column"])
        kind = r["kind"]
        if kind == "not_null":
            hit = c.isNotNull()
        elif kind == "range":
            lo, hi = r.get("lo"), r.get("hi")
            hit = F.lit(True)
            if lo is not None:
                hit = hit & (c >= lo)
            if hi is not None:
                hit = hit & (c <= hi)
            hit = c.isNotNull() & hit
        elif kind == "accepted_values":
            hit = c.isin(*r["values"])
        elif kind == "unique":
            aggs.append(F.countDistinct(c).alias(f"_m{i}"))
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        aggs.append(F.sum(hit.cast("long")).alias(f"_m{i}"))
    row = df.agg(*aggs)
    # ONE row → |rules| rows via a single explode: a per-rule union
    # would re-derive the aggregate subtree once per branch and
    # re-scan the table |rules| times (plan-pinned single scan)
    structs = []
    for i, r in enumerate(rules):
        metric = F.expr(f"_m{i} * 1000 DIV greatest(_n, 1)")
        structs.append(F.struct(
            F.lit(r["name"]).alias("rule"),
            metric.alias("metric_permille"),
            F.lit(int(r["min_permille"])).cast("long")
             .alias("min_permille"),
            (metric >= r["min_permille"]).cast("long").alias("passed")))
    return (row.select(F.explode(F.array(*structs)).alias("r"))
            .select("r.*"))


def validate_by(df: DataFrame, group_col: str,
                rules: list[dict]) -> DataFrame:
    """Per-group expectations: the same declarative rules evaluated
    independently for every value of ``group_col`` (per-source corpus
    gates, per-day load gates) — still ONE conditional-aggregation
    pass, now keyed by the group; |groups|·|rules| verdict rows via
    the same explode-from-one-row trick per group. The report that
    catches a single bad supplier/source inside an otherwise-green
    load, which the table-level gate averages away."""
    if not rules:
        return df.sparkSession.createDataFrame(
            [], f"{group_col} string, " + VERDICT_SCHEMA)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        c = F.col(r["column"])
        kind = r["kind"]
        if kind == "not_null":
            hit = c.isNotNull()
        elif kind == "range":
            lo, hi = r.get("lo"), r.get("hi")
            hit = F.lit(True)
            if lo is not None:
                hit = hit & (c >= lo)
            if hi is not None:
                hit = hit & (c <= hi)
            hit = c.isNotNull() & hit
        elif kind == "accepted_values":
            hit = c.isin(*r["values"])
        elif kind == "unique":
            aggs.append(F.countDistinct(c).alias(f"_m{i}"))
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        aggs.append(F.sum(hit.cast("long")).alias(f"_m{i}"))
    row = df.groupBy(group_col).agg(*aggs)
    structs = []
    for i, r in enumerate(rules):
        metric = F.expr(f"_m{i} * 1000 DIV greatest(_n, 1)")
        structs.append(F.struct(
            F.lit(r["name"]).alias("rule"),
            metric.alias("metric_permille"),
            F.lit(int(r["min_permille"])).cast("long")
             .alias("min_permille"),
            (metric >= r["min_permille"]).cast("long").alias("passed")))
    return (row.select(group_col,
                       F.explode(F.array(*structs)).alias("r"))
            .select(group_col, "r.*"))
