"""Declarative data-quality expectations (the Deequ/Great-Expectations
capability class): a rule set is compiled into ONE conditional
aggregation pass over the table, returning integer-permille metrics
with pass/fail against thresholds — the validation gate a warehouse
runs before promoting a load, and a training pipeline runs before
trusting a corpus drop.

Each rule is a plain dict:
  {"name": ..., "kind": "not_null" | "unique" | "range" |
   "accepted_values" | "matches_regex", "column": c, ...kind params...,
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


def _rule_aggs(rules: list[dict]) -> list:
    """Compile the rule set into the conditional-aggregation
    expressions (shared by validate and validate_by)."""
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
        elif kind == "matches_regex":
            # Java-regex/RE2-common dialect (no lookaround), the same
            # portability rule as the PII patterns
            hit = c.isNotNull() & c.rlike(r["pattern"])
        elif kind == "unique":
            aggs.append(F.countDistinct(c).alias(f"_m{i}"))
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        aggs.append(F.sum(hit.cast("long")).alias(f"_m{i}"))
    return aggs


def _verdict_structs(rules: list[dict]) -> list:
    """Per-rule verdict structs over the _n/_m{i} aggregate columns
    (shared by validate and validate_by): one explode of these turns
    each aggregate row into |rules| verdict rows without re-deriving
    the aggregate per rule."""
    structs = []
    for i, r in enumerate(rules):
        metric = F.expr(f"_m{i} * 1000 DIV greatest(_n, 1)")
        structs.append(F.struct(
            F.lit(r["name"]).alias("rule"),
            metric.alias("metric_permille"),
            F.lit(int(r["min_permille"])).cast("long")
             .alias("min_permille"),
            (metric >= r["min_permille"]).cast("long").alias("passed")))
    return structs


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    if not rules:
        # explode(array()) cannot star-expand; an empty rule set is a
        # vacuous pass — return the empty verdict frame, not a crash
        return df.sparkSession.createDataFrame([], VERDICT_SCHEMA)
    row = df.agg(*_rule_aggs(rules))
    return (row.select(F.explode(F.array(*_verdict_structs(rules)))
                       .alias("r"))
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
        # empty verdict frame with the group column's REAL type (a
        # hardcoded string would diverge from the non-empty path)
        from pyspark.sql.types import StructType

        gf = df.schema[group_col]
        schema = StructType([gf]).simpleString()[len("struct<"):-1]             .replace(":", " ", 1)
        return df.sparkSession.createDataFrame(
            [], f"{schema}, " + VERDICT_SCHEMA)
    row = df.groupBy(group_col).agg(*_rule_aggs(rules))
    return (row.select(group_col,
                       F.explode(F.array(*_verdict_structs(rules)))
                       .alias("r"))
            .select(group_col, "r.*"))
