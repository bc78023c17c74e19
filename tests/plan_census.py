"""Mechanical full-registry plan census (VERDICT r11 #8): count
physical-plan tree nodes for every registry query and flag the
anti-patterns the optimization guide lists. Writes the machine-
readable artifact to plans/<dir>/census.json and prints violations.

Thresholds (from the r11 survey, kept as the regression tripwire):
  - CartesianProduct / BroadcastNestedLoopJoin outside the pinned
    1-row-broadcast cases
  - any row-at-a-time BatchEvalPython
  - >=5 parquet scans, >=8 exchanges, or >=3 sort-merge joins

Usage: SPARK_GRAFT_SF_DIR=... python tests/plan_census.py [out_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Queries whose BroadcastNestedLoopJoin is a PINNED 1-row broadcast
# (a constant frame crossJoined onto the stream — the correct
# physical choice; see test_tfidf_search_shape).
BNLJ_PINNED = {
    "tfidf_search", "langid_trigram", "dsir_weights",
    "contamination_check", "split_leakage_check", "corpus_funnel",
    "quality_weighted_sample", "mixture_plan", "training_shard_plan",
    "domain_quota_sample", "nation_market_share", "dedup_summary",
    "winsorized_price_stats", "daily_value_zscores",
    "perplexity_buckets", "revenue_forecast", "key_skew_audit",
    "data_quality_report", "source_quality_report", "zorder_stats",
    "gap_fill_daily", "stratified_sample", "train_val_split",
    "norm_histogram", "quantization_error", "doc_length_percentiles_approx",
    "unique_visitors_daily_approx", "rolling_active_users_approx",
    "profile_sketch_report", "uv_sketch_rollup", "padding_waste_audit",
    "bpe_merges", "bpe_encode_stats", "bpe_token_stats",
    "dedup_threshold_calibration", "editdist_verified_pairs",
}


def main() -> None:
    from gmall_flink_2021_spark.plans import QUERIES
    from gmall_flink_2021_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    census: dict[str, dict] = {}
    violations: list[str] = []
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # tree section only (the detail section repeats every node)
        tree = plan.split("\n\n", 1)[0]
        counts = {
            "scans": len(re.findall(r"Scan parquet", tree)),
            "exchanges": len(re.findall(r"\bExchange\b", tree)),
            "smj": len(re.findall(r"SortMergeJoin", tree)),
            "bhj": len(re.findall(r"BroadcastHashJoin", tree)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", tree)),
            "cartesian": len(re.findall(r"CartesianProduct", tree)),
            "batch_eval_python": len(re.findall(r"BatchEvalPython", tree)),
            "arrow_eval_python": len(re.findall(r"ArrowEvalPython", tree)),
            "map_in_pandas": len(re.findall(r"MapInPandas|MapInArrow",
                                            tree)),
            "window": len(re.findall(r"\bWindow\b", tree)),
            "generate": len(re.findall(r"\bGenerate\b", tree)),
        }
        census[name] = counts
        if counts["cartesian"]:
            violations.append(f"{name}: CartesianProduct")
        if counts["bnlj"] and name not in BNLJ_PINNED:
            violations.append(f"{name}: BroadcastNestedLoopJoin "
                              f"(not in pinned set)")
        if counts["batch_eval_python"]:
            violations.append(f"{name}: BatchEvalPython")
        if counts["scans"] >= 5:
            violations.append(f"{name}: {counts['scans']} scans")
        if counts["exchanges"] >= 8:
            violations.append(f"{name}: {counts['exchanges']} exchanges")
        if counts["smj"] >= 3:
            violations.append(f"{name}: {counts['smj']} SMJs")
        spark.catalog.clearCache()
    out = {"sf_dir": sf_dir, "n": len(census),
           "violations": violations, "census": census}
    path = os.path.join(out_dir, "census.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"census: {len(census)} plans -> {path}")
    if violations:
        print("VIOLATIONS:")
        for v in violations:
            print(f"  {v}")
    else:
        print("zero anti-pattern violations")
    spark.stop()


if __name__ == "__main__":
    main()
