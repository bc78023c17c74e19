"""Scale stress harness (not collected by pytest's default run —
invoke directly): replicates the sf0.1 tables 10x/16x into /tmp and
runs the shuffle-heavy operator families, checking wall time scales
~linearly and nothing blows up combinatorially.

Usage: python tests/stress_scale.py [factor]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# argv is only meaningful when run as a script — under an importer
# (sweep_full_registry, pytest) the globals are defaults the caller
# overrides (sweep sets FACTOR/DST; replicate() reads both)
_cli = sys.argv[1:] if __name__ == "__main__" else []
FACTOR = int(_cli[0]) if _cli else 10
ONLY = set(_cli[1:])  # optional query-name filter
SRC = "/root/testdata/sf0.1"
DST = f"/tmp/gmall_stress_x{FACTOR}"

QUERIES = [
    "visitor_stats_window", "pricing_summary", "province_stats_sql",
    "event_stats_daily", "sessionize", "minhash_band_pairs",
    "dup_clusters", "dedup_summary", "simhash_band_pairs",
    "contamination_check", "embedding_dups_exhaustive", "embedding_dups_lsh",
    "quantization_error", "ngram_jaccard_pairs", "minhash_jaccard_pairs",
    "knn_bruteforce", "sequence_packing",
    "segment_dedup", "doc_chunks", "pii_redaction", "lsh_ann",
    "kmeans_clusters",
    "duplicate_spans", "mixture_plan", "quality_weighted_sample",
    "training_shard_plan", "ann_recall", "pq_codebook_audit",
    "heavy_hitter_terms", "unigram_lm_scores", "bpe_merge_candidates",
    "snapshot_diff", "contrastive_pairs", "minhash_dedup_marks",
    "corpus_funnel", "daily_value_zscores", "frame_dedup",
    "ivfpq_ann", "padding_waste_audit", "bigram_lm_scores", "langid_trigram",
    "data_quality_report", "source_quality_report", "dedup_provenance",
    "split_leakage_check",
    # round 4: classifier scorer; the capped exact-verify pass (its
    # x10 wall is ~90 s — dominated by true Levenshtein work on the
    # replica corpus's real near-dup mass, bounded at cap·bands·n)
    "hashed_classifier_scores", "editdist_verified_pairs",
    # round 5: full BPE trainer/encoder + DSIR importance weights
    "bpe_merges", "bpe_encode_stats", "dsir_weights",
    "media_text_alignment",
    # round 5 (cont.): cross-snapshot novelty gate, robust stats
    "incremental_dedup", "winsorized_price_stats", "profile_drift",
    # round 5 (cont.): CCNet tier split, Markov transition matrix,
    # join-key skew diagnostics
    "perplexity_buckets", "event_transitions", "key_skew_audit",
    "referential_integrity", "rolling_active_users", "zorder_stats",
    "gap_fill_daily", "part_cooccurrence", "rolling_active_users_approx",
    "trade_pagerank", "scd2_dim_join", "session_path_ngrams",
    "linear_attribution", "rfm_segments",
    # round 6: CJK-aware tokenizer downstream + profiling reports
    "keyword_stats", "script_mix_stats", "token_fertility_stats",
    "cross_source_dup_matrix", "dedup_threshold_calibration",
    "near_dup_rate_by_source",
    # round 7: driver-gradeable sketch-audit forms (estimate + exact
    # subplan + in-band verdicts; rolling_active_users_approx is
    # already listed above)
    "unique_visitors_daily_approx", "profile_sketch_report",
    "uv_sketch_rollup", "doc_length_percentiles_approx",
]
assert len(QUERIES) == len(set(QUERIES)), "duplicate stress entries"


def replicate(spark):
    """Replica-shift every table's keys so the enlarged corpus has
    FACTOR distinct variants of each row (not FACTOR exact copies —
    exact copies would send every dedup bucket quadratic on purpose)."""
    from pyspark.sql import functions as F

    from gmall_flink_2021_spark.sources.tables import TABLE_NAMES, load_table

    os.makedirs(DST, exist_ok=True)
    # explicit replica-factor marker — registry.replica_factor reads
    # this (never the directory name) to decide oracle feasibility
    import json

    from gmall_flink_2021_spark.plans.registry import REPLICA_MARKER
    with open(os.path.join(DST, REPLICA_MARKER), "w") as fh:
        json.dump({"factor": FACTOR, "source": SRC}, fh)
    shifts = {
        "events": ("event_id", "user_id"),
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
        "orders": ("o_orderkey", "o_custkey"),
        "lineitem": ("l_orderkey",),
        "customer": ("c_custkey",),
    }
    for name in TABLE_NAMES:
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            continue
        df = load_table(spark, SRC, name)
        if name in shifts:
            rep = spark.range(FACTOR).withColumnRenamed("id", "_rep")
            df = df.crossJoin(F.broadcast(rep))
            for key in shifts[name]:
                df = df.withColumn(
                    key, F.col(key) + F.col("_rep") * F.lit(10_000_000))
            # vary document text per replica so near-dup blocks stay
            # realistic instead of multiplying every bucket by FACTOR;
            # recompute n_chars to keep the generator invariant
            # n_chars == length(text) (media/frame oracles recompute
            # byte-length arithmetic from n_chars)
            if name == "documents":
                df = (df.withColumn(
                    "text", F.concat_ws(" ", "text",
                                        F.concat(F.lit("rep"), "_rep")))
                    .withColumn("n_chars",
                                F.length("text").cast("long")))
            df = df.drop("_rep")
        df.coalesce(4).write.mode("overwrite").parquet(out)


def main():
    from gmall_flink_2021_spark.plans import QUERIES as REG
    from gmall_flink_2021_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    replicate(spark)
    print(f"replicate x{FACTOR}: {time.time() - t0:.1f}s", flush=True)

    base, big = {}, {}
    for name in (q for q in QUERIES if not ONLY or q in ONLY):
        t0 = time.time()
        REG[name](spark, SRC).collect()
        base[name] = time.time() - t0
        t0 = time.time()
        try:
            REG[name](spark, DST).collect()
        except Exception as exc:  # noqa: BLE001 — a deliberate audit
            # fence (e.g. embedding_dups_exhaustive's total-scored-
            # pairs bound) must not kill the rest of the sweep
            print(f"{name:28s} sf0.1={base[name]:6.2f}s "
                  f"x{FACTOR}=FENCED/ERROR: "
                  f"{type(exc).__name__}: {str(exc)[:160]}",
                  flush=True)
            continue
        big[name] = time.time() - t0
        ratio = big[name] / max(base[name], 1e-9)
        flag = "" if ratio < FACTOR * 1.8 else "  <-- SUPERLINEAR"
        print(f"{name:28s} sf0.1={base[name]:6.2f}s "
              f"x{FACTOR}={big[name]:7.2f}s ratio={ratio:5.1f}{flag}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
