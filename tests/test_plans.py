"""Physical-plan assertions: the scale claims in SCALE.md must be
visible in the actual plans — broadcasts where dims join facts,
pushed filters and pruned scans on the fact table, top-N without a
global sort, partial aggregation, and the broadcast nested-loop form
of the literal range join.
"""

from gmall_flink_2021_spark.plans.registry import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _plan(spark, name: str) -> str:
    return _formatted(QUERIES[name](spark, SF_SMOKE))


def test_dim_joins_are_broadcast(spark):
    plan = _plan(spark, "nation_year_revenue")
    assert "BroadcastHashJoin" in plan
    # supplier→nation chain must never sort-merge
    assert plan.count("BroadcastHashJoin") >= 2


def test_fact_scan_is_pruned_and_pushed(spark):
    plan = _plan(spark, "revenue_forecast")
    # predicate pushdown reaches the parquet scan
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("\n")[0]
    # column pruning: the 11-column lineitem scan reads only the 4
    # columns the query touches
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert read.count(":") - 1 <= 4, read


def test_topn_uses_heap_not_global_sort(spark):
    plan = _plan(spark, "top_brands")
    assert "TakeOrderedAndProject" in plan


def test_aggregates_are_partial_final(spark):
    plan = _plan(spark, "pricing_summary")
    # map-side combine: partial + final HashAggregate pair
    assert plan.count("HashAggregate") >= 2


def test_range_join_broadcasts_the_interval_table(spark):
    plan = _plan(spark, "price_tier_stats")
    assert "BroadcastNestedLoopJoin" in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """The curated-output write path: stats written partitioned by day
    must let a day-filtered readback scan only that partition."""
    from gmall_flink_2021_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_day")
    (events
     .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
     .write.partitionBy("day").mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    one_day = back.select("day").distinct().limit(1).collect()[0][0]
    q = back.filter(F.col("day") == one_day)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = q._jdf.queryExecution().explainString(mode)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "day" in pf
    # pruned scan reads strictly fewer rows than the full table
    assert q.count() < back.count()


def test_sliding_window_is_one_expand_no_extra_shuffle(spark):
    """The hopping window (size=2×slide) must plan as a single Expand
    (×2 row multiplier) feeding the same partial/final aggregate pair
    as the tumbling form — overlap must not introduce extra
    shuffles."""
    sliding = _plan(spark, "visitor_stats_sliding")
    tumbling = _plan(spark, "visitor_stats_window")
    assert sliding.count("Expand") >= 1
    assert sliding.count("Exchange") == tumbling.count("Exchange")


def test_dedup_summary_does_not_force_broadcast(spark):
    """`drops` is corpus-proportional (one row per duplicate doc), so
    the summary join must not hint a broadcast — AQE may still choose
    one at runtime when the side actually fits, but the *logical* plan
    must leave it free.  Checked on the analyzed plan: no
    ResolvedHint/broadcast annotation on the drops side."""
    from gmall_flink_2021_spark.sources.tables import load_table
    from gmall_flink_2021_spark.operators import dedup

    documents = load_table(spark, SF_SMOKE, "documents")
    df = dedup.dedup_summary(documents)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed
    assert "ResolvedHint (strategy=broadcast)" not in analyzed


def test_ngram_inverted_index_caps_document_frequency(spark):
    """The O(df²) self-join guards: the inverted-index plan must filter
    on the window-computed document frequency AND rank-cap each doc's
    index entries (the per-doc rarest-shingle budget) before the
    join."""
    plan = _plan(spark, "ngram_jaccard_pairs")
    assert "df#" in plan or "(df" in plan, "df filter missing from plan"
    assert "rk#" in plan or "(rk" in plan, "per-doc budget missing"
    assert "row_number" in plan


def test_quantization_error_materializes_max_abs_once(spark):
    """Regression guard for the O(d^2) expression-inlining trap:
    max_abs must be computed as a column (once per row), not re-inlined
    into the per-element dequantization lambda — inlining makes the
    plan carry one array_max subtree per consumer (21.6s -> 0.7s at
    sf0.1 when fixed)."""
    plan = _plan(spark, "quantization_error")
    assert plan.count("array_max") <= 3


def test_embedding_dups_keeps_fold_count_bounded(spark):
    """The dot/norm folds must not multiply through CollapseProject:
    the projected-before-filter shape holds the aggregate() lambda
    count at 6 (2 norms + dot, each visible at most twice)."""
    plan = _plan(spark, "embedding_dups_exhaustive")
    assert plan.count("aggregate(") <= 6


def test_default_embedding_dups_is_band_blocked(spark):
    """The default near-dup path (embedding_dups_lsh) must generate
    candidates via the banded (label, band, bkey) equi-join — never
    label-only, never a nested loop/cartesian."""
    plan = _plan(spark, "embedding_dups_lsh")
    assert "bkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_jaccard_scorer_shape(spark):
    """The signature-estimated scorer must stay candidate-bounded:
    capped candidate generation (a lead() window over each LSH bucket
    — per-doc fan-out ≤ cap·bands, never the bucket² self-join) plus
    two equi-joins back to the signature table — never a
    cartesian/nested-loop, and no text tokenization downstream of the
    signature aggregation (the whole point is scoring without
    re-reading text)."""
    plan = _plan(spark, "minhash_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the cap is a window over (band, band_hash), not a pair self-join
    assert "Window" in plan


def test_simhash_band_pairs_is_bucketed_equi_join(spark):
    """Candidate generation must be a (band, band_key)-keyed
    STREAMING equi-join — never a nested-loop/cartesian all-pairs
    scan, never a broadcast (the merge hint pins shuffle-merge at
    every scale so both sides share one reusable exchange), and never
    the r11 bucket-array shape (collect_list + in-array explode),
    whose single array row per bucket materialized O(m²) struct
    copies and measured 8.4× slower on the x32 high-dup-density
    corpus (r12 A/B)."""
    plan = _plan(spark, "simhash_band_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan
    assert "collect_list" not in plan


def test_tfidf_search_shape(spark):
    """Top-k by heap (TakeOrderedAndProject), the 1-row idf frame
    broadcast (nested-loop on a single row is the right physical
    choice), and no shuffle of the documents scan beyond the final
    aggregation."""
    plan = _plan(spark, "tfidf_search")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering (the 100 TB join-pruning path): when
    a selective dim-side filter feeds a non-broadcast join, Spark
    injects a bloom filter that prunes the fact scan before the
    shuffle. The size thresholds exist precisely because this only
    pays off at large scans (applicationSideScanSizeThreshold defaults
    to 10GB), so the test relaxes them to local sizes and asserts the
    might_contain predicate reaches the fact side."""
    from pyspark.sql import functions as F

    from gmall_flink_2021_spark.sources.tables import load_table

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        lineitem = load_table(spark, SF_SMOKE, "lineitem")
        j = (lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "might_contain" in plan.lower()
        assert "bloom_filter_agg" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_uv_sketch_rollup_scans_events_once(spark):
    """The monthly sketch union is a window over the daily aggregate —
    regression guard against the join formulation that scanned and
    sketch-aggregated the raw events twice. Pins the serving-path
    ESTIMATE form (the registry entry is the audit form, which joins
    exact subplans on purpose)."""
    from gmall_flink_2021_spark.operators import dwm
    from gmall_flink_2021_spark.sources.tables import load_table

    df = dwm.uv_sketch_rollup(load_table(spark, SF_SMOKE, "events"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("simple")
    plan = df._jdf.queryExecution().explainString(mode)
    assert plan.count("FileScan") == 1


def test_doc_chunks_has_zero_shuffles(spark):
    """Chunking is a pure scan-side fan-out: sequence+posexplode+slice
    must produce a plan with no Exchange at all."""
    plan = _plan(spark, "doc_chunks")
    assert "Generate" in plan          # the posexplode
    assert "Exchange" not in plan


def test_pii_redaction_is_scan_plus_one_agg(spark):
    """PII scrubbing is a scan projection + one map-side-combined
    aggregation: exactly one shuffle, no joins."""
    plan = _plan(spark, "pii_redaction")
    # "Exchange (" counts tree nodes once (formatted mode prints each
    # operator again in the detail section)
    assert plan.count("Exchange (") == 1
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2   # partial + final
    # the planted-text CASE must be materialized once, not re-inlined
    # into every regex stage (the SCALE.md aliasing hazard): the
    # staged projection leaves exactly one CASE WHEN in the whole
    # physical plan
    assert plan.count("CASE WHEN") == 1, plan.count("CASE WHEN")


def test_segment_dedup_shuffles_by_hash_then_doc(spark):
    """Paragraph dedup needs exactly two shuffles: segment-hash for
    first-occurrence ranking, doc_id for reconstruction — and the
    ranking must be a window, not a self-join."""
    plan = _plan(spark, "segment_dedup")
    assert plan.count("Exchange (") == 2
    assert "Window" in plan
    assert "Join" not in plan


def test_editdist_verify_is_candidate_bounded(spark):
    """The Levenshtein verify pass must run on LSH candidates via
    equi-joins only — never a cartesian/nested-loop all-pairs."""
    plan = _plan(spark, "editdist_verified_pairs")
    assert "levenshtein" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_candidates_are_band_blocked(spark):
    """SemDedup pruning must generate candidates via the banded
    (cluster, band, bkey) equi-join inside learned blocks — same
    bucketed shape as the default embedding_dups path."""
    plan = _plan(spark, "semdedup_prune")
    assert "bkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_spans_fanout_is_scan_side(spark):
    """The strided window fan-out must happen in the scan projection
    (Generate/explode), spans must carry only the md5 (never text
    past the Generate), and the dup-mark join back must be a hash
    equi-join, not a nested loop."""
    plan = _plan(spark, "duplicate_spans")
    assert "Generate" in plan
    assert "NestedLoop" not in plan
    assert "md5" in plan
    # groupBy(h) + join-back + doc agg: shuffles keyed by hash/doc_id
    assert plan.count("HashAggregate") >= 2   # partial + final


def test_mixture_plan_total_is_broadcast(spark):
    """The 1-row weight total joins the per-source frame via
    broadcast; the only corpus-touching shuffle is the per-source
    aggregation (map-side combined)."""
    plan = _plan(spark, "mixture_plan")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_quality_weighted_sample_is_zero_shuffle(spark):
    """Deterministic hash-threshold sampling is a pure scan
    projection + filter: no Exchange, no Join, no aggregation."""
    plan = _plan(spark, "quality_weighted_sample")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ann_recall_composes_broadcast_probes(spark):
    """Both ranking sides broadcast the small query set; the recall
    comparison join must not shuffle the corpus again (no
    SortMergeJoin anywhere in the composition)."""
    plan = _plan(spark, "ann_recall")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_training_shard_plan_is_one_corpus_shuffle(spark):
    """Shard audit = scan + one map-side-combined agg keyed by shard
    + broadcast 1-row total; the corpus shuffles exactly once."""
    plan = _plan(spark, "training_shard_plan")
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_pq_assignment_is_zero_shuffle_projection(spark):
    """PQ codebook audit: the per-iteration assignment must be a pure
    projection over the exploded subvector frame (codewords ride as
    literals — no join against a centroid table), and the final plan's
    only joins are none at all."""
    plan = _plan(spark, "pq_codebook_audit")
    assert "Join" not in plan
    # the error rollup aggregates the persisted assignment (min(fp) on
    # strings plans as SortAggregate — fine at m*k output rows)
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_heavy_hitter_recount_broadcasts_candidates(spark):
    """The MG candidate set (≤ counters·partitions rows) must reach
    the recount as a broadcast — the token stream joins it without a
    shuffle, and no corpus-sized SortMergeJoin appears. The only
    corpus shuffle is the post-filter candidate count aggregation."""
    plan = _plan(spark, "heavy_hitter_terms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # MG runs Arrow-batched per partition, not row-at-a-time Python
    assert "MapInPandas" in plan


def test_unigram_lm_vocab_table_is_broadcast(spark):
    """The fixed-point log-prob table (vocab-bounded) and the 1-row
    floor both broadcast into the token stream; the corpus never
    sort-merge-joins. The global rank runs over the VOCAB aggregate,
    not the corpus (single-partition window AFTER an aggregation)."""
    plan = _plan(spark, "unigram_lm_scores")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "Window" in plan


def test_bpe_pair_fanout_runs_over_vocab_not_corpus(spark):
    """The pair explode must sit ABOVE the word-frequency aggregation
    in the plan (fan-out over vocab rows, not corpus tokens): the
    plan has an aggregate below the generator, and the final top-k is
    a bounded TakeOrderedAndProject/Window, not a corpus sort."""
    plan = _plan(spark, "bpe_merge_candidates")
    gen = plan.find("Generate")
    # two Generates: tokenizer explode (below agg) + pair explode
    # (above agg); the pair generator must consume the aggregate
    assert plan.count("Generate") >= 2
    assert "HashAggregate" in plan
    assert gen != -1


def test_snapshot_diff_is_single_pk_join_of_digests(spark):
    """Reconciliation = full-outer join keyed by pk over (pk, digest)
    scan projections: exactly one join, no nested-loop, and each
    side's scan reads only pk + digest inputs (6 columns), not the
    9-column orders table."""
    plan = _plan(spark, "snapshot_diff")
    assert "SortMergeJoin FullOuter" in plan or (
        "SortMergeJoin" in plan and "FullOuter" in plan) or (
        "ShuffledHashJoin" in plan and "FullOuter" in plan)
    assert "BroadcastNestedLoopJoin" not in plan
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all(ln.count(":") - 1 <= 6 for ln in reads), reads


def test_contrastive_mining_is_one_scan_one_window(spark):
    """Hard positives + hard negatives come from a single broadcast-
    scored corpus scan and ONE window pass (sign-flipped sort key):
    the anchors reach the corpus via broadcast, the corpus never
    SortMergeJoins, and the plan contains exactly one Window
    operator."""
    import re

    plan = _plan(spark, "contrastive_pairs")
    assert "SortMergeJoin" not in plan
    # exactly one Window operator node (WindowGroupLimit nodes are the
    # rank-filter pushdown — the per-partition top-k heap — and fine)
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 1
    assert "WindowGroupLimit" in plan


def test_minhash_dedup_marks_ranks_buckets_no_pair_join(spark):
    """The ingestion-mark form must NOT enumerate candidate pairs: no
    self-join of the banded projection (every join in the plan has a
    build side bounded by buckets or marks, and the banded frame is
    scanned from its InMemoryRelation, not joined to itself on
    doc_id inequality). Concretely: no '<' join condition anywhere —
    pair enumeration's signature — and ≥2 aggregates (bucket min,
    per-doc min)."""
    plan = _plan(spark, "minhash_dedup_marks")
    assert "doc_id#" in plan
    assert plan.count("HashAggregate") >= 2
    # the pair form's `l.doc_id < r.doc_id` join predicate is absent
    import re
    assert not re.search(r"doc_id#\d+L? < doc_id#\d+L?", plan)


def test_corpus_funnel_is_one_scan_plus_dedup_branch(spark):
    """The funnel must not re-scan the corpus per gate: exactly two
    text-scan branches total (the per-doc signal projection + the
    dedup-marks signature branch) and one final source-keyed
    aggregation — the gates are conditional sums, not separate
    queries."""
    plan = _plan(spark, "corpus_funnel")
    scans = [ln for ln in plan.splitlines()
             if "Scan parquet" in ln and "documents" in ln]
    assert len(scans) <= 2, scans
    assert plan.count("HashAggregate") >= 4  # bucket/doc/funnel pairs


def test_zscore_window_runs_over_daily_aggregate(spark):
    """The trailing-frame window must consume the daily aggregate
    (O(days·types) rows), not raw events: the Window sits above a
    partial/final HashAggregate pair, and the frame spec is bounded
    (ROWS BETWEEN ... PRECEDING AND 1 PRECEDING), not running."""
    plan = _plan(spark, "daily_value_zscores")
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    assert "-7, -1" in plan or "7 PRECEDING" in plan.upper() or \
        "rowsBetween" in plan or "specifiedwindowframe" in plan.lower()


def test_frame_dedup_aggregates_above_arrow_fanout(spark):
    """The multimodal dedup plan: Arrow mapInPandas frame fan-out
    feeding one hash-keyed partial/final aggregate pair — no joins,
    no Python outside the fan-out."""
    plan = _plan(spark, "frame_dedup")
    assert "MapInPandas" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_ivfpq_search_is_codeword_dispatch_no_vector_rejoin(spark):
    """The ADC search must rank candidates from their CODES, never by
    re-reading candidate vectors: the distance projection is a literal
    codeword CASE (no join back to an embedding-array column on the
    candidate side), the query subvectors broadcast, and the final
    top-k is a WindowGroupLimit heap."""
    plan = _plan(spark, "ivfpq_ann")
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_padding_audit_sorts_are_bucket_partitioned(spark):
    """Both orderings must build global ordinals WITHOUT funneling the
    corpus through one task: deterministic order-preserving buckets
    (hash exchange on _b) + bucket-local windows + broadcast offset
    join, and NO SinglePartition exchange into a Window (the naive
    global row_number's signature). Deterministic buckets — not
    sampled range bounds — so a recompute after cache release cannot
    collide ordinals."""
    plan = _plan(spark, "padding_waste_audit")
    assert plan.count("Window") >= 2
    assert "hashpartitioning(_b" in plan
    assert "BroadcastHashJoin" in plan
    # the sampled-bounds exchange must be gone entirely
    assert "rangepartitioning" not in plan.lower()
    # the corpus never funnels through a SinglePartition exchange into
    # a Window (final 1-row aggregates legitimately use one)
    for i, ln in enumerate(plan.splitlines()):
        if "Exchange SinglePartition" in ln:
            nxt = "\n".join(plan.splitlines()[i:i + 3])
            assert "Window" not in nxt, nxt
    assert "Union" in plan


def test_langid_profile_broadcasts_and_argmax_is_heap(spark):
    """The trained profile (charset³-bounded) must broadcast into the
    doc-trigram stream (no corpus-side SortMergeJoin against the
    profile), and the per-doc argmax must be a partial-aggregating
    min(struct(-score, lang)) hash aggregation — no per-doc sort, no
    window at all (round 5: replaced the row_number WindowGroupLimit
    heap, which still sorted the doc x lang grid)."""
    plan = _plan(spark, "langid_trigram")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "min(best" in plan or "min(struct" in plan or "HashAggregate" in plan


def test_expectations_compile_to_one_pass(spark):
    """The whole rule set must cost ONE scan of orders: a single
    aggregate (the distinct rule rides the same Expand), then |rules|
    1-row projections unioned — no per-rule re-scan."""
    import re

    plan = _plan(spark, "data_quality_report")
    # one distinct scan NODE (formatted plans print each node twice:
    # tree + detail section)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_hashed_classifier_is_broadcast_scored(spark):
    """Model-based filtering must ride one corpus pass: the dim-row
    weight table joins by BROADCAST (never a shuffled join keyed by
    bucket — the corpus side must not shuffle for enrichment), and the
    per-doc logit is a partial/final hash aggregate."""
    plan = _plan(spark, "hashed_classifier_scores")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_signature_shuffle_is_pre_fanout(spark):
    """spread() must move the only corpus shuffle BEFORE the shingle
    fan-out: exactly one shuffle Exchange (hashpartitioning on
    doc_id) on the signature path, positioned BELOW the Generate
    (explode), and the per-doc min-aggregation must reuse that
    partitioning — no exchange between the Generate and the final
    aggregate (the broadcast for the doc_id left-join is exempt)."""
    import re

    from gmall_flink_2021_spark.operators import dedup
    from gmall_flink_2021_spark.sources.tables import load_table

    # a prior test may have persisted an identical sub-plan; a cache
    # hit rewrites the tree into InMemoryTableScan whose stored AQE
    # plan prints initial+final trees (duplicate Exchange entries)
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMOKE, "documents")
    sig = dedup.minhash_signatures(docs).filter("h0 is not null")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = sig._jdf.queryExecution().explainString(mode)
    tree = plan.split("\n\n")[0]
    shuffles = [int(m.group(1)) for m in
                re.finditer(r"(?<!Broadcast)Exchange \((\d+)\)", tree)]
    gens = [int(m.group(1)) for m in
            re.finditer(r"Generate \((\d+)\)", tree)]
    assert gens, "explode missing from plan"
    assert len(shuffles) == 1, tree
    # leaf-first numbering: the one shuffle must feed the explode
    assert shuffles[0] < min(gens), tree
    assert "hashpartitioning(doc_id" in plan


def test_winsorize_sorts_once_and_broadcasts_thresholds(spark):
    """winsorized_price_stats: exactly ONE sort exchange (the
    per-group rank pass — exact quantiles' intrinsic cost) and the
    5-row threshold table broadcast back onto the clamped
    aggregation, never sort-merged."""
    plan = _plan(spark, "winsorized_price_stats")
    assert plan.count("Sort ") <= 2  # window sort (+AQE detail), no 2nd
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_novelty_gate_no_cartesian_and_no_text_on_store_path(spark):
    """incremental_dedup: every join is an equi-join (no cartesian /
    nested-loop anywhere in the composed plan)."""
    plan = _plan(spark, "incremental_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perplexity_buckets_tier_split_shape(spark):
    """The CCNet tier split inherits the unigram scorer's broadcast
    shape (vocab log-prob table broadcast, no corpus sort-merge), the
    doc-keyed lang join stays a hash join, and the tier ranking adds
    at most two per-language Window passes (group count + rank) on
    top of the scorer's vocab-bounded top-V rank — three Window nodes
    total, not one per output metric."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "perplexity_buckets")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 3


def test_event_transitions_is_one_user_shuffle(spark):
    """The Markov matrix costs ONE corpus shuffle (the per-user lag
    window); the pair aggregation is partial/final on top of the
    window's partitioning and the permille share runs over the
    |types|^2 aggregate — no join, no second corpus exchange."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "event_transitions")
    assert "Join" not in plan or "BroadcastHashJoin" not in plan
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 2
    assert "partial_count" in plan or "HashAggregate" in plan


def test_key_skew_audit_reduces_before_ranking(spark):
    """The skew audit must rank the |keys|-row AGGREGATE, never the
    corpus: partial/final count aggregation below the rank window,
    heavy keys off a TakeOrderedAndProject heap, the 1-row stats
    frame broadcast (nested-loop on one row), and no sort-merge
    join anywhere. The wrapper path releases the shared key-count
    cache (recompute-on-reuse); library callers keep the CacheHandle
    for the single-scan form."""
    spark.catalog.clearCache()
    plan = _plan(spark, "key_skew_audit")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_referential_integrity_joins_key_aggregates(spark):
    """Every relationship must aggregate the child to (fk, count)
    BELOW the integrity join — the join inputs are key sets, never
    raw fact rows: one partial/final aggregate pair per relation
    under a Union, and no cartesian/nested-loop anywhere."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "referential_integrity")
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # 6 relations x (partial+final child count, distinct parent,
    # final report agg) — at least 18 HashAggregates in the tree
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 18


def test_rolling_active_users_expands_bounded(spark):
    """The sliding distinct must be contribution expansion (a
    length-7 sequence Generate over the deduped user-day table), not
    a day-range self-join or per-day user-set windows: Generate node
    present, no CartesianProduct, no Window over the corpus, and
    both distincts are partial/final hash aggregates."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "rolling_active_users")
    assert "Generate" in plan and "explode" in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 0
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4


def test_zorder_stats_is_two_scans_no_joins(spark):
    """The layout audit costs the extrema scan (1-row broadcast back
    via nested loop) plus one code-projection scan into a
    partial/final bucket aggregate — shift/mask algebra only, no
    real join, no window, no shuffle beyond the n_buckets-row
    aggregate."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "zorder_stats")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 0
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2


def test_gap_fill_window_runs_over_aggregate(spark):
    """The LOCF window must sort the (type, day) AGGREGATE, not raw
    events: the corpus collapses through a partial/final count pair
    before the spine join, the 1-row extent broadcasts, and exactly
    one Window node exists."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "gap_fill_daily")
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 1
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2


def test_part_cooccurrence_avoids_fact_self_join(spark):
    """Basket mining must fan pairs out of per-order arrays
    (Generate over collect_set), take the top-k off a heap, and keep
    every join a hash join against bounded frames — never a
    sort-merge self-join of the fact table."""
    spark.catalog.clearCache()
    plan = _plan(spark, "part_cooccurrence")
    assert "Generate" in plan and "explode" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rolling_uv_sketch_union_runs_over_daily_sketches(spark):
    """The approx rolling-UV path must scan the corpus once into the
    per-day sketch aggregate (partial/final pair) and run the union
    as ONE range window over the O(days) sketch rows — no expansion
    of raw rows, no join."""
    import re

    spark.catalog.clearCache()
    # the registry entry is now the audit form (which joins the exact
    # expansion on purpose); the pinned 100 TB serving path is the raw
    # estimate form
    from gmall_flink_2021_spark.plans.registry import (
        SKETCH_ESTIMATE_QUERIES)
    df = SKETCH_ESTIMATE_QUERIES["rolling_active_users_approx"](
        spark, SF_SMOKE)
    plan = _formatted(df)
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 1
    assert "Generate" not in plan
    assert "Join" not in plan
    # sketch buffers aggregate via ObjectHashAggregate (not codegen
    # HashAggregate) — still a partial/final pair
    assert len(re.findall(r"\(\d+\) ObjectHashAggregate", plan)) >= 2


def test_trade_pagerank_iterates_on_graph_not_corpus(spark):
    """The fact table feeds ONE edge aggregation (broadcast dimension
    chain — asserted on the recomputable edge lineage the operator
    exposes); the rank recurrence then runs on the bounded collect,
    so the RESULT is a local relation with zero exchanges."""
    spark.catalog.clearCache()
    from gmall_flink_2021_spark.operators import analytics
    from gmall_flink_2021_spark.plans.registry import _t
    tabs = _t(spark, SF_SMOKE, "nation", "customer", "supplier",
              "orders", "lineitem")
    df, eh = analytics.trade_pagerank(*tabs)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode         .fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan
    # r11 literal_frame: the driver result is pure-SQL
    # inline(arrays_zip(lit...)) over a single-split Range — one
    # JVM-only task, no Python workers — replacing the 32-slice
    # parallelize (LocalTableScan / Scan ExistingRDD) shapes
    assert ("LocalTableScan" in plan or "Scan ExistingRDD" in plan
            or ("Generate" in plan and "Range" in plan))
    eplan = eh.edges._jdf.queryExecution().explainString(mode)
    assert eplan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in eplan


def test_scd2_join_is_merge_not_inequality_join(spark):
    """The effective-dated enrichment must plan as the union +
    carry-forward merge: exactly one Window over the order-keyed
    union and NO join operator at all — the inequality-join
    formulation (the oracle's) would grow with versions x facts."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "scd2_dim_join")
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 1
    assert "Join" not in plan
    assert "Union" in plan


def test_session_paths_fan_out_from_arrays(spark):
    """Path mining must shingle per-session arrays (Generate over the
    collect_list aggregate — fan-out bounded by session length),
    rank sessions in ONE user-keyed window pass pair, and take the
    top-k off a heap; never a sequence self-join."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "session_path_ngrams")
    assert "Generate" in plan and "explode" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) <= 3


def test_linear_attribution_is_merge_not_pair_join(spark):
    """Multi-touch credit must come from the reverse carry-forward
    merge: one Window over the user-keyed union, the only join the
    purchase←touch-count equi-join on the aggregate — never a
    view×purchase inequality join (no nested loop, no cartesian)."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "linear_attribution")
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Union" in plan


def test_rfm_windows_rank_the_customer_aggregate(spark):
    """The three rank windows must sort the per-customer AGGREGATE
    (orders reduced once through a partial/final pair), never raw
    orders; the corpus-extent frame broadcasts (1-row nested loop);
    no cartesian."""
    import re

    spark.catalog.clearCache()
    plan = _plan(spark, "rfm_segments")
    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) <= 4
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2


def _tree_nodes(plan: str) -> list[str]:
    """Node names from the formatted explain's tree section (each node
    also reappears in the details section, so raw substring counts
    double-count)."""
    import re

    return re.findall(r"\(\d+\) ([A-Za-z]+)", plan)


def test_script_mix_is_scan_plus_one_partial_agg(spark):
    """script_mix_stats: char-class counting must fold into the scan
    (pure projections) with one partial+final aggregate pair and a
    single exchange — no joins, no window, no UDF."""
    spark.catalog.clearCache()  # avoid InMemoryTableScan rewrites
    nodes = _tree_nodes(_plan(spark, "script_mix_stats"))
    # partial + final over the corpus, plus the readout's re-sum of
    # the |sources|-row partials (the partials→readout split shared
    # with the streaming form) — what matters at scale is the SINGLE
    # exchange: the re-sum stays co-partitioned and aggregate-sized
    assert nodes.count("HashAggregate") in (2, 4)
    assert nodes.count("Exchange") == 1
    assert not any("Join" in n or "Window" in n or "Python" in n
                   for n in nodes), nodes


def test_token_fertility_is_scan_plus_one_partial_agg(spark):
    spark.catalog.clearCache()  # avoid InMemoryTableScan rewrites
    nodes = _tree_nodes(_plan(spark, "token_fertility_stats"))
    assert nodes.count("HashAggregate") in (2, 4)  # see script_mix
    assert nodes.count("Exchange") == 1
    assert not any("Join" in n for n in nodes), nodes


def test_cross_source_matrix_has_no_cartesian_and_prunes_scans(spark):
    """cross_source_dup_matrix: the exact axis must be an aggregation
    (array fan-out), not a hashed-corpus self-join; the only joins are
    the LSH band equi-join and the two source lookups, and no
    cartesian/broadcast-NLJ anywhere. Every documents scan must read
    at most (doc_id, text, source)."""
    spark.catalog.clearCache()  # avoid InMemoryTableScan rewrites
    plan = _plan(spark, "cross_source_dup_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in [x for x in plan.splitlines() if "ReadSchema" in x]:
        assert ln.count(":") - 1 <= 3, ln


_SQL_KEYWORDS = {
    "WHERE", "ON", "JOIN", "GROUP", "ORDER", "USING", "LEFT", "RIGHT",
    "INNER", "FULL", "CROSS", "UNION", "WINDOW", "LIMIT", "AS", "AND",
    "OR", "HAVING", "QUALIFY",
}


def test_documents_oracles_all_carry_the_identity_gate():
    """Every oracle referencing the documents table must mirror the
    canonical load's NULL-doc_id exclusion (plans/_base._t) with an
    in-place predicate per reference — in the SQL text, not a
    mechanical subquery wrap (the wrap cost DuckDB its common-
    subexpression elimination on the tokenization expressions, 1.8×
    on the heavy dedup oracles).

    Anchored per reference (ADVICE r8): each ``FROM/JOIN documents
    [alias]`` occurrence must be followed within the same clause
    (200 chars) by an alias-matched ``[alias.]doc_id IS NOT NULL``
    predicate — a global substring count would let an unrelated
    gate elsewhere (e.g. a ``dr.doc_id IS NOT NULL`` CASE arm) mask
    a missing scan gate.  Today every gate sits ≤71 chars after its
    reference."""
    import re

    from gmall_flink_2021_spark.plans import ORACLES

    bad = []
    ref = re.compile(r"\b(?:FROM|JOIN)\s+documents\b"
                     r"(?:\s+(?:AS\s+)?([a-zA-Z_][a-zA-Z0-9_]*))?")
    for name, sql in ORACLES.items():
        for m in ref.finditer(sql):
            alias = m.group(1)
            if alias and alias.upper() in _SQL_KEYWORDS:
                alias = None
            a = re.escape(alias or "documents")
            window = sql[m.start():m.start() + 200]
            if not re.search(rf"\b(?:{a}\.)?doc_id IS NOT NULL", window):
                bad.append((name, alias, window[:90]))
    assert not bad, f"documents refs missing an adjacent gate: {bad}"


def test_embeddings_oracles_all_carry_the_ingest_gate():
    """Mirror of the documents invariant for the embeddings table
    (ADVICE r8): plans/similarity rewrites ``FROM embeddings`` into
    the valid-vector subquery mechanically, so an oracle written as
    ``from embeddings`` (case) or ``FROM embeddings e`` (alias
    inside the replaced literal is fine, but a future miss would
    not be) silently skips the gate.  Assert every embeddings scan
    in the final ORACLES dict is immediately the gated form — the
    inner scan ``FROM embeddings WHERE vec_id IS NOT NULL ...``."""
    import re

    from gmall_flink_2021_spark.plans import ORACLES

    bad = []
    for name, sql in ORACLES.items():
        for m in re.finditer(r"\b(?:from|join)\s+embeddings\b", sql,
                             re.IGNORECASE):
            tail = sql[m.end():m.end() + 60]
            if not re.match(r"\s+WHERE vec_id IS NOT NULL", tail):
                bad.append((name, sql[m.start():m.start() + 80]))
    assert not bad, f"embeddings refs missing the ingest gate: {bad}"
