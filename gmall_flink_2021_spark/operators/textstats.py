"""Text-analysis operators over the documents table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are the training-data-pipeline extensions (not in the
reference, which only has the keyword tokenizer —
gmall-realtime/.../app/udf/KeywordUDTF.java:11-24). Everything stays
JVM-side via higher-order array functions; results are deterministic
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import literal_frame
from ..functions.handles import CacheHandle
from ..functions.text import (
    STOPWORDS,
    token_fingerprint,
    token_windows,
    tokens,
    stopword_ratio,
)


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-source token statistics (token counting at corpus scale)."""
    tok = tokens("text")
    per_doc = documents.select(
        "source",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct"),
        F.col("n_chars"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("n_tokens").alias("token_ct"),
                 F.sum("n_distinct").alias("distinct_token_ct"),
                 F.sum("n_chars").alias("char_ct")))


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-document quality signals: length, type-token ratio,
    stopword ratio, mean token length — the standard cheap filters of
    a pretraining data pipeline."""
    tok = tokens("text")
    n = F.size(tok)
    sum_len = F.aggregate(
        F.transform(tok, lambda t: F.length(t)),
        F.lit(0).cast("long"), lambda a, v: a + v)
    return documents.select(
        "doc_id", "lang", "source",
        n.alias("n_tokens"),
        (F.size(F.array_distinct(tok)).cast("double")
         / F.greatest(n, F.lit(1)).cast("double")).alias("ttr"),
        stopword_ratio(tok).alias("stop_ratio"),
        (sum_len.cast("double")
         / F.greatest(n, F.lit(1)).cast("double")).alias("mean_tok_len"),
        (n >= 20).cast("int").alias("len_ok"),
    )


def lang_id(documents: DataFrame,
            threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language heuristic → confusion counts vs the
    labeled lang column.

    A real deployment swaps the scorer for per-language n-gram
    profiles; the Spark shape (pure column expressions, one
    aggregation) is identical.
    """
    tok = tokens("text")
    pred = F.when(stopword_ratio(tok) >= threshold, F.lit("en")) \
            .otherwise(F.lit("unknown"))
    return (documents
            .select(F.col("lang").alias("label_lang"),
                    pred.alias("pred_lang"))
            .groupBy("label_lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("ct")))


def corpus_filter(documents: DataFrame, min_tokens: int = 30,
                  max_stop_ratio: float = 0.2,
                  min_ttr: float = 0.3) -> DataFrame:
    """The composed quality-filter pipeline of a pretraining corpus:
    length + stopword-ratio + type-token-ratio thresholds in one scan;
    emits the surviving docs with their signals plus a reject reason
    breakdown for the dropped ones (kept/reason counts per source)."""
    tok = tokens("text")
    n = F.size(tok)
    ttr = (F.size(F.array_distinct(tok)).cast("double")
           / F.greatest(n, F.lit(1)).cast("double"))
    sr = stopword_ratio(tok)
    reason = (F.when(n < min_tokens, F.lit("too_short"))
               .when(sr > max_stop_ratio, F.lit("stopword_heavy"))
               .when(ttr < min_ttr, F.lit("repetitive"))
               .otherwise(F.lit("kept")))
    return (documents
            .select("source", reason.alias("status"))
            .groupBy("source", "status")
            .agg(F.count(F.lit(1)).alias("doc_ct")))


def train_val_split(documents: DataFrame) -> DataFrame:
    """Deterministic content-hash split: a document lands in 'val' when
    the first hex nibble of md5(doc_id) is 0 or 1 (≈12.5%), else
    'train' — the reproducible, engine-portable way to split corpora
    without a random() that can't be replayed. Counts per lang×split."""
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(nib.isin("0", "1"), F.lit("val")) \
             .otherwise(F.lit("train"))
    return (documents
            .select("lang", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("doc_ct")))


def fingerprints(documents: DataFrame) -> DataFrame:
    """Per-document fingerprints: md5 of the normalized text plus an
    order-sensitive rolling token hash (both engine-portable)."""
    tok = tokens("text")
    return documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", tok)).alias("md5_fp"),
        token_fingerprint(tok).alias("roll_fp"),
    )


def term_df_stats(documents: DataFrame, limit: int = 50) -> DataFrame:
    """Corpus vocabulary head: per-term document frequency and total
    term frequency, top-``limit`` by df (the df side of TF-IDF; one
    explode + one aggregation, map-side combined)."""
    return (documents
            .select("doc_id", F.explode(tokens("text")).alias("term"))
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"),
                 F.count(F.lit(1)).alias("tf"))
            .orderBy(F.desc("df"), F.desc("tf"), F.asc("term"))
            .limit(limit))


def stratified_sample(documents: DataFrame) -> DataFrame:
    """Deterministic stratified sampling audit: per-source keep
    decisions from the doc_id content hash (sources src0-src9 at 50%,
    src10-src19 at 12.5%), counted in ONE pass via conditional
    aggregation — no second scan for the denominators. Hash-based
    keep decisions replay identically across engines and runs, unlike
    random() sampling."""
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    # nullif: a digit-less source extracts '' which ANSI CAST rejects;
    # NULL falls through to the conservative 12.5% branch (both engines)
    grp = F.nullif(F.regexp_extract("source", r"(\d+)", 1),
                   F.lit("")).cast("int")
    keep = (F.when(grp < 10, nib.isin(*"01234567"))
            .otherwise(nib.isin("0", "1")))
    return (documents
            .select("source", keep.cast("long").alias("keep"))
            .groupBy("source")
            .agg(F.sum("keep").alias("sampled_ct"),
                 F.count(F.lit(1)).alias("doc_ct")))


def doc_length_percentiles(documents: DataFrame) -> DataFrame:
    """Per-language document-length profile: exact interpolated
    p50/p90/p99 of n_chars (sort-based, deterministic; rounded to
    6 dp so the interpolation arithmetic is engine-portable)."""
    return (documents
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 *[F.round(F.expr(f"percentile(n_chars, {q})"), 6)
                   .alias(f"p{int(q * 100)}")
                   for q in (0.5, 0.9, 0.99)]))


def doc_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by in-document frequency (stopwords
    excluded) — the TF side of TF-IDF with a fully integer ranking
    (tf desc, then term), so no engine-dependent float scoring."""
    from pyspark.sql import Window

    tf = (documents
          .select("doc_id", F.explode(tokens("text")).alias("term"))
          .filter(~F.col("term").isin(*STOPWORDS))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return (tf.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf"))


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single punctuation — the GPT-2-style pre-tokenization shape,
    simplified to a dialect both regex engines treat identically)
    alongside the ENGINE tokenizer's count, per source.

    ``engine_token_ct`` counts ENGINE tokens (== whitespace tokens on
    non-Han text, Han bigrams otherwise; named ``ws_token_ct`` until
    round 7). The true whitespace baseline lives in
    ``token_fertility_stats.ws_token_ct``."""
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    ws = tokens("text")
    per_doc = documents.select(
        "source",
        F.size(bpe).alias("n_bpe"),
        F.size(ws).alias("n_ws"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("n_bpe").alias("bpe_token_ct"),
                 F.sum("n_ws").alias("engine_token_ct")))


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    tokens taken by the single most frequent token, and the fraction
    of duplicate word 2-grams (Rae et al. 2021's repetition filters,
    count-based variant). High values mark boilerplate / degenerate
    text a pretraining pipeline drops.

    One explode + two-level aggregation for the top-token side (both
    map-side combined), pure array ops for the 2-gram side — no
    Python, one shuffle keyed by doc_id.
    """
    from ..functions.text import shingles

    top = (documents
           .select("doc_id", F.explode(tokens("text")).alias("t"))
           .groupBy("doc_id", "t")
           .agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.max("c").alias("top_token_ct")))
    tok = tokens("text")
    g2 = shingles(tok, 2)
    grams = documents.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(g2).alias("n_2grams"),
        F.size(F.array_distinct(g2)).alias("distinct_2grams"))
    return (grams.join(top, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.coalesce("top_token_ct", F.lit(0)).alias("top_token_ct"),
                F.when(F.col("n_tokens") > 0,
                       F.coalesce("top_token_ct", F.lit(0)).cast("double")
                       / F.col("n_tokens").cast("double"))
                .otherwise(F.lit(0.0)).alias("top_token_frac"),
                "n_2grams",
                F.when(F.col("n_2grams") > 0,
                       1.0 - F.col("distinct_2grams").cast("double")
                       / F.col("n_2grams").cast("double"))
                .otherwise(F.lit(0.0)).alias("dup_2gram_frac")))


def tfidf_search(documents: DataFrame,
                 query_terms: tuple[str, ...] = ("spark", "join", "window"),
                 k: int = 10) -> DataFrame:
    """TF-IDF ranked search for a fixed term set: score(d) = Σ_t
    tf(t,d) · ln(N/df(t)), summed in fixed term order so the double
    arithmetic is reproducible. Ranking, filtering and the top-k
    cutoff all operate on the INTEGER-scaled score
    round(score·10⁶)::long — an exact total order, so an ulp
    difference in the engines' ln can at most flip the last scaled
    digit, never the comparison semantics of equal integers; the
    output `score` is derived back as score_i/10⁶ (one identical
    IEEE division on both engines). Top-k with doc_id tie-break.

    Spark-first shape: per-doc tf terms are array filters (no
    explode), the three df counts are ONE corpus aggregation
    broadcast back via a 1-row cross join — the whole query is two
    narrow scans and a TakeOrderedAndProject, no wide shuffle.
    """
    tok = tokens("text")

    def _eq(term: str):
        # NB: a `lambda t, term=term:` default-arg closure would look
        # 2-ary to F.filter, which then passes the element INDEX as the
        # second argument
        return lambda t: t == F.lit(term)

    tfs = documents.select(
        "doc_id", F.size(tok).alias("n_tokens"),
        *[F.size(F.filter(tok, _eq(term))).alias(f"tf_{i}")
          for i, term in enumerate(query_terms)])
    idf_row = tfs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(query_terms))])
    scored = tfs.crossJoin(F.broadcast(idf_row))
    score = None
    for i in range(len(query_terms)):
        part = F.when(
            F.col(f"df_{i}") > 0,
            F.col(f"tf_{i}").cast("double")
            * F.log(F.col("n_docs").cast("double")
                    / F.col(f"df_{i}").cast("double"))).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    score_i = F.round(score * F.lit(1_000_000.0)).cast("long")
    return (scored
            .select("doc_id", score_i.alias("score_i"))
            .filter(F.col("score_i") > 0)
            .orderBy(F.desc("score_i"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id",
                    (F.col("score_i").cast("double") / 1_000_000.0)
                    .alias("score")))


def benchmark_shingle_index(documents: DataFrame,
                            benchmark_mod: int = 100) -> DataFrame:
    """The static side of decontamination: the distinct 64-bit shingle
    hashes of the held-out benchmark set (doc_id % ``benchmark_mod``
    == 0, the deterministic stand-in for an eval suite). Built once;
    at 100 TB it is tiny relative to the corpus — AQE broadcasts it
    into every scoring join, batch or per-micro-batch."""
    from ..functions.text import shingles

    sh = F.array_distinct(shingles(tokens("text")))
    return (documents
            .filter(F.col("doc_id") % benchmark_mod == 0)
            .select(F.explode(sh).alias("s"))
            .select(F.xxhash64("s").alias("shingle"))
            .distinct())


def contamination_against(corpus_docs: DataFrame,
                          bench_sh: DataFrame) -> DataFrame:
    """Score a corpus (any subset — a batch table or one micro-batch;
    each document's score depends only on itself and the static
    index) against a prebuilt benchmark shingle index.

    ONE corpus scan: n_sh rides along the exploded rows, the index is
    LEFT-joined (broadcast-sized, so no shuffle for the join), and a
    single doc_id aggregation recovers both the size and the hit
    count — clean documents keep their rows (hit = 0), so "checked,
    clean" stays distinguishable from "absent" without a second scan
    and sizes join (the previous shape scanned the corpus twice)."""
    from ..functions.text import shingles

    sh = F.array_distinct(shingles(tokens("text")))
    expl = (corpus_docs
            .select("doc_id", sh.alias("sh"))
            .filter(F.size("sh") > 0)
            .select("doc_id", F.size("sh").alias("n_sh"),
                    F.explode("sh").alias("s"))
            .select("doc_id", "n_sh", F.xxhash64("s").alias("shingle")))
    marked = expl.join(
        bench_sh.withColumn("hit", F.lit(1)), "shingle", "left")
    return (marked.groupBy("doc_id")
            .agg(F.first("n_sh").alias("n_sh"),
                 F.sum(F.coalesce("hit", F.lit(0)))
                 .alias("contaminated_sh"))
            .select("doc_id", "n_sh", "contaminated_sh",
                    (F.col("contaminated_sh").cast("double")
                     / F.col("n_sh").cast("double"))
                    .alias("contaminated_frac")))


def contamination_check(documents: DataFrame,
                        benchmark_mod: int = 100) -> DataFrame:
    """Benchmark decontamination: for every corpus document, the
    fraction of its distinct word 3-grams that also appear in a
    held-out benchmark set. Pretraining pipelines drop or flag
    high-overlap docs before training.

    Spark-first shape: both sides explode to (doc, shingle-hash) and
    meet in ONE equi-join on the 64-bit shingle key (an inverted
    index, never doc×doc pairs); overlap counts aggregate map-side.
    Streaming form: the same ``contamination_against`` scoring runs
    per micro-batch against the static index
    (streaming/jobs.contamination_stream) — per-doc scores are
    independent, so streaming == batch row-for-row.
    """
    corpus = documents.filter(F.col("doc_id") % benchmark_mod != 0)
    return contamination_against(
        corpus, benchmark_shingle_index(documents, benchmark_mod))


def domain_quota_sample(documents: DataFrame, quota: int = 10) -> DataFrame:
    """Per-domain quota sampling: keep at most ``quota`` documents per
    source, preferring longer documents (n_chars desc, doc_id
    tie-break) — the dataset-mixing primitive that stops one domain
    from swamping the blend. Integer-only ranking, one shuffle keyed
    by source."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return (documents
            .select("source", "doc_id", "n_chars")
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= quota))


def sequence_packing(documents: DataFrame,
                     seq_tokens: int = 2048) -> DataFrame:
    """Greedy sequence packing audit: documents are laid out in
    doc_id order within each source and cut into fixed-size training
    sequences of ``seq_tokens`` tokens; a document belongs to the
    chunk containing its start offset. Emits per (source, chunk):
    document count, token sum, and fill ratio.

    The prefix sum is a window over (source ORDER BY doc_id) — range
    partitioning keeps it parallel per source at corpus scale (a
    single global ordering would serialize; packing per shard is what
    real pipelines do)."""
    from pyspark.sql import Window

    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = documents.select(
        "source", "doc_id", F.size(tokens("text")).alias("n_tokens"))
    placed = toks.withColumn(
        "chunk_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens"))
         / F.lit(seq_tokens)).cast("long"))
    return (placed.groupBy("source", "chunk_id")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("n_tokens").alias("token_ct"))
            .withColumn("fill_ratio",
                        F.least(F.col("token_ct").cast("double")
                                / F.lit(float(seq_tokens)), F.lit(1.0))))


def pii_redaction(documents: DataFrame) -> DataFrame:
    """PII detection/redaction audit: count and strip emails, IPv4
    addresses, and phone-like digit runs per source — the scrubbing
    pass every training corpus gets before tokenization.

    The synthetic testdata contains no PII, so the query PLANTS
    deterministic PII by doc_id residue (email / IP / phone for
    residues 0/1/2 mod 5; identically in the oracle) — the regex
    match + replace path is therefore genuinely exercised with
    nonzero counts, and ``redacted_chars`` pins the regexp_replace
    semantics, not just the match counts. Patterns are restricted to
    the common subset of Java regex (Spark) and RE2 (DuckDB):
    character classes, bounded repetition, no lookaround.

    Plan shape: pure scan projection (regexp_extract_all / chained
    regexp_replace inside whole-stage codegen) + one map-side-combined
    aggregation keyed by source; no joins, no Python. At 100 TB the
    scan is embarrassingly parallel.
    """
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(did % 5 == 0,
               F.concat(F.lit(" contact user"), did.cast("string"),
                        F.lit("@mail.example.com now")))
         .when(did % 5 == 1,
               F.concat(F.lit(" host 10."), (did % 200).cast("string"),
                        F.lit(".0."), (did % 250).cast("string"),
                        F.lit(" up")))
         .when(did % 5 == 2,
               F.concat(F.lit(" call +1 555 0"), (did % 100).cast("string"),
                        F.lit(" 42 now")))
         .otherwise(F.lit("")))
    # Staged projections, one per redaction pass: each tN alias is
    # consumed twice (the next replace + its match count), so
    # CollapseProject keeps the stages separate and Catalyst cannot
    # re-inline the planted CASE / earlier regexes into every later
    # expression (the SCALE.md aliasing hazard — plan-pinned).
    staged = documents.select("source", planted.alias("t0"))
    prev = "t0"
    for i, (pat, tag) in enumerate(
            ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
             (PII_PHONE, "<PHONE>")), start=1):
        staged = staged.select(
            "*", F.regexp_replace(F.col(prev), pat, tag).alias(f"t{i}"))
        prev = f"t{i}"
    count = [
        F.size(F.regexp_extract_all(f"t{i}", F.lit(pat), 0))
         .cast("long").alias(f"{name}_ct")
        for i, (name, pat) in enumerate(
            (("email", PII_EMAIL), ("ip", PII_IPV4),
             ("phone", PII_PHONE)))]
    per_doc = staged.select("source", *count,
                            F.length("t3").alias("red_len"),
                            F.length("t0").alias("raw_len"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("email_ct").alias("email_ct"),
                 F.sum("ip_ct").alias("ip_ct"),
                 F.sum("phone_ct").alias("phone_ct"),
                 F.sum(F.col("raw_len") - F.col("red_len"))
                  .alias("redacted_chars")))


# Regex dialect note: each pattern parses identically under Java
# regex and RE2 (no lookaround/backrefs), so Spark and DuckDB agree
# match-for-match.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE = r"\+[0-9][0-9 ]{6,}[0-9]"


def doc_chunks(documents: DataFrame, chunk_tokens: int = 16,
               stride: int = 12) -> DataFrame:
    """Overlapping training-window chunking: cut every document into
    ``chunk_tokens``-token windows every ``stride`` tokens (the
    context-window materialization step of a pretraining pipeline;
    overlap = chunk_tokens - stride).

    Plan shape: sequence() of chunk starts + posexplode + slice — a
    lateral fan-out computed entirely in the scan projection with ZERO
    shuffles; output rows ≈ n_tokens/stride per doc. At 100 TB each
    executor chunks its own partitions independently.
    """
    return token_windows(documents, chunk_tokens, stride).select(
        "doc_id",
        F.col("idx").alias("chunk_idx"),
        F.size("win").cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", "win")).alias("chunk_fp"))


def doc_length_percentiles_approx(documents: DataFrame,
                                  accuracy: int = 10_000) -> DataFrame:
    """The 100 TB form of doc_length_percentiles: percentile_approx
    (Greenwald-Khanna sketch, rank error ≤ 1/accuracy) instead of the
    exact sort-based percentile — mergeable partial sketches, no
    global sort. Not oracle-expressible (sketch internals); the
    accuracy gate in tests/test_sketch_accuracy.py bounds each
    estimate against DuckDB's exact quantile instead."""
    pcts = F.percentile_approx("n_chars", [0.5, 0.9, 0.99], accuracy)
    return (documents
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("doc_ct"), pcts.alias("p"))
            .select("lang", "doc_ct",
                    F.col("p")[0].cast("double").alias("p50"),
                    F.col("p")[1].cast("double").alias("p90"),
                    F.col("p")[2].cast("double").alias("p99")))


def doc_length_percentile_audit(documents: DataFrame,
                                accuracy: int = 10_000,
                                band: float = 0.10) -> DataFrame:
    """Accuracy audit of the GK quantile sketch
    (doc_length_percentiles_approx): exact DISCRETE percentiles via
    the integer rank rule the repo standardizes on (value at
    1-indexed rank ``(p·n + 99) DIV 100`` of the per-lang sorted
    lengths — winsorized_price_stats' discipline, bit-exact on both
    engines), joined onto the sketch estimates, emitting exact values
    + in-engine within-band verdicts. Band is VALUE-relative (10%):
    the sketch guarantees RANK error ≤ 1/accuracy, which any
    non-degenerate length distribution maps well inside a 10% value
    band. The per-lang window sort is the audit's certification cost;
    the serving path stays sketch-only.

    Round 9 (registry consolidation): this audit also carries the
    exact INTERPOLATED per-lang profile (``doc_length_percentiles``,
    6-dp-rounded ``percentile()``) as ``p{50,90,99}_interp`` — the
    two former registry entries shared the per-lang length substrate,
    so one graded query now certifies the sketch, the discrete-rank
    exact values, and the interpolated profile together."""
    from pyspark.sql import Window

    est = doc_length_percentiles_approx(documents, accuracy)
    # lang_i: est and interp share the documents lineage, so the
    # join key needs a distinct name to resolve unambiguously
    interp = doc_length_percentiles(documents).select(
        F.col("lang").alias("lang_i"),
        *[F.col(f"p{p}").alias(f"p{p}_interp") for p in (50, 90, 99)])
    # the exact reference measures the SKETCH'S population — non-NULL
    # lengths only (percentile_approx skips NULLs; a NULL-as-0
    # coalesce here audited the sketch against a different
    # distribution and failed honest estimates — seeded-fuzz find,
    # round 9). doc_ct stays the TOTAL group size from the estimate
    # frame.
    w = Window.partitionBy("lang").orderBy("v")
    ranked = (documents
              .filter(F.col("n_chars").isNotNull())
              .select("lang", F.col("n_chars").alias("v"))
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("lang"))))
    exact = ranked.groupBy("lang").agg(*[
        F.max(F.when(F.col("rn") == F.expr(f"({p} * n + 99) DIV 100"),
                     F.col("v"))).cast("long").alias(f"p{p}_exact")
        for p in (50, 90, 99)])
    sel = [est["lang"].alias("lang"), F.col("doc_ct")]
    for p in (50, 90, 99):
        # an all-NULL-length group has NULL exact AND NULL estimate:
        # vacuously in band (the oracle emits the constant 1)
        ok = F.when(F.col(f"p{p}_exact").isNull(),
                    F.col(f"p{p}").isNull()).otherwise(
            F.abs(F.col(f"p{p}") - F.col(f"p{p}_exact"))
            <= band * F.col(f"p{p}_exact"))
        sel += [F.col(f"p{p}_exact"),
                ok.cast("long").alias(f"p{p}_in_band"),
                F.col(f"p{p}_interp")]
    # null-safe LEFT joins: a NULL lang group must survive (oracle
    # GROUP BY semantics), and a group with zero measured lengths
    # keeps its doc_ct row with NULL percentiles
    return (est.join(exact, est["lang"].eqNullSafe(exact["lang"]),
                     "left")
            .join(interp, est["lang"].eqNullSafe(interp["lang_i"]),
                  "left")
            .select(*sel))


def mixture_plan(documents: DataFrame,
                 budget_tokens: int = 1_000_000) -> DataFrame:
    """Temperature-based data-mixture planning (T=2, i.e. weight
    proportional to sqrt(source size) — the multilingual/multi-source
    rebalancing rule of XLM-R/mT5-style pretraining): given per-source
    token counts and a total training-token budget, allocate the
    budget across sources and report the implied epochs per source.
    Up-weights small sources, caps dominant ones.

    Every output is INTEGER (floor(sqrt) on a correctly-rounded IEEE
    sqrt, then integer DIV) so the plan is bit-identical across
    engines — no float accumulation order anywhere.

    Scale shape: one map-side-combined aggregation over the corpus
    (the only pass that touches data), then arithmetic on a
    #sources-row frame with a broadcast 1-row total. At 100 TB the
    planning overhead is the corpus scan, nothing else.
    """
    per_src = (documents
               .select("source", F.size(tokens("text")).alias("n_tokens"))
               .groupBy("source")
               .agg(F.sum("n_tokens").alias("token_ct")))
    weighted = per_src.withColumn(
        "weight", F.floor(F.sqrt(F.col("token_ct").cast("double"))))
    tot = weighted.agg(F.sum("weight").alias("wtot"))
    return (weighted.crossJoin(F.broadcast(tot))
            .select(
                "source", "token_ct", "weight",
                # divisors clamped to >=1: a source of only empty docs
                # (token_ct=0) or an all-empty corpus (wtot=0) throws
                # DIVIDE_BY_ZERO under ANSI otherwise
                F.expr("weight * 1000 DIV greatest(wtot, 1)")
                 .alias("share_permille"),
                F.expr(f"{budget_tokens}L * weight DIV greatest(wtot, 1)")
                 .alias("alloc_tokens"),
                F.expr(f"({budget_tokens}L * weight DIV greatest(wtot, 1))"
                       " * 1000 DIV greatest(token_ct, 1)")
                 .alias("epochs_permille")))


def quality_weighted_sample(documents: DataFrame) -> DataFrame:
    """Deterministic quality-WEIGHTED sampling: each document is kept
    with probability proportional to a quality signal (here distinct-
    token richness), not a fixed rate — the soft quality-pruning rule
    of DCLM/FineWeb-style pipelines, where borderline documents are
    down-sampled rather than hard-dropped (`corpus_filter` is the
    hard-threshold form).

    The coin flip is a pure function of doc_id: the first two md5 hex
    chars decoded to an integer u in [0, 256) via ascii arithmetic
    (portable to any engine with md5 + ascii — no hex-to-int builtin
    needed), kept iff u < keep_p256 = min(256, 32 + n_distinct).
    Deterministic => replayable and shard-local at any scale; the
    plan is a pure scan projection + filter, zero shuffles.
    """
    def nib(i: int) -> F.Column:
        a = F.ascii(F.substring(
            F.md5(F.col("doc_id").cast("string")), i, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    tok = tokens("text")
    n_distinct = F.size(F.array_distinct(tok))
    keep = F.least(F.lit(256), F.lit(32) + n_distinct)
    return (documents
            .select("doc_id", "source",
                    F.size(tok).cast("long").alias("n_tokens"),
                    keep.cast("long").alias("keep_p256"),
                    (nib(1) * 16 + nib(2)).alias("u"))
            .filter(F.col("u") < F.col("keep_p256"))
            .drop("u"))


def heavy_hitter_terms(documents: DataFrame,
                       phi_permille: int = 10,
                       counters: int = 512) -> DataFrame:
    """EXACT corpus heavy hitters — every term whose total frequency is
    at least ``phi_permille``/1000 of all tokens — without ever
    shuffling the full vocabulary.

    Two passes:
      1. Candidate generation: a per-partition Misra-Gries summary with
         ``counters`` counters (Arrow-batched ``mapInPandas``; each
         batch folds in via a vectorized value_counts, then the summary
         is pruned back to ``counters`` entries by subtracting the
         (k+1)-th largest count — the mergeable-summaries reduction,
         which preserves the MG error bound n_p/(k+1)). Any term with
         global share ≥ phi must, by averaging, hold share ≥ phi in at
         least one partition, so with counters ≥ 1000/phi_permille the
         union of partition summaries is a GUARANTEED superset of the
         true heavy hitters. Output: ≤ counters·partitions candidate
         rows — kilobytes, regardless of corpus size.
      2. Exact recount: broadcast the candidate set, semi-join the
         token stream against it, and count exactly; filter with the
         integer inequality cnt·1000 ≥ phi_permille·total. The final
         answer is exact (the MG pass only bounds what must be
         recounted), so the operator is oracle-checkable despite the
         sketch in the middle.

    Scale shape: two scans; shuffle volume is O(candidates), never
    O(vocabulary). The naive groupBy(term) ships every distinct term
    per partition through the shuffle — at web-corpus vocabulary sizes
    (10⁸+ terms, most of them singletons) that shuffle dwarfs the
    answer; here the singleton tail dies inside the MG summaries.
    """
    if counters * phi_permille < 1000:
        raise ValueError("need counters >= 1000/phi_permille for the "
                         "Misra-Gries superset guarantee")
    import pandas as pd

    toks = documents.select(F.explode(tokens("text")).alias("term"))

    def _mg(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["term"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            if len(counts) > counters:
                # mergeable-summaries prune: subtract the (k+1)-th
                # largest value, drop non-positive counters
                sub = sorted(counts.values(), reverse=True)[counters]
                counts = {t: c - sub for t, c in counts.items()
                          if c > sub}
        yield pd.DataFrame({"term": list(counts)})

    cands = toks.mapInPandas(_mg, "term string").distinct()
    total = (documents
             .agg(F.sum(F.size(tokens("text"))).alias("total_tokens")))
    return (toks.join(F.broadcast(cands), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * 1000 >= phi_permille
                    * F.col("total_tokens"))
            .select("term", "cnt",
                    F.expr("cnt * 1000 DIV total_tokens")
                    .alias("share_permille")))


def unigram_lm_scores(documents: DataFrame,
                      vocab_size: int = 65536,
                      high_micro: int = -3_450_000,
                      mid_micro: int = -3_550_000) -> DataFrame:
    """CCNet-style language-model quality scoring with a self-trained
    unigram LM: every document gets the summed log-probability of its
    tokens under the corpus unigram distribution (top-``vocab_size``
    terms; everything rarer scores at the 1/total floor), plus a
    low/mid/high quality band. Low average log-prob ⇒ rare-token soup
    (boilerplate, gibberish, wrong-language) — the classic
    perplexity-bucket filter, minus the external wiki LM this
    environment can't ship.

    Determinism: each vocab term's log-prob is fixed-point-rounded
    ONCE (round(ln(cnt/total)·10⁶)::long), then all per-document math
    is exact integer sums — no float accumulation order anywhere. The
    band thresholds compare sum_llr against n_tokens·threshold in
    integers. (Residual cross-engine risk: a term's ln() landing
    within an ulp of a 5e-7 rounding boundary — same documented,
    accepted risk as tfidf_search.)

    Scale shape: one token-count shuffle (map-side combined,
    vocab-sized result), a global top-V rank over the VOCAB (not the
    corpus), a broadcast of the V-row log-prob table, then a per-doc
    aggregation keyed by doc_id. At 100 TB the vocab table is the only
    globally-sorted object and it is bounded by V.
    """
    from pyspark.sql import Window

    toks = documents.select("doc_id", F.explode(tokens("text"))
                            .alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total_tokens"))
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    vocab = (counts
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= vocab_size)
             .crossJoin(F.broadcast(total))
             .select("term",
                     F.round(F.log(F.col("cnt")
                                   / F.col("total_tokens")) * 1e6)
                     .cast("long").alias("llr_micro")))
    floor = total.select(
        F.round(F.log(F.lit(1.0) / F.col("total_tokens")) * 1e6)
        .cast("long").alias("floor_micro"))
    scored = (toks
              .join(F.broadcast(vocab), "term", "left")
              .crossJoin(F.broadcast(floor))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum(F.coalesce("llr_micro", "floor_micro"))
                   .alias("sum_llr_micro")))
    # bands on avg nats (integer-only compare: sum vs n·threshold).
    # Absolute-nats cutoffs are a corpus-tuned parameter — a real run
    # calibrates them against the reference-LM score distribution
    # (CCNet buckets at the wiki-LM perplexity terciles); the defaults
    # split the synthetic corpus (avg llr ∈ [−3.70, −3.38] nats).
    band = (F.when(F.col("sum_llr_micro") >= high_micro
                   * F.col("n_tokens"), "high")
            .when(F.col("sum_llr_micro") >= mid_micro
                  * F.col("n_tokens"), "mid")
            .otherwise("low"))
    return scored.select("doc_id", "n_tokens", "sum_llr_micro",
                         band.alias("lm_band"))


# Positive shift applied before fixed-point averaging in
# perplexity_buckets: must exceed any possible |avg log-prob| in
# micro-nats. ln(1/total_tokens) at total=1e40 is only -92 nats, so
# 100 nats covers any corpus that fits in an int64 token count.
_PPL_SHIFT_MICRO = 100_000_000


def perplexity_buckets(documents: DataFrame,
                       n_buckets: int = 3) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    within each language, rank documents by average per-token
    log-probability under the self-trained unigram LM
    (``unigram_lm_scores``) and split them into equal tiers —
    head / middle / tail for the default 3 — the split CCNet uses to
    keep head+middle and drop (or down-sample) the tail when building
    pretraining corpora.

    Exactness discipline: the ranking key is the FLOOR of the average
    log-prob in micro-nats, computed with pure integer arithmetic —
    ``(sum_llr_micro + SHIFT·n_tokens) DIV n_tokens`` with a positive
    shift so the numerator is always positive and truncating division
    (Spark ``DIV``) equals flooring division (DuckDB ``//``) on every
    engine. Ties (same floored average) break on doc_id, so ranks and
    bucket labels are fully deterministic. Bucket assignment is the
    integer formula ``(n_buckets·(rank−1)) DIV n_lang`` — bucket sizes
    differ by at most one, no float percentile anywhere.

    Scale shape: the LM scoring costs one vocab-count shuffle + a
    broadcast of the V-row log-prob table + one per-doc aggregation
    (see unigram_lm_scores); the lang join is doc-keyed (dimension
    row per doc, AQE broadcasts the smaller side); the tier split is
    one per-language window sort — the intrinsic cost of EXACT
    per-language ranks, same trade as winsorized_price_stats. At
    100 TB swap the exact rank pass for percentile_approx cut points
    per language (mergeable GK sketch, no per-lang global sort) and
    assign buckets by comparing avg_llr_micro against the two cuts.

    Reference parity note: the reference (gmall-flink-2021) has no
    LM bucketing — this is a first-class LLM-data-pipeline operator
    (quality-tier selection before mixture sampling).
    """
    from pyspark.sql import Window

    scored = unigram_lm_scores(documents).select(
        "doc_id", "n_tokens", "sum_llr_micro")
    langd = scored.join(documents.select("doc_id", "lang"), "doc_id")
    key = F.expr(f"(sum_llr_micro + {_PPL_SHIFT_MICRO}L * n_tokens)"
                 " DIV n_tokens")
    w_ord = Window.partitionBy("lang").orderBy(
        F.desc("ppl_key"), F.asc("doc_id"))
    w_all = Window.partitionBy("lang")
    ranked = (langd
              .withColumn("ppl_key", key)
              .withColumn("ppl_rank",
                          F.row_number().over(w_ord).cast("long"))
              .withColumn("n_lang", F.count(F.lit(1)).over(w_all)))
    bucket_id = F.expr(f"({n_buckets} * (ppl_rank - 1)) DIV n_lang")
    name = (F.when(bucket_id == 0, "head")
            .when(bucket_id == n_buckets - 1, "tail")
            .otherwise("middle")) if n_buckets == 3 else \
        F.concat(F.lit("tier_"), bucket_id.cast("string"))
    return ranked.select(
        "doc_id", "lang", "n_tokens", "sum_llr_micro",
        (F.col("ppl_key") - F.lit(_PPL_SHIFT_MICRO)).cast("long")
        .alias("avg_llr_micro"),
        "ppl_rank",
        name.alias("ppl_bucket"))


def bpe_merge_candidates(documents: DataFrame,
                         k: int = 20) -> DataFrame:
    """The first iteration of BPE tokenizer training, distributed:
    count every adjacent character pair weighted by word frequency and
    rank the top-``k`` merge candidates. The corpus is scanned once
    into a word-frequency table (vocab-sized, map-side combined);
    the pair fan-out then runs over the VOCAB, not the corpus — the
    standard trick that makes BPE training tractable at scale (merge
    statistics depend only on (word, count), so 100 TB of text
    collapses to a few million weighted words before any pair work).

    Integer-only ranking (weighted count desc, pair asc) — no float
    scoring to drift across engines.
    """
    from pyspark.sql import Window

    words = (documents
             .select(F.explode(tokens("text")).alias("word"))
             .groupBy("word")
             .agg(F.count(F.lit(1)).alias("word_ct")))
    pairs = (words
             .filter(F.length("word") >= 2)
             .select("word_ct",
                     F.explode(F.expr(
                         "transform(sequence(1, length(word) - 1), "
                         "i -> substring(word, i, 2))")).alias("pair")))
    w = Window.orderBy(F.desc("merge_ct"), F.asc("pair"))
    return (pairs.groupBy("pair")
            .agg(F.sum("word_ct").alias("merge_ct"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("rank", "pair", "merge_ct"))


def training_shard_plan(documents: DataFrame,
                        n_shards: int = 16) -> DataFrame:
    """Final-layout planning: assign every document to one of
    ``n_shards`` output shards by CONTENT hash (stable under
    recompaction and re-ingestion order, unlike doc_id ranges) and
    audit the balance — per shard: doc count, token mass, and the
    deviation from the ideal token share in permille. The check a
    pipeline runs before materializing training shards: a skewed
    shard becomes the straggler of every epoch.

    Shard id decodes the first two md5 hex chars of the TEXT
    fingerprint via ascii arithmetic (same portable uniform as
    quality_weighted_sample) mod n_shards. Integer-only outputs.

    Scale shape: one scan + one map-side-combined aggregation keyed
    by shard — at 100 TB this is the same plan as any per-key count;
    the actual shard write would be `.repartition(n_shards, "shard")`
    with this audit as its pre-flight."""
    def nib(i: int) -> F.Column:
        a = F.ascii(F.substring(
            F.md5(F.coalesce(F.col("text"), F.lit(""))), i, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    tok = tokens("text")
    per_doc = documents.select(
        ((nib(1) * 16 + nib(2)) % n_shards).cast("long").alias("shard"),
        F.size(tok).alias("n_tokens"))
    shards = (per_doc.groupBy("shard")
              .agg(F.count(F.lit(1)).alias("doc_ct"),
                   F.sum("n_tokens").alias("token_ct")))
    tot = shards.agg(F.sum("token_ct").alias("ttot"))
    return (shards.crossJoin(F.broadcast(tot))
            .select("shard", "doc_ct", "token_ct",
                    (F.expr("token_ct * 1000 DIV greatest(ttot, 1)")
                     - 1000 // n_shards).alias("skew_permille")))


def funnel_gates(documents: DataFrame) -> DataFrame:
    """THE per-document gate projection of the cleaning pipeline —
    the single definition consumed by corpus_funnel (the report),
    corpus_survivors (the release), and streaming
    corpus_funnel_stream (the partials), so the three can never
    disagree on thresholds. Columns: doc_id, source, n_tokens,
    g_lang, g_len, g_quality."""
    tok = tokens("text")
    n = F.size(tok)
    sr = stopword_ratio(tok)
    # ANSI-safe: 0/0 throws under Spark 4's default; empty docs fail
    # every gate anyway, so the clamp cannot change a decision
    ttr = (F.size(F.array_distinct(tok)).cast("double")
           / F.greatest(n, F.lit(1)).cast("double"))
    return documents.select(
        "doc_id", "source", n.alias("n_tokens"),
        ((n > 0) & (sr >= 0.05)).alias("g_lang"),
        (n >= 30).alias("g_len"),
        ((n > 0) & (sr <= 0.2) & (ttr >= 0.3)).alias("g_quality"))


def funnel_counts(gated: DataFrame) -> DataFrame:
    """Per-source cumulative attrition aggregation over a
    funnel_gates frame joined with is_dup marks — shared by the batch
    funnel and the streaming partials."""
    c1 = F.col("g_lang")
    c2 = c1 & F.col("g_len")
    c3 = c2 & F.col("g_quality")
    c4 = c3 & (F.coalesce("is_dup", F.lit(0)) == 0)
    return (gated.groupBy("source")
            .agg(F.count(F.lit(1)).alias("total_ct"),
                 F.sum(c1.cast("long")).alias("lang_ct"),
                 F.sum(c2.cast("long")).alias("len_ct"),
                 F.sum(c3.cast("long")).alias("quality_ct"),
                 F.sum(c4.cast("long")).alias("unique_ct"),
                 F.sum(F.when(c4, F.col("n_tokens")).otherwise(0)
                       .cast("long")).alias("kept_tokens")))


def corpus_funnel(
        documents: DataFrame) -> tuple[DataFrame, CacheHandle]:
    """The attrition report every cleaning pipeline publishes: per
    source, how many documents survive each sequential gate of a
    C4-style pass — language heuristic → length floor → quality
    thresholds → MinHash dedup — plus the surviving token mass that
    actually reaches training.

    Gate semantics (cumulative — a doc counts at stage k only if it
    passed stages 1..k):
      lang_ct:    stopword-ratio language heuristic (lang_id's 'en')
      len_ct:     ≥ 30 tokens (corpus_filter's floor)
      quality_ct: stopword ratio ≤ 0.2 AND type-token ratio ≥ 0.3
      unique_ct:  not a MinHash-LSH duplicate of an earlier doc
                  (minhash_dedup_marks' first-seen-wins rule)
      kept_tokens: Σ n_tokens over full survivors

    Plan shape: ONE corpus scan computes every per-doc signal as
    column expressions; the only extra branch is the dedup-marks
    subtree (signature agg + bucket mins), joined back by doc_id; the
    funnel itself is a single conditional aggregation keyed by
    source. No per-stage re-scans — at 100 TB the funnel costs one
    pass over the text plus the dedup branch it would run anyway.
    """
    from .dedup import minhash_dedup_marks

    marks, mh = minhash_dedup_marks(documents)
    j = funnel_gates(documents).join(
        marks.select("doc_id", "is_dup"), "doc_id", "left")
    return funnel_counts(j), mh


def corpus_survivors(
        documents: DataFrame) -> tuple[DataFrame, CacheHandle]:
    """The documents that pass ALL of corpus_funnel's gates (lang →
    length → quality → MinHash dedup) — the materialization
    counterpart of the funnel report: funnel counts the attrition,
    this returns the rows that ship. Same gate expressions, same
    dedup branch; kept in one place so report and release can never
    disagree."""
    from .dedup import minhash_dedup_marks

    marks, mh = minhash_dedup_marks(documents)
    keep_ids = (funnel_gates(documents)
                .join(marks.select("doc_id", "is_dup"), "doc_id", "left")
                .filter(F.col("g_lang") & F.col("g_len")
                        & F.col("g_quality")
                        & (F.coalesce("is_dup", F.lit(0)) == 0))
                .select("doc_id"))
    return documents.join(keep_ids, "doc_id"), mh


def padding_waste_audit(documents: DataFrame, batch_size: int = 8
                        ) -> tuple[DataFrame, CacheHandle]:
    """Padding-efficiency audit for fixed-size training batches: every
    batch pads to its longest member, so waste = Σ(batch_max·B − Σlen).
    Compares ARRIVAL order (doc_id) against LENGTH-SORTED batching —
    the standard bucketing trick that collapses padding overhead —
    and reports per strategy: batches, payload tokens, padded slots,
    and integer waste permille. The measurement that justifies (or
    kills) adding a sort stage before the shard write.

    Scale shape: the global ordinal each strategy needs is built
    WITHOUT a single-partition window (the naive
    Window.orderBy(...).row_number() ships the whole corpus through
    one task): rows are bucketed by a DETERMINISTIC order-preserving
    function of the sort key itself (doc_id DIV width for arrival
    order; the exact token count for length order — never by sampled
    range bounds, whose resampling across actions was the round-4
    ordinal-collision bug class), row-numbered WITHIN each bucket
    (a hash-partitioned window), and shifted by the cumulative count
    of earlier buckets (a bounded driver-side prefix sum over
    |buckets| rows, broadcast back as a join). Then the fixed-size
    grouping via ordinal DIV B and a batch-max aggregation; output is
    2 rows. Ties break on doc_id (unique), so the total order — and
    batch composition — is deterministic and oracle-exact; because
    every step is recompute-stable, the single persisted frame (the
    token-count projection, shared by both strategies) is safe to
    release lazily. Skew note: the length-sorted bucket is the exact
    token count, so a corpus where most documents share ONE exact
    length would funnel that length's rows into one window task; the
    order-preserving composite bucket (n_tokens, doc_id DIV w) is the
    drop-in widening if a real corpus ever exhibits that.
    """
    from pyspark.sql import Window

    spark = documents.sparkSession
    toks = documents.select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")).persist()
    max_id = toks.agg(F.max("doc_id")).first()[0] or 0
    width = max(1, (max_id + 256) // 256)

    def waste(bucket: F.Column, order_cols: list, name: str) -> DataFrame:
        b = toks.withColumn("_b", bucket.cast("long"))
        w = Window.partitionBy("_b").orderBy(*order_cols)
        local = b.withColumn("_rn", F.row_number().over(w))
        counts = sorted(
            (r["_b"], r["c"]) for r in
            b.groupBy("_b").agg(F.count(F.lit(1)).alias("c"))
            .collect())
        offs, acc = [], 0
        for bb, c in counts:
            offs.append((bb, acc))
            acc += c
        off_df = literal_frame(spark, offs or [(0, 0)],
                               "_b long, _off long")
        batched = (local.join(F.broadcast(off_df), "_b")
                   .withColumn(
            "batch", F.floor((F.col("_rn") - 1 + F.col("_off"))
                             / F.lit(batch_size)).cast("long")))
        per_batch = (batched.groupBy("batch")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.max("n_tokens").alias("mx"),
                          F.sum("n_tokens").alias("payload")))
        return (per_batch
                .agg(F.count(F.lit(1)).alias("batches"),
                     F.sum("payload").alias("payload_tokens"),
                     F.sum(F.col("mx") * F.col("n") - F.col("payload"))
                     .alias("padded_slots"))
                .select(F.lit(name).alias("strategy"), "batches",
                        "payload_tokens", "padded_slots",
                        F.expr("padded_slots * 1000 DIV "
                               "greatest(payload_tokens + padded_slots, 1)")
                        .alias("waste_permille")))

    arrival = waste(F.expr(f"doc_id DIV {width}"),
                    [F.asc("doc_id")], "arrival_order")
    sorted_ = waste(F.col("n_tokens"),
                    [F.asc("n_tokens"), F.asc("doc_id")],
                    "length_sorted")
    out = arrival.unionByName(sorted_)
    # handle for the shared token-count projection (safe to unpersist
    # lazily: every ordinal input is recompute-stable)
    return out, CacheHandle(toks=toks)


def bigram_lm_scores(documents: DataFrame,
                     lam: float = 0.7,
                     backoff: float = 0.3) -> DataFrame:
    """Bigram language-model scoring with interpolated unigram backoff
    — the fidelity step past unigram_lm_scores (word-order-blind
    scoring passes 'the of and a' soup; transition probabilities do
    not): every document scores
    Σ ln(λ·P(w|prev) + (1−λ)·P(w)) over its token transitions.

    Determinism discipline (same as the unigram form): the
    interpolated probability of each DISTINCT bigram is computed once
    from exact integer counts by one identical float expression tree
    and fixed-point-rounded once (round(ln·10⁶)::long); per-document
    math is exact integer sums. Documents with < 2 tokens have no
    transitions and drop out (mirrored in the oracle). ``lam`` and
    ``backoff`` are SEPARATE literals (not lam and 1−lam): 1.0−0.7
    is 0.30000000000000004 in IEEE, and the oracle's literal 0.3
    must multiply bit-identically.

    Scale shape: transition extraction rides the scan (array
    zip/slice, no shuffle); the bigram table is one map-side-combined
    count shuffle bounded by DISTINCT OBSERVED bigrams (sparse, not
    |V|²); scoring joins transitions to the table on the bigram key —
    broadcast while the table fits, hash join at corpus scale — then
    one per-doc aggregation."""
    tok = tokens("text")
    k = F.greatest(F.size(tok) - 1, F.lit(0))
    prevs = F.slice(tok, 1, k)
    nexts = F.slice(tok, 2, k)
    trans = (documents
             .select("doc_id",
                     F.explode(F.zip_with(
                         prevs, nexts,
                         lambda p, n: F.concat(p, F.lit(" "), n)))
                     .alias("bigram")))
    toks = documents.select(F.explode(tok).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cu"))
    total = uni.agg(F.sum("cu").alias("total_tokens"))
    bi = (trans.groupBy("bigram")
          .agg(F.count(F.lit(1)).alias("c2"))
          .withColumn("prev", F.split("bigram", " ").getItem(0))
          .withColumn("nxt", F.split("bigram", " ").getItem(1)))
    scored_bi = (bi
                 .join(uni.select(F.col("term").alias("prev"),
                                  F.col("cu").alias("c_prev")), "prev")
                 .join(uni.select(F.col("term").alias("nxt"),
                                  F.col("cu").alias("c_next")), "nxt")
                 .crossJoin(F.broadcast(total))
                 .select("bigram",
                         F.round(F.log(
                             F.lit(lam) * F.col("c2")
                             / F.col("c_prev")
                             + F.lit(backoff) * F.col("c_next")
                             / F.col("total_tokens")) * 1e6)
                         .cast("long").alias("llr_micro")))
    return (trans
            .join(scored_bi, "bigram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_transitions"),
                 F.sum("llr_micro").alias("sum_llr_micro")))


def langid_trigram_confusion(
        documents: DataFrame) -> tuple[DataFrame, CacheHandle]:
    """Character-trigram naive-Bayes language identification (the
    CLD/langid.py shape, replacing lang_id's stopword heuristic):
    per-language trigram profiles with add-one smoothing are trained
    from the labeled corpus, every document is scored
    argmax_lang Σ ln P(tri|lang), and the confusion matrix
    (label_lang, pred_lang, ct) is reported — the resubstitution
    audit of the classifier a pipeline would then run on unlabeled
    data.

    Pivot-free scoring that works for ANY language set (the driver
    regenerates the corpus, so no lang list is hardcoded):
    score(doc, lang) = Σ_matched llr(tri, lang)
                     + (n_tri(doc) − matched(doc, lang)) · floor(lang),
    where llr is the smoothed log-prob fixed-point-rounded ONCE per
    (lang, trigram) and floor(lang) the unseen-trigram log-prob — so
    per-doc math is exact integer sums and argmax ties break on lang.

    Scale shape: one (lang, trigram) profile shuffle (map-side
    combined, charset³-bounded), doc-trigram explode joined to the
    profile on trigram (profile broadcasts), one (doc, lang)
    aggregation, one per-doc argmax window, one confusion count."""
    from pyspark.sql import Window

    # greatest(...,1) + length filter, NOT greatest(...,0):
    # sequence(1, 0) counts DOWN in Spark ([1,0]), which would emit
    # bogus short "trigrams" for docs under 3 chars
    tris = F.expr(
        "filter(transform(sequence(1, greatest(length(coalesce(text, ''))"
        " - 2, 1)), i -> substring(coalesce(text, ''), i, 3)),"
        " t -> length(t) = 3)")
    # ONE trigram fan-out serves both corpus-sized derivations
    # (profile training and scoring) — PERSISTED, because the two
    # consumers are separate plan branches and would otherwise each
    # re-scan and re-explode the corpus (round 4: this query's cost
    # was 4 corpus fan-outs — profile, vocab, matched, n_tri; vocab
    # now comes from the charset³-bounded profile and n_tri is pure
    # length arithmetic on the scan). The single-fan-out guarantee
    # holds for library callers who keep the tri handle live across the
    # action; the registry wrapper unpersists it immediately (leak
    # convention), so that path pays 2 parallel fan-outs instead —
    # an explicit memory-over-CPU trade, not an accident.
    # the corpus file may arrive as a single split (tiny row-group
    # layouts); the ~700x trigram fan-out below must not inherit that
    # 1-task layout — spread() moves only the raw docs
    from ..functions import spread
    doc_tri = (spread(documents)
               .select("doc_id", F.col("lang").alias("label_lang"),
                       F.explode(tris).alias("tri"))
               .persist())
    profile = (doc_tri
               .groupBy(F.col("label_lang").alias("lang_p"), "tri")
               .agg(F.count(F.lit(1)).alias("c")))
    v = profile.agg(F.countDistinct("tri").alias("v"))
    lang_tot = (profile.groupBy("lang_p")
                .agg(F.sum("c").alias("ct_lang"))
                .crossJoin(F.broadcast(v)))
    llr = (profile
           .join(F.broadcast(lang_tot), "lang_p")
           .select("lang_p", "tri",
                   F.round(F.log((F.col("c") + 1).cast("double")
                                 / (F.col("ct_lang") + F.col("v")))
                           * 1e6).cast("long").alias("llr_micro")))
    floors = lang_tot.select(
        "lang_p",
        F.round(F.log(F.lit(1.0)
                      / (F.col("ct_lang") + F.col("v"))) * 1e6)
        .cast("long").alias("floor_micro"))
    matched = (doc_tri
               .join(F.broadcast(llr), "tri")
               .groupBy("doc_id", "lang_p")
               .agg(F.count(F.lit(1)).alias("m"),
                    F.sum("llr_micro").alias("s")))
    # trigram count is pure length arithmetic — no fan-out needed
    # (docs under 3 chars have zero length-3 substrings), but docs
    # with n_tri = 0 must still be EXCLUDED exactly as the explode
    # form excluded them (explode of an empty array emits no row)
    n_tri = (documents
             .select("doc_id", F.col("lang").alias("label_lang"),
                     F.greatest(
                         F.length(F.coalesce(F.col("text"), F.lit("")))
                         - 2, F.lit(0)).cast("long").alias("n_tri"))
             .filter(F.col("n_tri") > 0))
    # the FULL doc × language grid, not just matched combinations: a
    # language sharing zero trigrams with a doc still has the score
    # n_tri·floor(lang), which (floors being least negative for
    # low-volume languages) can legitimately win the argmax — an
    # inner join would silently exclude it from the vote
    scored = (n_tri
              .crossJoin(F.broadcast(floors))
              .join(matched, ["doc_id", "lang_p"], "left")
              .select("doc_id", "label_lang", "lang_p",
                      (F.coalesce("s", F.lit(0))
                       + (F.col("n_tri")
                          - F.coalesce("m", F.lit(0)))
                       * F.col("floor_micro")).alias("score")))
    # per-doc argmax as a HASH aggregation, not a row_number window:
    # min(struct(-score, lang)) picks the highest score with ties to
    # the smallest lang — identical semantics, but partial aggregation
    # collapses the doc x lang grid map-side and no per-doc sort runs
    # (window form measured 5.1-6.2 s at sf0.1; this ~halves it)
    pred = (scored
            .groupBy("doc_id", "label_lang")
            .agg(F.min(F.struct((-F.col("score")).alias("ns"),
                                F.col("lang_p"))).alias("best")))
    out = (pred.groupBy(F.col("label_lang"),
                        F.col("best.lang_p").alias("pred_lang"))
           .agg(F.count(F.lit(1)).alias("ct")))
    # handle for the shared trigram fan-out (repo convention)
    return out, CacheHandle(tri=doc_tri)


CLASSIFIER_DIM = 4096  # 3 md5 nibbles: buckets 0..4095


def classifier_weights(spark, dim: int = CLASSIFIER_DIM,
                       salt: str = "w") -> DataFrame:
    """Weight table for ``hashed_classifier_scores``: one row per
    feature bucket with a fixed-point micro-unit weight. The weights
    here are a deterministic md5-derived STAND-IN (documented — this
    environment cannot ship a trained fastText model); a production
    deployment loads its trained vector into the same (bucket,
    w_micro) shape and everything downstream is unchanged. The
    derivation (4 md5 nibbles of "bucket|salt" − 32768 → ±32768 µ) is
    engine-portable, so the full scorer has an exact SQL oracle."""
    b = F.col("id").cast("string")
    h = F.md5(F.concat(b, F.lit("|" + salt)))

    def nib(i: int) -> F.Column:
        a = F.ascii(F.substring(h, i, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        (nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4) - 32768)
        .cast("long").alias("w_micro"))


def hashed_classifier_scores(documents: DataFrame,
                             weights: DataFrame | None = None,
                             dim: int = CLASSIFIER_DIM,
                             threshold_micro: int = 0) -> DataFrame:
    """Model-based quality filtering — the fastText-style hashed
    bag-of-words linear classifier every CCNet/RefinedWeb-shaped
    pipeline runs after the heuristic filters: each token hashes into
    one of ``dim`` feature buckets (first 3 md5 nibbles —
    engine-portable), the document's logit is the integer sum of the
    bucket weights over all token OCCURRENCES (bag, not set), and the
    keep/drop label compares the logit to a threshold. Complements
    the self-trained LM scorers (unigram_lm_scores/bigram_lm_scores):
    those score fluency under the corpus distribution, this applies
    an EXTERNAL learned decision boundary (here a documented
    md5-derived stand-in vector — see classifier_weights).

    Determinism: weights are fixed-point micro-units and the per-doc
    score is a pure integer sum — no float accumulation anywhere, so
    the whole scorer is bit-exact against the SQL oracle.

    Scale shape: ONE corpus pass — explode_outer keeps empty/null
    docs as a null-term row so no second scan or doc-spine join-back
    exists; the bucket is computed scan-side, the dim-row weight
    table joins by BROADCAST (dim is classifier-sized, ~10⁴–10⁶ rows
    — always broadcast territory; left join so the null-term row
    survives), and the per-doc logit is one map-side-combined sum.
    At 100 TB nothing shuffles except doc_id-keyed partial sums.
    Streaming form: scoring is per-doc stateless, so the
    contamination_stream pattern (static broadcast side + micro-batch
    scoring) applies verbatim."""
    spark = documents.sparkSession
    # the bucket derivation below is fixed at 3 md5 nibbles → domain
    # exactly [0, CLASSIFIER_DIM); a weight table over a different
    # domain would silently zero-score the out-of-range buckets via
    # the left join, so refuse a mismatched dim up front
    if dim != CLASSIFIER_DIM:
        raise ValueError(
            f"hashed_classifier_scores buckets are fixed at "
            f"{CLASSIFIER_DIM} (3 md5 nibbles); got dim={dim}. "
            "Provide a weights table covering [0, 4096) instead.")
    if weights is None:
        weights = classifier_weights(spark, dim)

    toks = (documents
            .select("doc_id", F.explode_outer(tokens("text"))
                    .alias("term"))
            .select("doc_id", "term",
                    F.when(F.col("term").isNotNull(),
                           _md5_bucket(F.col("term")))
                    .cast("long").alias("bucket")))
    scored = (toks.join(F.broadcast(weights), "bucket", "left")
              .groupBy("doc_id")
              .agg(F.sum(F.coalesce(F.col("w_micro"), F.lit(0)))
                   .alias("s"),
                   F.count("term").alias("n")))
    return scored.select(
        "doc_id", F.col("n").cast("long").alias("n_tokens"),
        F.col("s").cast("long").alias("logit_micro"),
        F.when(F.col("s") >= threshold_micro, F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("keep_label"))


BPE_N_MERGES = 10  # unrolled identically in the registry oracle SQL

_BPE_PAIRS = (
    # adjacent symbol pairs of a ';'-terminated symbol string
    # ("a;b;c;" -> ["a;b;", "b;c;"]); sequence(1, 0) counts DOWN in
    # Spark, so the under-2-symbols case must be guarded explicitly
    "case when size(split(sym, ';')) >= 3 then "
    "transform(sequence(1, size(split(sym, ';')) - 2), "
    "i -> concat(element_at(split(sym, ';'), i), ';', "
    "element_at(split(sym, ';'), i + 1), ';')) "
    "else array() end")


def bpe_learn(documents: DataFrame, n_merges: int = BPE_N_MERGES,
              collect_threshold: int = 200_000):
    """Iterative BPE tokenizer training, distributed — the full
    Sennrich et al. (2016) loop, not just the first-round candidate
    count (bpe_merge_candidates): collapse the corpus ONCE to a
    (word, count) vocabulary, then run ``n_merges`` rounds of
    [count adjacent symbol pairs weighted by word count -> pick the
    most frequent pair (count desc, pair asc — integer-exact ties) ->
    merge it everywhere in the vocab].

    Words are held as ';'-terminated symbol strings ("a;b;c;") so a
    merge is ONE literal ``replace`` ("a;b;" -> "ab;") — leftmost
    non-overlapping replacement is exactly BPE's greedy merge order,
    and the literal (non-regex) form is bit-identical in Spark and
    DuckDB, which keeps the whole trainer oracle-checkable. Words
    containing the separator are excluded from the vocabulary (and
    encode as atomic symbols downstream) — on a dirty corpus swap the
    separator for an unused control char.

    Scale shape: pair statistics run over the VOCABULARY (a few
    million weighted words at 100 TB), never the corpus. A vocabulary
    under ``collect_threshold`` rows is collected once and trained
    driver-side (the dup_clusters bounded-collect precedent — n_merges
    rounds over a few MB beat 2·n_merges scheduled Spark jobs by an
    order of magnitude); a larger vocabulary trains distributed: per
    round one map-side-combined pair aggregation + one 1-row argmax
    collect (the k-means-centroid precedent) + one literal replace,
    persisted per round so round t never recomputes rounds 1..t-1.
    Both paths compute byte-identical merges: Python ``str.replace``,
    Spark ``replace`` and DuckDB ``replace`` all substitute leftmost
    non-overlapping occurrences, and pair counts enumerate every
    adjacent position in both paths.

    Returns (merges, vocab, CacheHandle): merges as [(step, pair,
    merged, merge_ct)], vocab as the final (word, ct, sym) frame, and
    the handle holding the surviving persist (empty on the
    driver-trained path) — the CALLER must release it (lazily is
    fine: the recompute path is the deterministic literal-replace
    chain, no driver state).
    """
    words = (documents
             .select(F.explode(tokens("text")).alias("word"))
             .filter(~F.col("word").contains(";"))
             .groupBy("word")
             .agg(F.count(F.lit(1)).alias("ct")))
    base = words.select(
        "word", "ct",
        F.regexp_replace("word", "(.)", "$1;").alias("sym")).persist()
    n_vocab = base.count()
    merges: list[tuple[int, str, str, int]] = []
    if n_vocab <= collect_threshold:
        rows = [(r["word"], int(r["ct"]), r["sym"]) for r in base.collect()]
        base.unpersist()
        for step in range(1, n_merges + 1):
            counts: dict[str, int] = {}
            for _w, ct, sym in rows:
                arr = sym.split(";")  # trailing '' mirrors split/str_split
                for i in range(len(arr) - 2):
                    p = arr[i] + ";" + arr[i + 1] + ";"
                    counts[p] = counts.get(p, 0) + ct
            if not counts:
                break
            pair, merge_ct = min(counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
            merged = pair.replace(";", "") + ";"
            merges.append((step, pair, merged, merge_ct))
            rows = [(w, ct, sym.replace(pair, merged))
                    for w, ct, sym in rows]
        vocab = literal_frame(documents.sparkSession,
                              rows, "word string, ct long, sym string")
        return merges, vocab, CacheHandle()
    vocab = base
    for step in range(1, n_merges + 1):
        top = (vocab
               .select("ct", F.explode(F.expr(_BPE_PAIRS)).alias("pair"))
               .groupBy("pair")
               .agg(F.sum("ct").alias("merge_ct"))
               .orderBy(F.desc("merge_ct"), F.asc("pair"))
               .limit(1).collect())
        if not top:  # every word fully merged to one symbol
            break
        pair, merge_ct = top[0]["pair"], int(top[0]["merge_ct"])
        merged = pair.replace(";", "") + ";"
        merges.append((step, pair, merged, merge_ct))
        nxt = vocab.select(
            "word", "ct",
            F.replace("sym", F.lit(pair), F.lit(merged)).alias("sym")
        ).persist()
        nxt.count()  # materialize before dropping the previous round
        base.unpersist()
        base = vocab = nxt
    return merges, vocab, CacheHandle(learn=base)


def bpe_merges(documents: DataFrame,
               n_merges: int = BPE_N_MERGES,
               collect_threshold: int = 200_000) -> DataFrame:
    """The learned BPE merge table: (step, pair, merged, merge_ct)
    in training order — the artifact a tokenizer ships."""
    learned, _vocab, lh = bpe_learn(documents, n_merges,
                                    collect_threshold)
    lh.unpersist()  # only the merge list is needed
    spark = documents.sparkSession
    return literal_frame(
        spark, learned,
        "step long, pair string, merged string, merge_ct long")


def bpe_vocab_encoder(vocab: DataFrame) -> DataFrame:
    """(word, n_sym) encode table from a trained vocabulary's
    ';'-separated symbol strings — the single derivation every encode
    path (batch stats, merge replay, the serving stream) shares, so
    OOV/separator semantics cannot drift between them."""
    return vocab.select(
        "word",
        (F.size(F.split("sym", ";")) - 1).cast("long").alias("n_sym"))


def encode_with_vocab(documents: DataFrame, enc: DataFrame) -> DataFrame:
    """Per-doc (n_tokens, n_symbols) under a (word, n_sym) encode
    table: one token fan-out, one broadcast-hash join, one doc
    aggregation. Words absent from the table (separator-unsafe /
    OOV) count as 1 atomic symbol. Shared by bpe_encode_stats,
    bpe_apply_merges and streaming/jobs.bpe_encode_stream so the
    serving and batch paths are provably identical."""
    return (documents
            .select("doc_id", F.explode(tokens("text")).alias("word"))
            .join(F.broadcast(enc), "word", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.coalesce("n_sym", F.lit(1))).alias("n_symbols")))


def bpe_encode_stats(documents: DataFrame,
                     n_merges: int = BPE_N_MERGES,
                     collect_threshold: int = 200_000
                     ) -> tuple[DataFrame, CacheHandle]:
    """Corpus encoding under the learned BPE vocabulary: per document
    the whitespace token count and the BPE symbol count (the number a
    token-budgeted training run actually pays for). The corpus is
    NEVER re-segmented row by row: the final vocab maps word ->
    symbol count, the doc token fan-out joins that map broadcast, and
    one aggregation yields the per-doc totals — at 100 TB the encode
    is one scan + one broadcast-hash join, no Python. Words outside
    the vocabulary (separator-unsafe) count as 1 atomic symbol.

    Returns ``(df, CacheHandle)`` — the handle holds the vocab
    persist (empty on the driver-trained small path, whose vocab is a
    plain local-relation frame); unpersisted lazily by the registry
    wrapper; the recompute path is fully deterministic, no hidden
    driver state."""
    _, vocab, lh = bpe_learn(documents, n_merges, collect_threshold)
    return encode_with_vocab(documents, bpe_vocab_encoder(vocab)), lh


DSIR_DIM = 4096  # hashed feature buckets (3 md5 nibbles), like CLASSIFIER_DIM


def dsir_importance_weights(documents: DataFrame,
                            dim: int = DSIR_DIM) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023),
    the hashed-n-gram form: score every document by how much more
    likely its tokens are under a TARGET distribution than under the
    RAW corpus distribution — log p_target(doc) − log p_raw(doc) over
    hashed unigram buckets — so a pretraining pipeline can resample
    raw data toward a reference domain. The target here is the
    corpus' lexicographically-first source (data-derived, so the
    query is stable under driver corpus regeneration); a production
    run substitutes its reference corpus as the target flag.

    Exactness: both LMs are add-one-smoothed over the SAME fixed
    ``dim`` buckets; the per-bucket log-likelihood-ratio is
    fixed-point-rounded ONCE (micro-units), and each document's
    weight is the exact integer sum of its token occurrences'
    bucket llrs — bit-identical across engines.

    Scale shape: bucket stats are one map-side-combined conditional
    aggregation over the token fan-out (4096-row result, broadcast
    back); scoring is a second fan-out joined to the broadcast llr
    table + one per-doc sum. No shuffle exceeds O(dim) + one per-doc
    aggregation regardless of corpus size."""
    llr = dsir_llr_table(documents, dim)
    return dsir_score(documents, llr)


def _md5_bucket(col):
    """First-3-md5-nibbles hash bucket, domain [0, 4096) — the ONE
    derivation behind both CLASSIFIER_DIM (hashed_classifier_scores)
    and DSIR_DIM (dsir_importance_weights): the oracles of both
    queries mirror it nibble for nibble, so it must not fork."""
    h = F.md5(col)

    def nib(i: int):
        a = F.ascii(F.substring(h, i, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    return (nib(1) * 256 + nib(2) * 16 + nib(3)).cast("long")


def _dsir_feats(documents: DataFrame) -> DataFrame:
    target = documents.agg(F.min("source").alias("target_src"))
    return (documents
            .crossJoin(F.broadcast(target))
            .select("doc_id",
                    (F.col("source") == F.col("target_src"))
                    .alias("is_target"),
                    F.explode(tokens("text")).alias("tok"))
            .select("doc_id", "is_target",
                    _md5_bucket(F.col("tok")).alias("b")))


def dsir_llr_table(documents: DataFrame, dim: int = DSIR_DIM) -> DataFrame:
    """The DSIR model artifact: per bucket (all ``dim`` of them,
    observed or not) the fixed-point
    target/raw log-likelihood ratio. Built once from the reference
    corpus and broadcast into scoring (batch or streaming); a
    production serving deployment materializes all ``dim`` buckets
    (add-one smoothing defines an llr for unobserved ones) so
    never-seen tokens score the floor instead of dropping."""
    observed = (_dsir_feats(documents)
                .groupBy("b")
                .agg(F.sum(F.when(F.col("is_target"), 1).otherwise(0))
                     .alias("ct_t"),
                     F.count(F.lit(1)).alias("ct_r")))
    # materialize ALL dim buckets: add-one smoothing defines an llr
    # for unobserved ones (ct=0 → the floor), so scoring a corpus
    # that differs from the reference (the streaming serving path)
    # scores never-seen tokens at the floor instead of dropping them
    # from both the weight sum and n_tokens in dsir_score's join
    stats = (documents.sparkSession.range(dim)
             .select(F.col("id").alias("b"))
             .join(observed, "b", "left")
             .select("b",
                     F.coalesce("ct_t", F.lit(0)).alias("ct_t"),
                     F.coalesce("ct_r", F.lit(0)).alias("ct_r")))
    tot = stats.agg(F.sum("ct_t").alias("n_t"), F.sum("ct_r").alias("n_r"))
    return (stats.crossJoin(F.broadcast(tot))
            .select("b",
                    F.round((F.log((F.col("ct_t") + 1).cast("double")
                                   / (F.col("n_t") + F.lit(dim)))
                             - F.log((F.col("ct_r") + 1).cast("double")
                                     / (F.col("n_r") + F.lit(dim))))
                            * 1e6).cast("long").alias("llr_micro")))


def dsir_score(documents: DataFrame, llr: DataFrame) -> DataFrame:
    """Score documents against a prebuilt llr table: one token
    fan-out joined to the broadcast table + one per-doc sum. No
    target flag is needed at scoring time, so no per-(micro)batch
    min(source) aggregation runs here."""
    feats = (documents
             .select("doc_id", F.explode(tokens("text")).alias("tok"))
             .select("doc_id", _md5_bucket(F.col("tok")).alias("b")))
    return (feats
            .join(F.broadcast(llr), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("llr_micro").alias("dsir_weight_micro")))


def save_bpe_model(merges: list, path: str, spark) -> None:
    """Persist the learned BPE merge table — the artifact a tokenizer
    ships (the save_codebooks analog for the text side). Strings and
    int64 counts on disk: the roundtrip is exact, so an encoder built
    from the reloaded table is byte-identical to the trainer's."""
    (spark.createDataFrame(
        merges, "step long, pair string, merged string, merge_ct long")
     .coalesce(1).write.mode("overwrite").parquet(path))


def load_bpe_model(path: str, spark) -> list:
    """Inverse of save_bpe_model (training order restored)."""
    return [(int(r["step"]), r["pair"], r["merged"], int(r["merge_ct"]))
            for r in spark.read.parquet(path).orderBy("step").collect()]


def bpe_apply_merges(documents: DataFrame, merges: list) -> DataFrame:
    """Encode a corpus under a RELOADED merge table without
    retraining: rebuild each distinct word's symbol string by
    replaying the merges in training order over the corpus
    vocabulary (vocab-sized work, chained literal replaces in one
    projection), then the same broadcast-join encode as
    bpe_encode_stats. Byte-identical to encoding with the trainer's
    own vocabulary (pinned by test)."""
    vocab = (documents
             .select(F.explode(tokens("text")).alias("word"))
             .filter(~F.col("word").contains(";"))
             .distinct())
    sym = F.regexp_replace("word", "(.)", "$1;")
    for _step, pair, merged, _ct in merges:
        sym = F.replace(sym, F.lit(pair), F.lit(merged))
    enc = bpe_vocab_encoder(vocab.select("word", sym.alias("sym")))
    return encode_with_vocab(documents, enc)


def script_mix_stats(documents: DataFrame) -> DataFrame:
    """Per-source script composition: how much of each source's text
    is Han ideographs vs ASCII letters vs digits vs whitespace vs
    everything else — the first profile a multilingual pretraining
    pipeline runs (it decides which tokenizer/filters each slice
    needs, and catches mislabeled-language slices outright).

    Integer-exact: per-class char counts are length(text) minus the
    length after deleting that class (one regexp_replace per class,
    all portable to the DuckDB oracle), permilles are truncating
    integer DIV over the summed totals.

    Scale shape: pure per-row column expressions folded into the scan
    + one map-side-combined groupBy(source) — no shuffle beyond the
    |sources|-row aggregate, no UDF. Split as partials → readout so
    the streaming form (jobs.script_mix_stream) appends the identical
    counter partials per micro-batch.
    """
    return script_mix_readout(script_mix_partials(documents))


def script_mix_partials(documents: DataFrame) -> DataFrame:
    """Additive per-source counter partials of script_mix_stats — the
    micro-batch emission of streaming/jobs.script_mix_stream: every
    column is a sum/count, so partials from any corpus split
    re-aggregate (script_mix_readout) to exactly the single-pass
    report."""
    from ..functions.text import HAN_ANY

    t = F.coalesce(F.col("text"), F.lit(""))
    total = F.length(t)

    def class_ct(pattern: str) -> F.Column:
        return total - F.length(F.regexp_replace(t, pattern, ""))

    per_doc = documents.select(
        "source",
        total.alias("n"),
        class_ct(HAN_ANY).alias("han"),
        class_ct("[A-Za-z]").alias("latin"),
        class_ct("[0-9]").alias("digit"),
        class_ct(" ").alias("space"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("n").alias("char_ct"),
                 F.sum("han").alias("han_ct"),
                 F.sum("latin").alias("latin_ct"),
                 F.sum("digit").alias("digit_ct"),
                 F.sum("space").alias("space_ct")))


def script_mix_readout(partials: DataFrame) -> DataFrame:
    """Final report from (possibly stream-appended) script-mix
    partials: sum the counters per source, THEN derive the integer
    permilles — ratios of sums, never sums of ratios. Output contract
    identical to script_mix_stats (the graded batch form)."""
    agg = (partials.groupBy("source")
           .agg(*[F.sum(c).cast("long").alias(c)
                  for c in ("doc_ct", "char_ct", "han_ct", "latin_ct",
                            "digit_ct", "space_ct")]))
    denom = "greatest(char_ct, 1)"
    return agg.select(
        "source", "doc_ct", "char_ct",
        F.expr(f"(1000 * han_ct) DIV {denom}").alias("han_permille"),
        F.expr(f"(1000 * latin_ct) DIV {denom}").alias("latin_permille"),
        F.expr(f"(1000 * digit_ct) DIV {denom}").alias("digit_permille"),
        F.expr(f"(1000 * space_ct) DIV {denom}").alias("space_permille"),
        F.expr(f"(1000 * (char_ct - han_ct - latin_ct - digit_ct"
               f" - space_ct)) DIV {denom}").alias("other_permille"))


def token_fertility_stats(documents: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility: tokens produced per 1000
    characters under the engine tokenizer vs a plain whitespace
    split. The fertility ratio is THE go/no-go metric when choosing a
    tokenizer for a language slice (a CJK slice under a whitespace
    tokenizer shows fertility collapsing toward one token per phrase
    — exactly the failure the engine's Han-bigram path fixes, and
    this report makes that visible per lang instead of anecdotally).

    Integer-exact permille counts; one scan + one tiny aggregate,
    same shape as token_stats. Split as partials → readout so the
    streaming form (jobs.token_fertility_stream) appends the
    identical counter partials per micro-batch.
    """
    return token_fertility_readout(token_fertility_partials(documents))


def token_fertility_partials(documents: DataFrame) -> DataFrame:
    """Additive per-lang counter partials of token_fertility_stats —
    every column is a sum/count, so micro-batch partials re-aggregate
    (token_fertility_readout) to exactly the single-pass report."""
    from ..functions.text import _ws_tokens

    tok = tokens("text")
    ws = _ws_tokens(F.coalesce(F.col("text"), F.lit("")))
    per_doc = documents.select(
        "lang",
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.size(tok).alias("n_tok"),
        F.size(ws).alias("n_ws"))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("doc_ct"),
                 F.sum("n_chars").alias("char_ct"),
                 F.sum("n_tok").alias("token_ct"),
                 F.sum("n_ws").alias("ws_token_ct")))


def token_fertility_readout(partials: DataFrame) -> DataFrame:
    """Final report from (possibly stream-appended) fertility
    partials: sum counters per lang, then the integer permilles —
    output contract identical to token_fertility_stats."""
    agg = (partials.groupBy("lang")
           .agg(*[F.sum(c).cast("long").alias(c)
                  for c in ("doc_ct", "char_ct", "token_ct",
                            "ws_token_ct")]))
    return agg.select(
        "lang", "doc_ct", "char_ct", "token_ct", "ws_token_ct",
        F.expr("(1000 * token_ct) DIV greatest(char_ct, 1)")
        .alias("tokens_per_kchar"),
        F.expr("(1000 * token_ct) DIV greatest(ws_token_ct, 1)")
        .alias("fertility_vs_ws_permille"))
