"""Plans: text-statistics and corpus-pipeline family (queries + mirrored DuckDB oracles)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup, textstats

from ._base import (  # noqa: F401
    _t)
from ._sql import (  # noqa: F401
    _BANDS,
    _BPE_N,
    _HAN,
    _SHINGLES,
    _TOKS,
    _bpe_oracle_cte,
    _tok_expr)

def q_token_stats(spark, sf):
    """Gates: whitespace-split token counting via array sizes (split stays
    in whole-stage codegen)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.token_stats(documents)

def q_script_mix_stats(spark, sf):
    """Gates: per-source script composition (Han/Latin/digit/space/
    other char classes), integer permilles, one scan + tiny agg."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.script_mix_stats(documents)

def q_token_fertility_stats(spark, sf):
    """Gates: tokenizer fertility per lang — engine (CJK-aware)
    tokens vs plain whitespace split per 1000 chars."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.token_fertility_stats(documents)

def q_quality_scores(spark, sf):
    """Gates: per-doc array-statistic projections (TTR, stopword ratio)
    with no shuffle."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.quality_scores(documents)

def q_lang_id(spark, sf):
    """Gates: n-gram-heuristic language id + label confusion counts."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.lang_id(documents)

def q_fingerprints(spark, sf):
    """Gates: deterministic rolling-hash document fingerprints (replayable
    identity)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.fingerprints(documents)

def q_bpe_token_stats(spark, sf):
    """Gates: regexp_extract_all BPE-ish pre-tokenization (regex path, vs
    token_stats' split path)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.bpe_token_stats(documents)

def q_doc_top_terms(spark, sf):
    """Gates: per-doc top-k terms via window over exploded tokens."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.doc_top_terms(documents)

def q_stratified_sample(spark, sf):
    """Gates: per-stratum deterministic hash sampling (exact quotas,
    replayable)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.stratified_sample(documents)

def q_term_df_stats(spark, sf):
    """Gates: corpus document-frequency distribution via exploded distinct
    terms."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.term_df_stats(documents)

def q_corpus_filter(spark, sf):
    """Gates: multi-predicate quality filtering with per-source retention
    stats."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.corpus_filter(documents)

def q_train_val_split(spark, sf):
    """Gates: content-hash modulo split (deterministic, replayable)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.train_val_split(documents)

def q_repetition_stats(spark, sf):
    """Gates: Gopher-style repetition ratios: n-gram duplicate fractions
    per doc."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.repetition_stats(documents)

def q_tfidf_search(spark, sf):
    """Gates: array-filter tf + 1-row broadcast idf + integer-scaled exact
    top-k ranking (plan-pinned)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.tfidf_search(documents)

def q_contamination_check(spark, sf):
    """Gates: static benchmark shingle index equi-joined against the corpus
    (streaming form tested)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.contamination_check(documents)

def q_domain_quota_sample(spark, sf):
    """Gates: per-source quota ranking with integer-only ordering (one
    shuffle)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.domain_quota_sample(documents)

def q_sequence_packing(spark, sf):
    """Gates: per-source prefix-sum chunk assignment (parallel per shard,
    no global order)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.sequence_packing(documents)

def q_pii_redaction(spark, sf):
    """Gates: regexp_extract_all / chained regexp_replace in the scan
    projection (the PII-scrubbing pass; Java-regex/RE2-common dialect,
    deterministically planted PII so counts are nonzero)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.pii_redaction(documents)

def q_doc_chunks(spark, sf):
    """Gates: lateral sequence()+posexplode+slice fan-out computed
    entirely in the scan (overlapping training-window chunking, zero
    shuffles)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.doc_chunks(documents)

def q_doc_length_percentiles_approx(spark, sf):
    """Gates: mergeable quantile sketch (percentile_approx / GK) — the
    no-global-sort scale path of the length profile — graded as an
    accuracy AUDIT (round 8: exact integer-rank percentiles +
    in-band verdicts, hash-checked; previously rows-only). Estimate
    form stays in SKETCH_ESTIMATE_QUERIES for the 3σ gate."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.doc_length_percentile_audit(documents)

def q_mixture_plan(spark, sf):
    """Gates: temperature-based source mixture allocation — integer
    DIV arithmetic on a broadcast 1-row total over per-source
    aggregates; the data-mixing planner of a pretraining run."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.mixture_plan(documents)

def q_training_shard_plan(spark, sf):
    """Gates: content-hash shard assignment + balance audit (integer
    skew permille vs ideal share) — the pre-flight of the final
    training-shard write."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.training_shard_plan(documents)

def q_quality_weighted_sample(spark, sf):
    """Gates: deterministic score-proportional sampling via portable
    md5+ascii uniform decode — zero-shuffle scan projection + filter
    (vs corpus_filter's hard threshold / stratified_sample's fixed
    rate)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.quality_weighted_sample(documents)

def q_heavy_hitter_terms(spark, sf):
    """Gates: per-partition Misra-Gries sketch (mapInPandas) feeding an
    EXACT broadcast-semi-join recount — shuffle volume O(candidates),
    never O(vocabulary); the sketch only bounds what gets recounted,
    so the result stays oracle-exact."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.heavy_hitter_terms(documents)

def q_unigram_lm_scores(spark, sf):
    """Gates: self-trained unigram LM perplexity scoring (CCNet-style
    quality filter) — vocab-bounded global rank + broadcast log-prob
    table + integer-exact per-doc sums (one fixed-point rounding per
    VOCAB term, zero float accumulation)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.unigram_lm_scores(documents)

def q_perplexity_buckets(spark, sf):
    """Gates: CCNet head/middle/tail tier split — integer fixed-point
    average-log-prob ranking (positive-shifted numerator so DIV==//),
    per-language exact tercile via one window pass, bucket sizes
    balanced within one by the (3·(rank−1)) DIV n formula."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.perplexity_buckets(documents)

def q_bpe_merge_candidates(spark, sf):
    """Gates: BPE tokenizer-training iteration 1 — corpus collapsed to a
    weighted word-frequency table before the pair fan-out, so merge
    statistics cost O(vocab), not O(corpus)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.bpe_merge_candidates(documents)

def q_bpe_merges(spark, sf):
    """Gates: the FULL iterative BPE trainer (Sennrich 2016) — N
    rounds of vocab-level pair count -> integer-exact argmax (1-row
    collect, the k-means-centroid precedent) -> literal-replace
    merge, persisted per round; corpus touched exactly once. The
    oracle unrolls the identical N rounds as materialized CTEs."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.bpe_merges(documents)

def q_bpe_encode_stats(spark, sf):
    """Gates: corpus encoding under the learned BPE vocabulary —
    per-doc token vs symbol counts via ONE broadcast join of the
    word -> symbol-count map onto the token fan-out; the corpus is
    never re-segmented row by row."""
    (documents,) = _t(spark, sf, "documents")
    out, h = textstats.bpe_encode_stats(documents)
    h.unpersist()  # lazy: recompute-on-reuse (empty on driver path)
    return out

def q_dsir_weights(spark, sf):
    """Gates: DSIR importance resampling (Xie 2023) — target/raw
    hashed-unigram LM log-ratio per doc; O(dim) bucket table broadcast
    both ways, integer-exact per-doc sums."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.dsir_importance_weights(documents)

def q_padding_waste_audit(spark, sf):
    """Gates: fixed-size batch grouping via global row_number DIV B
    under two orderings (arrival vs length-sorted) — the padding-
    efficiency measurement behind length-bucketed batching."""
    (documents,) = _t(spark, sf, "documents")
    out, h = textstats.padding_waste_audit(documents)
    h.unpersist()  # lazy: recompute-on-reuse
    return out

def q_bigram_lm_scores(spark, sf):
    """Gates: conditional-probability scoring — bigram table with
    interpolated unigram backoff (sparse observed-bigram join, one
    fixed-point rounding per distinct transition, integer-exact
    per-doc sums)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.bigram_lm_scores(documents)

def q_langid_trigram(spark, sf):
    """Gates: trained classifier scoring in-engine — char-trigram
    naive-Bayes language ID (smoothed per-language profiles, pivot-free
    matched+floor scoring, integer argmax) vs lang_id's heuristic."""
    (documents,) = _t(spark, sf, "documents")
    out, h = textstats.langid_trigram_confusion(documents)
    # leak convention: no pinned corpus-sized cache may outlive the
    # wrapper. The operator has no internal action, so this dead
    # cache costs one extra (parallel, spread) trigram fan-out at
    # collect time — accepted; library callers wanting the single
    # fan-out hold the handle live across their action instead.
    h.unpersist()
    return out

def q_corpus_funnel(spark, sf):
    """Gates: the pipeline END PRODUCT — cumulative multi-gate attrition
    (lang → length → quality → MinHash dedup) as ONE conditional
    aggregation over one corpus scan + the dedup-marks branch; no
    per-stage re-scans."""
    (documents,) = _t(spark, sf, "documents")
    out, h = textstats.corpus_funnel(documents)
    h.unpersist()  # lazy: recompute-on-reuse
    return out

def q_hashed_classifier_scores(spark, sf):
    """Gates: model-based quality filtering — hashed bag-of-words linear
    classifier (scan-side md5 feature hashing, broadcast dim-row weight
    table, integer logit sum; the external-decision-boundary complement
    of the self-trained LM scorers)."""
    (documents,) = _t(spark, sf, "documents")
    return textstats.hashed_classifier_scores(documents)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_stats": q_token_stats,
    "script_mix_stats": q_script_mix_stats,
    "token_fertility_stats": q_token_fertility_stats,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "corpus_filter": q_corpus_filter,
    "train_val_split": q_train_val_split,
    "stratified_sample": q_stratified_sample,
    "term_df_stats": q_term_df_stats,
    "doc_top_terms": q_doc_top_terms,
    "bpe_token_stats": q_bpe_token_stats,
    "repetition_stats": q_repetition_stats,
    "tfidf_search": q_tfidf_search,
    "contamination_check": q_contamination_check,
    "domain_quota_sample": q_domain_quota_sample,
    "sequence_packing": q_sequence_packing,
    "pii_redaction": q_pii_redaction,
    "doc_chunks": q_doc_chunks,
    "doc_length_percentiles_approx": q_doc_length_percentiles_approx,
    "mixture_plan": q_mixture_plan,
    "quality_weighted_sample": q_quality_weighted_sample,
    "training_shard_plan": q_training_shard_plan,
    "heavy_hitter_terms": q_heavy_hitter_terms,
    "unigram_lm_scores": q_unigram_lm_scores,
    "perplexity_buckets": q_perplexity_buckets,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "bpe_merges": q_bpe_merges,
    "bpe_encode_stats": q_bpe_encode_stats,
    "dsir_weights": q_dsir_weights,
    "corpus_funnel": q_corpus_funnel,
    "padding_waste_audit": q_padding_waste_audit,
    "bigram_lm_scores": q_bigram_lm_scores,
    "langid_trigram": q_langid_trigram,
    "hashed_classifier_scores": q_hashed_classifier_scores,
}

ORACLES: dict[str, str] = {
    "corpus_funnel": f"""
        WITH {_BANDS},
        buckets AS (
            SELECT band, band_hash, min(doc_id) AS first_doc
            FROM bands GROUP BY band, band_hash),
        coll AS (
            SELECT b.doc_id, min(k.first_doc) AS earliest_prior
            FROM bands b
            JOIN buckets k ON b.band = k.band AND b.band_hash = k.band_hash
            WHERE k.first_doc < b.doc_id
            GROUP BY b.doc_id),
        feats AS (
            SELECT t.doc_id, t.source, len(tok) AS n,
                   CASE WHEN len(tok) = 0 THEN 0.0
                        ELSE CAST(len(list_filter(tok,
                             t2 -> t2 IN ('the', 'a'))) AS DOUBLE)
                             / CAST(len(tok) AS DOUBLE) END AS sr,
                   CASE WHEN len(tok) = 0 THEN 0.0
                        ELSE CAST(len(list_distinct(tok)) AS DOUBLE)
                             / CAST(len(tok) AS DOUBLE) END AS ttr
            FROM toks t),
        g AS (
            SELECT f.source, f.n,
                   (f.n > 0 AND f.sr >= 0.05) AS c1,
                   (f.n > 0 AND f.sr >= 0.05 AND f.n >= 30) AS c2,
                   (f.n > 0 AND f.sr >= 0.05 AND f.n >= 30
                    AND f.sr <= 0.2 AND f.ttr >= 0.3) AS c3,
                   (f.n > 0 AND f.sr >= 0.05 AND f.n >= 30
                    AND f.sr <= 0.2 AND f.ttr >= 0.3
                    AND c.earliest_prior IS NULL) AS c4
            FROM feats f LEFT JOIN coll c ON f.doc_id = c.doc_id)
        SELECT source,
               count(*) AS total_ct,
               CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS lang_ct,
               CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS len_ct,
               CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS quality_ct,
               CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS unique_ct,
               CAST(sum(CASE WHEN c4 THEN n ELSE 0 END) AS BIGINT) AS kept_tokens
        FROM g GROUP BY source
    """,
    "token_stats": f"""
        WITH {_TOKS}
        SELECT source,
               count(*) AS doc_ct,
               CAST(sum(len(tok)) AS BIGINT) AS token_ct,
               CAST(sum(len(list_distinct(tok))) AS BIGINT) AS distinct_token_ct,
               CAST(sum(n_chars) AS BIGINT) AS char_ct
        FROM toks
        GROUP BY source
    """,
    "script_mix_stats": f"""
        WITH per AS (
            SELECT source,
                   len(coalesce(text, '')) AS n,
                   len(coalesce(text, '')) - len(regexp_replace(
                       coalesce(text, ''), '{_HAN}', '', 'g')) AS han,
                   len(coalesce(text, '')) - len(regexp_replace(
                       coalesce(text, ''), '[A-Za-z]', '', 'g')) AS latin,
                   len(coalesce(text, '')) - len(regexp_replace(
                       coalesce(text, ''), '[0-9]', '', 'g')) AS digit,
                   len(coalesce(text, '')) - len(regexp_replace(
                       coalesce(text, ''), ' ', '', 'g')) AS space
            FROM documents WHERE doc_id IS NOT NULL
        ), agg AS (
            SELECT source, count(*) AS doc_ct,
                   CAST(sum(n) AS BIGINT) AS char_ct,
                   CAST(sum(han) AS BIGINT) AS han_ct,
                   CAST(sum(latin) AS BIGINT) AS latin_ct,
                   CAST(sum(digit) AS BIGINT) AS digit_ct,
                   CAST(sum(space) AS BIGINT) AS space_ct
            FROM per GROUP BY source
        )
        SELECT source, doc_ct, char_ct,
               (1000 * han_ct) // greatest(char_ct, 1) AS han_permille,
               (1000 * latin_ct) // greatest(char_ct, 1) AS latin_permille,
               (1000 * digit_ct) // greatest(char_ct, 1) AS digit_permille,
               (1000 * space_ct) // greatest(char_ct, 1) AS space_permille,
               (1000 * (char_ct - han_ct - latin_ct - digit_ct - space_ct))
                   // greatest(char_ct, 1) AS other_permille
        FROM agg
    """,
    "token_fertility_stats": f"""
        WITH per AS (
            SELECT lang,
                   coalesce(n_chars, 0) AS n_chars,
                   len({_tok_expr('text')}) AS n_tok,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                                   t -> len(t) > 0)) AS n_ws
            FROM documents WHERE doc_id IS NOT NULL
        ), agg AS (
            SELECT lang, count(*) AS doc_ct,
                   CAST(sum(n_chars) AS BIGINT) AS char_ct,
                   CAST(sum(n_tok) AS BIGINT) AS token_ct,
                   CAST(sum(n_ws) AS BIGINT) AS ws_token_ct
            FROM per GROUP BY lang
        )
        SELECT lang, doc_ct, char_ct, token_ct, ws_token_ct,
               (1000 * token_ct) // greatest(char_ct, 1)
                   AS tokens_per_kchar,
               (1000 * token_ct) // greatest(ws_token_ct, 1)
                   AS fertility_vs_ws_permille
        FROM agg
    """,
    "quality_scores": f"""
        WITH {_TOKS}
        SELECT doc_id, lang, source,
               CAST(len(tok) AS INT) AS n_tokens,
               CAST(len(list_distinct(tok)) AS DOUBLE)
                   / CAST(greatest(len(tok), 1) AS DOUBLE) AS ttr,
               CAST(len(list_filter(tok, t -> t IN ('the', 'a'))) AS DOUBLE)
                   / CAST(greatest(len(tok), 1) AS DOUBLE) AS stop_ratio,
               CAST(coalesce(list_aggregate(
                        list_transform(tok, t -> len(t)), 'sum'),
                    0) AS DOUBLE)
                   / CAST(greatest(len(tok), 1) AS DOUBLE) AS mean_tok_len,
               CAST(len(tok) >= 20 AS INT) AS len_ok
        FROM toks
    """,
    "lang_id": f"""
        WITH {_TOKS}
        SELECT label_lang, pred_lang, count(*) AS ct FROM (
            SELECT lang AS label_lang,
                   CASE WHEN CAST(len(list_filter(tok, t -> t IN ('the', 'a'))) AS DOUBLE)
                             / CAST(greatest(len(tok), 1) AS DOUBLE) >= 0.05
                        THEN 'en' ELSE 'unknown' END AS pred_lang
            FROM toks
        )
        GROUP BY 1, 2
    """,
    "fingerprints": f"""
        WITH {_TOKS}
        SELECT doc_id,
               md5(coalesce(array_to_string(tok, ' '), '')) AS md5_fp,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(tok,
                           t -> CAST(len(t) * 31 + ascii(substr(t, 1, 1)) AS BIGINT))),
                   (acc, v) -> (acc * 1000003 + v) % 1000000000000
               ) AS roll_fp
        FROM toks
    """,
    "corpus_filter": f"""
        WITH {_TOKS}
        SELECT source, status, count(*) AS doc_ct FROM (
            SELECT source,
                   CASE WHEN len(tok) < 30 THEN 'too_short'
                        WHEN CAST(len(list_filter(tok, t -> t IN ('the', 'a'))) AS DOUBLE)
                             / CAST(len(tok) AS DOUBLE) > 0.2 THEN 'stopword_heavy'
                        WHEN CAST(len(list_distinct(tok)) AS DOUBLE)
                             / CAST(len(tok) AS DOUBLE) < 0.3 THEN 'repetitive'
                        ELSE 'kept' END AS status
            FROM toks
        )
        GROUP BY source, status
    """,
    "train_val_split": """
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                    THEN 'val' ELSE 'train' END AS split,
               count(*) AS doc_ct
        FROM documents WHERE doc_id IS NOT NULL
        GROUP BY 1, 2
    """,
    "stratified_sample": """
        SELECT source,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS sampled_ct,
               count(*) AS doc_ct
        FROM (
            SELECT source,
                   CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                             AS INTEGER) < 10
                        THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1','2','3','4','5','6','7')
                        ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0','1') END AS keep
            FROM documents WHERE doc_id IS NOT NULL)
        GROUP BY source
    """,
    "term_df_stats": f"""
        WITH {_TOKS}
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
        FROM (SELECT doc_id, unnest(tok) AS term FROM toks)
        GROUP BY term
        ORDER BY df DESC, tf DESC, term
        LIMIT 50
    """,
    "bpe_token_stats": f"""
        SELECT source, count(*) AS doc_ct,
               CAST(sum(len(regexp_extract_all(
                   text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
                   AS bpe_token_ct,
               CAST(sum(len({_tok_expr('text')})) AS BIGINT)
                   AS engine_token_ct
        FROM documents WHERE doc_id IS NOT NULL
        GROUP BY source
    """,
    "doc_top_terms": f"""
        WITH {_TOKS},
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(tok) AS term FROM toks)
            WHERE term NOT IN ('the', 'a')
            GROUP BY doc_id, term)
        SELECT doc_id, rank, term, tf FROM (
            SELECT doc_id, term, tf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tf DESC, term) AS rank
            FROM tf)
        WHERE rank <= 3
    """,
    "repetition_stats": f"""
        WITH {_TOKS},
        tk AS (SELECT doc_id, unnest(tok) AS t FROM toks),
        tc AS (SELECT doc_id, t, count(*) AS c FROM tk GROUP BY doc_id, t),
        top AS (SELECT doc_id, max(c) AS top_token_ct FROM tc
                GROUP BY doc_id),
        g AS (
            SELECT doc_id, len(tok) AS n_tokens,
                   CASE WHEN len(tok) >= 2
                        THEN list_transform(range(1, len(tok)),
                             i -> tok[i] || ' ' || tok[i+1])
                        ELSE [] END AS g2
            FROM toks
        )
        SELECT g.doc_id,
               CAST(n_tokens AS INT) AS n_tokens,
               CAST(coalesce(top_token_ct, 0) AS BIGINT) AS top_token_ct,
               CASE WHEN n_tokens > 0
                    THEN CAST(coalesce(top_token_ct, 0) AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE)
                    ELSE 0.0 END AS top_token_frac,
               CAST(len(g2) AS INT) AS n_2grams,
               CASE WHEN len(g2) > 0
                    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                               / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END AS dup_2gram_frac
        FROM g LEFT JOIN top ON g.doc_id = top.doc_id
    """,
    "tfidf_search": f"""
        WITH {_TOKS},
        tf AS (
            SELECT doc_id,
                   len(list_filter(tok, t -> t = 'spark'))  AS tf_0,
                   len(list_filter(tok, t -> t = 'join'))   AS tf_1,
                   len(list_filter(tok, t -> t = 'window')) AS tf_2
            FROM toks
        ),
        idf AS (
            SELECT count(*) AS n_docs,
                   sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                   sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                   sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
            FROM tf
        )
        SELECT doc_id, CAST(score_i AS DOUBLE) / 1000000.0 AS score
        FROM (
            SELECT doc_id,
                   CAST(round((
                       (CASE WHEN df_0 > 0 THEN CAST(tf_0 AS DOUBLE)
                            * ln(CAST(n_docs AS DOUBLE)
                                 / CAST(df_0 AS DOUBLE)) ELSE 0.0 END)
                     + (CASE WHEN df_1 > 0 THEN CAST(tf_1 AS DOUBLE)
                            * ln(CAST(n_docs AS DOUBLE)
                                 / CAST(df_1 AS DOUBLE)) ELSE 0.0 END)
                     + (CASE WHEN df_2 > 0 THEN CAST(tf_2 AS DOUBLE)
                            * ln(CAST(n_docs AS DOUBLE)
                                 / CAST(df_2 AS DOUBLE)) ELSE 0.0 END)
                       ) * 1000000.0) AS BIGINT) AS score_i
            FROM tf CROSS JOIN idf
        )
        WHERE score_i > 0
        ORDER BY score_i DESC, doc_id
        LIMIT 10
    """,
    "contamination_check": f"""
        WITH {_SHINGLES},
        c AS (SELECT doc_id, list_distinct(sh) AS sh FROM shing
              WHERE doc_id % 100 <> 0 AND len(sh) > 0),
        b AS (SELECT DISTINCT s FROM (
                  SELECT unnest(list_distinct(sh)) AS s FROM shing
                  WHERE doc_id % 100 = 0)),
        hits AS (
            SELECT doc_id, count(*) AS contaminated_sh
            FROM (SELECT doc_id, unnest(sh) AS s FROM c) cs
            JOIN b USING (s)
            GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(len(sh) AS INT) AS n_sh,
               CAST(coalesce(contaminated_sh, 0) AS BIGINT)
                   AS contaminated_sh,
               CAST(coalesce(contaminated_sh, 0) AS DOUBLE)
                   / CAST(len(sh) AS DOUBLE) AS contaminated_frac
        FROM c LEFT JOIN hits ON c.doc_id = hits.doc_id
    """,
    "domain_quota_sample": """
        SELECT source, doc_id, n_chars, rank FROM (
            SELECT source, doc_id, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       -- NULLS LAST = Spark's F.desc default; NULL
                       -- n_chars (NULL text) must rank behind real
                       -- lengths on both engines
                       ORDER BY n_chars DESC NULLS LAST, doc_id)
                       AS BIGINT) AS rank
            FROM documents WHERE doc_id IS NOT NULL)
        WHERE rank <= 10
    """,
    "sequence_packing": f"""
        WITH {_TOKS},
        t AS (SELECT source, doc_id, len(tok) AS n_tokens FROM toks),
        p AS (
            SELECT source, n_tokens,
                   CAST((sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048
                        AS BIGINT) AS chunk_id
            FROM t
        )
        SELECT source, chunk_id,
               count(*) AS doc_ct,
               CAST(sum(n_tokens) AS BIGINT) AS token_ct,
               least(CAST(sum(n_tokens) AS DOUBLE) / 2048.0, 1.0)
                   AS fill_ratio
        FROM p GROUP BY source, chunk_id
    """,
    # Plain string (no f-prefix): the regex bounded-repetition braces
    # would collide with f-string interpolation.
    "pii_redaction": r"""
        WITH planted AS (
            SELECT source,
                   text || CASE doc_id % 5
                       WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                   || '@mail.example.com now'
                       WHEN 1 THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR)
                                   || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                                   || ' up'
                       WHEN 2 THEN ' call +1 555 0' || CAST(doc_id % 100 AS VARCHAR)
                                   || ' 42 now'
                       ELSE '' END AS t0
            FROM documents WHERE doc_id IS NOT NULL),
        s1 AS (
            SELECT source, t0,
                   regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                                  '<EMAIL>', 'g') AS t1
            FROM planted),
        s2 AS (
            SELECT source, t0, t1,
                   regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}',
                                  '<IP>', 'g') AS t2
            FROM s1),
        s3 AS (
            SELECT source, t0, t1, t2,
                   regexp_replace(t2, '\+[0-9][0-9 ]{6,}[0-9]',
                                  '<PHONE>', 'g') AS t3
            FROM s2)
        SELECT source,
               count(*) AS doc_ct,
               CAST(sum(len(regexp_extract_all(t0,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
                   AS email_ct,
               CAST(sum(len(regexp_extract_all(t1,
                   '([0-9]{1,3}\.){3}[0-9]{1,3}'))) AS BIGINT) AS ip_ct,
               CAST(sum(len(regexp_extract_all(t2,
                   '\+[0-9][0-9 ]{6,}[0-9]'))) AS BIGINT) AS phone_ct,
               CAST(sum(len(t0) - len(t3)) AS BIGINT) AS redacted_chars
        FROM s3 GROUP BY source
    """,
    "doc_chunks": "WITH " + _TOKS.lstrip() + """,
        starts AS (
            SELECT doc_id, tok,
                   unnest(range(0, greatest(len(tok) - 1, 0) + 1, 12)) AS i
            FROM toks),
        chunks AS (
            SELECT doc_id,
                   i // 12 AS chunk_idx,
                   tok[i + 1 : i + 16] AS chunk
            FROM starts)
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(chunk) AS BIGINT) AS chunk_len,
               md5(coalesce(array_to_string(chunk, ' '), '')) AS chunk_fp
        FROM chunks
    """,

    # integer-only mixture plan: floor(sqrt) of a correctly-rounded
    # IEEE sqrt then integer division — bit-identical across engines
    "mixture_plan": f"""
        WITH {_TOKS},
        per AS (
            SELECT source, CAST(sum(len(tok)) AS BIGINT) AS token_ct
            FROM toks GROUP BY source
        ),
        w AS (
            SELECT source, token_ct,
                   CAST(floor(sqrt(CAST(token_ct AS DOUBLE))) AS BIGINT)
                       AS weight
            FROM per
        ),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wtot FROM w)
        SELECT source, token_ct, weight,
               weight * 1000 // greatest(wtot, 1) AS share_permille,
               1000000 * weight // greatest(wtot, 1) AS alloc_tokens,
               (1000000 * weight // greatest(wtot, 1)) * 1000
                   // greatest(token_ct, 1)
                   AS epochs_permille
        FROM w, tot
    """,

    # md5 hex chars decoded to an integer via ascii arithmetic — the
    # portable uniform both engines compute identically
    "quality_weighted_sample": f"""
        WITH {_TOKS},
        q AS (
            SELECT doc_id, source,
                   CAST(len(tok) AS BIGINT) AS n_tokens,
                   least(256, 32 + len(list_distinct(tok))) AS keep,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hh
            FROM toks
        )
        SELECT doc_id, source, n_tokens,
               CAST(keep AS BIGINT) AS keep_p256
        FROM q
        WHERE (CASE WHEN ascii(substr(hh, 1, 1)) >= 97
                    THEN ascii(substr(hh, 1, 1)) - 87
                    ELSE ascii(substr(hh, 1, 1)) - 48 END) * 16
            + (CASE WHEN ascii(substr(hh, 2, 1)) >= 97
                    THEN ascii(substr(hh, 2, 1)) - 87
                    ELSE ascii(substr(hh, 2, 1)) - 48 END)
            < keep
    """,

    # content-hash shard audit: same portable md5+ascii uniform, mod
    # n_shards; all-integer balance arithmetic
    "training_shard_plan": f"""
        WITH {_TOKS},
        per AS (
            SELECT ((CASE WHEN ascii(substr(md5(coalesce(d.text, '')), 1, 1)) >= 97
                          THEN ascii(substr(md5(coalesce(d.text, '')), 1, 1)) - 87
                          ELSE ascii(substr(md5(coalesce(d.text, '')), 1, 1)) - 48 END) * 16
                  + (CASE WHEN ascii(substr(md5(coalesce(d.text, '')), 2, 1)) >= 97
                          THEN ascii(substr(md5(coalesce(d.text, '')), 2, 1)) - 87
                          ELSE ascii(substr(md5(coalesce(d.text, '')), 2, 1)) - 48 END))
                  % 16 AS shard,
                   len(t.tok) AS n_tokens
            -- toks is already keyed (gated in _TOKS) and USING
            -- (doc_id) can't match NULL; explicit for the invariant
            FROM documents d JOIN toks t USING (doc_id)
            WHERE d.doc_id IS NOT NULL
        ),
        shards AS (
            SELECT CAST(shard AS BIGINT) AS shard,
                   count(*) AS doc_ct,
                   CAST(sum(n_tokens) AS BIGINT) AS token_ct
            FROM per GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(token_ct) AS BIGINT) AS ttot FROM shards)
        SELECT shard, doc_ct, token_ct,
               token_ct * 1000 // greatest(ttot, 1) - 62 AS skew_permille
        FROM shards, tot
    """,
    # exact heavy hitters: the MG pass only bounds the recount set, so
    # the oracle is the plain HAVING form
    "heavy_hitter_terms": f"""
        WITH {_TOKS},
        t AS (SELECT unnest(tok) AS term FROM toks),
        tot AS (SELECT count(*) AS total_tokens FROM t)
        SELECT term, count(*) AS cnt,
               count(*) * 1000 // total_tokens AS share_permille
        FROM t, tot
        GROUP BY term, total_tokens
        HAVING count(*) * 1000 >= 10 * total_tokens
    """,
    "unigram_lm_scores": f"""
        WITH {_TOKS},
        t AS (SELECT doc_id, unnest(tok) AS term FROM toks),
        c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        v AS (SELECT term, cnt,
                     row_number() OVER (ORDER BY cnt DESC, term) AS rk
              FROM c),
        ll AS (SELECT term,
                      CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1e6)
                           AS BIGINT) AS llr_micro
               FROM v, tot WHERE rk <= 65536),
        fl AS (SELECT CAST(round(ln(1.0 / n) * 1e6) AS BIGINT)
                      AS floor_micro FROM tot),
        scored AS (
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(coalesce(llr_micro, floor_micro))
                        AS BIGINT) AS sum_llr_micro
            FROM t LEFT JOIN ll USING (term), fl
            GROUP BY doc_id)
        SELECT doc_id, n_tokens, sum_llr_micro,
               CASE WHEN sum_llr_micro >= -3450000 * n_tokens THEN 'high'
                    WHEN sum_llr_micro >= -3550000 * n_tokens THEN 'mid'
                    ELSE 'low' END AS lm_band
        FROM scored
    """,
    # positive-shifted numerator makes DuckDB's flooring // equal to
    # Spark's truncating DIV; ties on the floored average break on
    # doc_id in both engines
    "perplexity_buckets": f"""
        WITH {_TOKS},
        t AS (SELECT doc_id, lang, unnest(tok) AS term FROM toks),
        c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        v AS (SELECT term, cnt,
                     row_number() OVER (ORDER BY cnt DESC, term) AS rk
              FROM c),
        ll AS (SELECT term,
                      CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1e6)
                           AS BIGINT) AS llr_micro
               FROM v, tot WHERE rk <= 65536),
        fl AS (SELECT CAST(round(ln(1.0 / n) * 1e6) AS BIGINT)
                      AS floor_micro FROM tot),
        scored AS (
            SELECT doc_id, any_value(lang) AS lang,
                   count(*) AS n_tokens,
                   CAST(sum(coalesce(llr_micro, floor_micro))
                        AS BIGINT) AS sum_llr_micro
            FROM t LEFT JOIN ll USING (term), fl
            GROUP BY doc_id),
        keyed AS (
            SELECT *,
                   (sum_llr_micro + 100000000 * n_tokens) // n_tokens
                       AS ppl_key
            FROM scored),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY ppl_key DESC, doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY lang) AS n_lang
            FROM keyed)
        SELECT doc_id, lang, n_tokens, sum_llr_micro,
               CAST(ppl_key - 100000000 AS BIGINT) AS avg_llr_micro,
               CAST(rn AS BIGINT) AS ppl_rank,
               CASE (3 * (rn - 1)) // n_lang
                    WHEN 0 THEN 'head'
                    WHEN 2 THEN 'tail'
                    ELSE 'middle' END AS ppl_bucket
        FROM r
    """,
    "bpe_merge_candidates": f"""
        WITH {_TOKS},
        words AS (
            SELECT word, count(*) AS word_ct
            FROM (SELECT unnest(tok) AS word FROM toks)
            GROUP BY word),
        pairs AS (
            SELECT unnest(list_transform(range(1, len(word)),
                                         i -> substr(word, i, 2))) AS pair,
                   word_ct
            FROM words WHERE len(word) >= 2),
        agg AS (
            SELECT pair, CAST(sum(word_ct) AS BIGINT) AS merge_ct
            FROM pairs GROUP BY pair)
        SELECT CAST(row_number() OVER (ORDER BY merge_ct DESC, pair)
                    AS BIGINT) AS rank,
               pair, merge_ct
        FROM agg
        ORDER BY merge_ct DESC, pair
        LIMIT 20
    """,
    "padding_waste_audit": f"""
        WITH {_TOKS},
        t AS (SELECT doc_id, len(tok) AS n_tokens FROM toks),
        arrival AS (
            SELECT (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS batch,
                   n_tokens
            FROM t),
        srt AS (
            SELECT (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 8
                       AS batch,
                   n_tokens
            FROM t),
        pa AS (
            SELECT batch, count(*) AS n, max(n_tokens) AS mx,
                   sum(n_tokens) AS payload
            FROM arrival GROUP BY batch),
        ps AS (
            SELECT batch, count(*) AS n, max(n_tokens) AS mx,
                   sum(n_tokens) AS payload
            FROM srt GROUP BY batch),
        ra AS (
            SELECT 'arrival_order' AS strategy, count(*) AS batches,
                   CAST(sum(payload) AS BIGINT) AS payload_tokens,
                   CAST(sum(mx * n - payload) AS BIGINT) AS padded_slots
            FROM pa),
        rs AS (
            SELECT 'length_sorted' AS strategy, count(*) AS batches,
                   CAST(sum(payload) AS BIGINT) AS payload_tokens,
                   CAST(sum(mx * n - payload) AS BIGINT) AS padded_slots
            FROM ps)
        SELECT strategy, batches, payload_tokens, padded_slots,
               padded_slots * 1000 // greatest(payload_tokens + padded_slots, 1)
                   AS waste_permille
        FROM (SELECT * FROM ra UNION ALL SELECT * FROM rs)
    """,
    "bigram_lm_scores": f"""
        WITH {_TOKS},
        tr AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tok)),
                          i -> tok[i] || ' ' || tok[i + 1])) AS bigram
            FROM toks),
        uni AS (
            SELECT term, count(*) AS cu
            FROM (SELECT unnest(tok) AS term FROM toks)
            GROUP BY term),
        tot AS (SELECT CAST(sum(cu) AS BIGINT) AS total_tokens FROM uni),
        bi AS (
            SELECT bigram, count(*) AS c2,
                   string_split(bigram, ' ')[1] AS prev,
                   string_split(bigram, ' ')[2] AS nxt
            FROM tr GROUP BY bigram),
        sb AS (
            SELECT bigram,
                   CAST(round(ln(0.7 * c2 / p.cu
                                 + 0.3 * n.cu / total_tokens) * 1e6)
                        AS BIGINT) AS llr_micro
            FROM bi
            JOIN uni p ON bi.prev = p.term
            JOIN uni n ON bi.nxt = n.term, tot)
        SELECT doc_id, count(*) AS n_transitions,
               CAST(sum(llr_micro) AS BIGINT) AS sum_llr_micro
        FROM tr JOIN sb USING (bigram)
        GROUP BY doc_id
    """,
    "langid_trigram": """
        WITH tri AS (
            SELECT doc_id, lang AS label_lang,
                   unnest(list_filter(list_transform(
                       range(1, greatest(len(coalesce(text, '')) - 2, 1) + 1),
                       i -> substr(coalesce(text, ''), CAST(i AS INT), 3)),
                       t -> len(t) = 3)) AS tri
            FROM documents WHERE doc_id IS NOT NULL),
        profile AS (
            SELECT label_lang AS lang_p, tri, count(*) AS c
            FROM tri GROUP BY 1, 2),
        v AS (SELECT count(DISTINCT tri) AS v FROM tri),
        lt AS (
            SELECT lang_p, CAST(sum(c) AS BIGINT) AS ct_lang, v
            FROM profile, v GROUP BY lang_p, v),
        llr AS (
            SELECT p.lang_p, p.tri,
                   CAST(round(ln(CAST(p.c + 1 AS DOUBLE)
                                 / (lt.ct_lang + lt.v)) * 1e6)
                        AS BIGINT) AS llr_micro
            FROM profile p JOIN lt ON p.lang_p = lt.lang_p),
        floors AS (
            SELECT lang_p,
                   CAST(round(ln(1.0 / (ct_lang + v)) * 1e6)
                        AS BIGINT) AS floor_micro
            FROM lt),
        matched AS (
            SELECT t.doc_id, l.lang_p,
                   count(*) AS m, CAST(sum(l.llr_micro) AS BIGINT) AS s
            FROM tri t JOIN llr l ON t.tri = l.tri
            GROUP BY 1, 2),
        nt AS (SELECT doc_id, label_lang, count(*) AS n_tri
               FROM tri GROUP BY 1, 2),
        scored AS (
            SELECT nt.doc_id, nt.label_lang, f.lang_p,
                   coalesce(m.s, 0)
                   + (nt.n_tri - coalesce(m.m, 0)) * f.floor_micro
                       AS score
            FROM nt
            CROSS JOIN floors f
            LEFT JOIN matched m
              ON nt.doc_id = m.doc_id AND f.lang_p = m.lang_p),
        pred AS (
            SELECT doc_id, label_lang, lang_p FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score DESC, lang_p) AS rk
                FROM scored) WHERE rk = 1)
        SELECT label_lang, lang_p AS pred_lang, count(*) AS ct
        FROM pred GROUP BY 1, 2
    """,
}

ORACLES["bpe_merges"] = (
    "WITH " + _bpe_oracle_cte()
    + "\nSELECT step, pair, merged, merge_ct FROM ("
    + " UNION ALL ".join(f"SELECT * FROM m{s}"
                         for s in range(1, _BPE_N + 1))
    + ") ORDER BY step")
ORACLES["bpe_encode_stats"] = (
    "WITH " + _bpe_oracle_cte() + f""",
        enc AS (
            SELECT word,
                   CAST(len(str_split(sym, ';')) - 1 AS BIGINT) AS n_sym
            FROM v{_BPE_N})
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(coalesce(n_sym, 1)) AS BIGINT) AS n_symbols
        FROM (SELECT doc_id, unnest(tok) AS word FROM toks)
        LEFT JOIN enc USING (word)
        GROUP BY doc_id""")

ORACLES["dsir_weights"] = f"""
    WITH {_TOKS},
    tgt AS (SELECT min(source) AS target_src FROM documents WHERE doc_id IS NOT NULL),
    occ AS (
        SELECT doc_id, source = (SELECT target_src FROM tgt) AS is_target,
               t.term
        FROM toks, unnest(tok) AS t(term)
    ),
    feat AS (
        SELECT doc_id, is_target,
               CAST((CASE WHEN ascii(substr(md5(term), 1, 1)) >= 97 THEN ascii(substr(md5(term), 1, 1)) - 87 ELSE ascii(substr(md5(term), 1, 1)) - 48 END) * 256 + (CASE WHEN ascii(substr(md5(term), 2, 1)) >= 97 THEN ascii(substr(md5(term), 2, 1)) - 87 ELSE ascii(substr(md5(term), 2, 1)) - 48 END) * 16 + (CASE WHEN ascii(substr(md5(term), 3, 1)) >= 97 THEN ascii(substr(md5(term), 3, 1)) - 87 ELSE ascii(substr(md5(term), 3, 1)) - 48 END) AS BIGINT) AS b
        FROM occ
    ),
    stats AS (
        SELECT b,
               CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
                   AS ct_t,
               CAST(count(*) AS BIGINT) AS ct_r
        FROM feat GROUP BY b
    ),
    tot AS (
        SELECT CAST(sum(ct_t) AS BIGINT) AS n_t,
               CAST(sum(ct_r) AS BIGINT) AS n_r
        FROM stats
    ),
    llr AS (
        SELECT b,
               CAST(round((ln(CAST(ct_t + 1 AS DOUBLE) / (n_t + 4096))
                           - ln(CAST(ct_r + 1 AS DOUBLE) / (n_r + 4096)))
                          * 1e6) AS BIGINT) AS llr_micro
        FROM stats, tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(llr_micro) AS BIGINT) AS dsir_weight_micro
    FROM feat JOIN llr USING (b)
    GROUP BY doc_id
"""

ORACLES["hashed_classifier_scores"] = f"""
    WITH {_TOKS},
    occ AS (
        SELECT doc_id, t.term FROM toks, unnest(tok) AS t(term)
    ),
    feat AS (
        SELECT doc_id, (CASE WHEN ascii(substr(md5(term), 1, 1)) >= 97 THEN ascii(substr(md5(term), 1, 1)) - 87 ELSE ascii(substr(md5(term), 1, 1)) - 48 END) * 256 + (CASE WHEN ascii(substr(md5(term), 2, 1)) >= 97 THEN ascii(substr(md5(term), 2, 1)) - 87 ELSE ascii(substr(md5(term), 2, 1)) - 48 END) * 16 + (CASE WHEN ascii(substr(md5(term), 3, 1)) >= 97 THEN ascii(substr(md5(term), 3, 1)) - 87 ELSE ascii(substr(md5(term), 3, 1)) - 48 END) AS bucket FROM occ
    ),
    -- the md5-derived stand-in weight vector, one row per bucket
    -- (mirrors operators/textstats.classifier_weights exactly)
    w AS (
        SELECT CAST(b AS BIGINT) AS bucket,
               CAST((CASE WHEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 1, 1)) >= 97 THEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 1, 1)) - 87 ELSE ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 1, 1)) - 48 END) * 4096 + (CASE WHEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 2, 1)) >= 97 THEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 2, 1)) - 87 ELSE ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 2, 1)) - 48 END) * 256 + (CASE WHEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 3, 1)) >= 97 THEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 3, 1)) - 87 ELSE ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 3, 1)) - 48 END) * 16 + (CASE WHEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 4, 1)) >= 97 THEN ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 4, 1)) - 87 ELSE ascii(substr(md5(CAST(b AS VARCHAR) || '|w'), 4, 1)) - 48 END) - 32768 AS BIGINT) AS w_micro
        FROM range(0, 4096) AS t(b)
    ),
    sums AS (
        SELECT doc_id, sum(w_micro) AS s
        FROM feat JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT toks.doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
           CAST(coalesce(s, 0) AS BIGINT) AS logit_micro,
           CAST(CASE WHEN coalesce(s, 0) >= 0 THEN 1 ELSE 0 END
                AS BIGINT) AS keep_label
    FROM toks LEFT JOIN sums USING (doc_id)
"""

# exact percentiles use the repo's integer rank rule (value at
# 1-indexed rank (p*n+99)//100 of the per-lang sorted lengths) —
# winsorized_price_stats' discipline, identical on both engines.
# p{p}_interp carries the exact INTERPOLATED profile (the former
# doc_length_percentiles entry, merged here in round 9 — same
# per-lang substrate, one grading slot).
ORACLES["doc_length_percentiles_approx"] = """
    WITH cts AS (
        SELECT lang, count(*) AS doc_ct
        FROM documents WHERE doc_id IS NOT NULL
        GROUP BY lang
    ),
    ranked AS (
        -- the sketch's population: non-NULL lengths only
        SELECT lang, n_chars AS v,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    ex AS (
        SELECT lang,
               CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN v
                        END) AS BIGINT) AS p50_exact,
               CAST(max(CASE WHEN rn = (90 * n + 99) // 100 THEN v
                        END) AS BIGINT) AS p90_exact,
               CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN v
                        END) AS BIGINT) AS p99_exact
        FROM ranked GROUP BY lang
    ),
    interp AS (
        SELECT lang,
               round(quantile_cont(n_chars, 0.5), 6) AS p50_interp,
               round(quantile_cont(n_chars, 0.9), 6) AS p90_interp,
               round(quantile_cont(n_chars, 0.99), 6) AS p99_interp
        FROM documents WHERE doc_id IS NOT NULL
        GROUP BY lang
    )
    SELECT cts.lang, CAST(doc_ct AS BIGINT) AS doc_ct,
           p50_exact, CAST(1 AS BIGINT) AS p50_in_band, p50_interp,
           p90_exact, CAST(1 AS BIGINT) AS p90_in_band, p90_interp,
           p99_exact, CAST(1 AS BIGINT) AS p99_in_band, p99_interp
    FROM cts
    LEFT JOIN ex ON cts.lang IS NOT DISTINCT FROM ex.lang
    LEFT JOIN interp ON cts.lang IS NOT DISTINCT FROM interp.lang
"""
