"""Text column expressions: tokenization, shingles, portable hashing.

The reference's only text operator is the IK Chinese tokenizer UDTF
(gmall-realtime/.../app/udf/KeywordUDTF.java:11-24 +
utils/KeywordUtil.java:12-31), used as LATERAL TABLE in
KeywordStatsApp.java:63-64. We generalize to a deterministic
CJK-aware tokenizer (JVM-side regexp + split + explode — no Python
UDF in the hot path): whitespace segmentation for non-Han text, and
Han-run codepoint BIGRAMS for CJK script — the classic
public-knowledge overlapping-bigram ("CJK analyzer") fallback for
Chinese, where whitespace segmentation would otherwise yield one
token per search phrase. On top of that sit the text-pipeline
primitives a large-scale training-data pipeline needs: shingling,
MinHash, fingerprints, quality metrics.

Hashing is md5-based because md5 is available and bit-identical in
both Spark and DuckDB, which keeps every one of these operators
oracle-checkable. At 100 TB the md5-per-shingle cost is ~the same
class as any murmur-based MinHash and stays inside whole-stage
codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately tiny, fixed stopword list (deterministic across engines).
STOPWORDS = ("the", "a")

MINHASH_SEEDS = 8          # signature length
LSH_BANDS = 4              # bands of MINHASH_SEEDS // LSH_BANDS rows
SHINGLE_N = 3

# Rolling-hash modulus: FP_MOD * 1000003 must stay inside int64 so the
# fold is overflow-free in both Spark (Java long) and DuckDB (BIGINT).
FP_MOD = 10 ** 12

# CJK Unified Ideographs (U+4E00-U+9FFF, the BMP Han block the
# reference's IK segmenter targets). Literal characters — not \\u
# escapes — so the same pattern string is valid in Java regex (Spark)
# and RE2 (DuckDB) alike.
HAN_LO, HAN_HI = chr(0x4E00), chr(0x9FFF)
HAN_ANY = f"[{HAN_LO}-{HAN_HI}]"
HAN_RUN = f"({HAN_ANY}+)"
HAN_ONLY = f"^{HAN_ANY}+$"


def _ws_tokens(c: Column) -> Column:
    """Plain whitespace split, empty tokens dropped."""
    return F.filter(F.split(c, " "), lambda t: F.length(t) > 0)


def _han_bigrams(t: Column) -> Column:
    """Expand one segment: a multi-char Han run becomes its
    overlapping codepoint bigrams; anything else passes through."""
    return F.when(
        t.rlike(HAN_ONLY) & (F.length(t) > 1),
        F.transform(F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: t.substr(i, F.lit(2)))
    ).otherwise(F.array(t))


def tokens(text_col: Column | str) -> Column:
    """Deterministic CJK-aware tokenizer (U1 analog): whitespace
    segmentation, plus Han runs expanded to overlapping codepoint
    bigrams (single Han chars kept whole) — the public-knowledge
    CJK-analyzer stand-in for the reference's IK smart-mode segmenter
    (utils/KeywordUtil.java:12-31). Mirrored bit-for-bit by the
    DuckDB oracle fragment ``plans/registry._TOKS`` and the UDTF in
    :func:`register_tokenizer_udtf`.

    Null text tokenizes to an empty array rather than null: every
    downstream ``F.size`` would otherwise return -1 for null input and
    silently corrupt token counts/ratios on a real (dirtier) corpus.

    Scale shape: documents without Han script (one ``rlike`` gate per
    document, CASE short-circuits in codegen) take the original plain
    split — the CJK machinery (run isolation + per-segment expansion)
    runs only on rows that need it. Everything stays JVM-side inside
    whole-stage codegen.
    """
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""))
    # isolate Han runs as their own segments ("abc中文def" →
    # "abc 中文 def"), then expand each Han segment to bigrams
    spaced = F.regexp_replace(c, HAN_RUN, " $1 ")
    expanded = F.flatten(F.transform(_ws_tokens(spaced), _han_bigrams))
    return F.when(c.rlike(HAN_ANY), expanded).otherwise(_ws_tokens(c))


def shingles(tok: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles joined by single spaces.

    Empty array when the document has fewer than ``n`` tokens.
    Built from n shifted array slices zipped with concat — ~10x faster
    than a transform over an index sequence with per-index element_at
    (measured 6.4s → 0.6s over 260k shingles on local[8]).
    """
    k = F.greatest(F.size(tok) - (n - 1), F.lit(0))
    out = F.slice(tok, 1, k)
    for i in range(1, n):
        out = F.zip_with(out, F.slice(tok, 1 + i, k),
                         lambda x, y: F.concat(x, F.lit(" "), y))
    return out


def minhash(sh: Column, seed: int) -> Column:
    """One MinHash value: min md5 over seed-prefixed shingles."""
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))))


def stopword_ratio(tok: Column) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for an empty doc.
    The divisor is clamped to ≥1: under ANSI mode (Spark 4 default)
    0/0 THROWS DIVIDE_BY_ZERO mid-scan — one empty document would
    kill an entire corpus job."""
    stop = F.size(F.filter(
        tok, lambda t: t.isin(*STOPWORDS)))
    return (stop.cast("double")
            / F.greatest(F.size(tok), F.lit(1)).cast("double"))


def register_tokenizer_udtf(spark, name: str = "ik_analyze") -> None:
    """U1/U2 parity: register the tokenizer as a real table function,
    mirroring the reference's ``createTemporarySystemFunction
    ("ik_analyze", KeywordUDTF.class)`` + ``LATERAL TABLE(ik_analyze
    (fullword))`` usage (KeywordStatsApp.java:40,63-64).

    The production path stays the JVM-side tokens()+explode; this UDTF
    exposes the same segmentation through the SQL surface:
        SELECT d.doc_id, t.keyword
        FROM docs d, LATERAL ik_analyze(d.text) t
    The reference's IK segmenter (Chinese, smart mode) is replaced by
    the engine's deterministic CJK-aware segmentation (whitespace +
    Han-run codepoint bigrams, identical to :func:`tokens` — parity
    pinned by test) — swap the body for jieba when available.
    """
    import re

    from pyspark.sql.functions import udtf

    han_run = re.compile(HAN_RUN)
    han_only = re.compile(HAN_ONLY)

    @udtf(returnType="keyword: string")
    class Tokenize:
        def eval(self, text: str):  # noqa: D102
            if not text:
                return
            for t in han_run.sub(r" \1 ", text).split(" "):
                if not t:
                    continue
                if len(t) > 1 and han_only.match(t):
                    for i in range(len(t) - 1):
                        yield (t[i:i + 2],)
                else:
                    yield (t,)

    spark.udtf.register(name, Tokenize)


def token_fingerprint(tok: Column) -> Column:
    """Order-sensitive rolling hash over the token stream (bigint).

    Portable across engines: per-token hash is
    ``length(t)*31 + ascii(first char)``; the fold is
    ``h = (h*1000003 + th) % FP_MOD`` starting from 0.
    """
    th = F.transform(
        tok, lambda t: F.length(t) * 31 + F.ascii(F.substring(t, 1, 1)))
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 1000003 + v) % FP_MOD,
    )


def token_windows(documents, width: int, stride: int):
    """Shared lateral token-window fan-out (sequence + posexplode +
    slice — entirely in the scan, no shuffle): one row per window of
    ``width`` tokens starting every ``stride`` tokens. Backs both
    dedup.doc_segments (width == stride) and textstats.doc_chunks
    (overlapping windows). Emits (doc_id, n_windows, idx, win)."""
    tok = tokens("text")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(tok) - 1, F.lit(0)),
                        F.lit(stride))
    return (documents
            .select("doc_id", tok.alias("tok"), starts.alias("starts"))
            .select("doc_id",
                    F.size("starts").cast("long").alias("n_windows"),
                    "tok",
                    F.posexplode("starts").alias("idx", "start"))
            .select("doc_id", "n_windows",
                    F.col("idx").cast("long").alias("idx"),
                    F.slice("tok", F.col("start") + 1, width)
                    .alias("win")))
