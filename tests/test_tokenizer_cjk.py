"""CJK tokenizer parity (U1): the engine's Han-run-bigram tokenizer
must agree bit-for-bit across its three surfaces — the JVM-side
``tokens()`` expression, the DuckDB oracle fragment
``registry._tok_expr``, and the ``ik_analyze`` UDTF — and
``keyword_stats`` must stay oracle-green on a corpus of CHINESE
search phrases (the reference's actual data domain,
gmall-realtime/.../app/dws/KeywordStatsApp.java:63-64 via
utils/KeywordUtil.java:12-31 IK smart mode)."""

import re

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gmall_flink_2021_spark.functions.text import (
    HAN_ANY, register_tokenizer_udtf, tokens)
from gmall_flink_2021_spark.plans.registry import _tok_expr

_slow = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

_HAN_RUN_RE = re.compile(f"({HAN_ANY}+)")
_HAN_ONLY_RE = re.compile(f"{HAN_ANY}+$")


def ref_tokens(text):
    """Straight-line Python ground truth: whitespace split with Han
    runs (U+4E00-U+9FFF) expanded to overlapping codepoint bigrams,
    single Han chars kept whole."""
    if not text:
        return []
    out = []
    for t in _HAN_RUN_RE.sub(r" \1 ", text).split(" "):
        if not t:
            continue
        if len(t) > 1 and _HAN_ONLY_RE.fullmatch(t):
            out.extend(t[i:i + 2] for i in range(len(t) - 1))
        else:
            out.append(t)
    return out


# Mixed-script soup: ASCII words, Han chars (in-block), a Hiragana
# char and a CJK-ext-A char (both OUTSIDE the Han block — must stay
# whole), digits, punctuation, runs of spaces.
_ALPHABET = "ab1.! 中文分词の㐀"
texts_strategy = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=40),
    min_size=1, max_size=10)


@given(texts=texts_strategy)
@_slow
def test_tokens_three_way_parity(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = {r.doc_id: r.tok for r in
                 df.select("doc_id", tokens("text").alias("tok"))
                 .collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    got_duck = dict(con.execute(
        f"SELECT doc_id, {_tok_expr('text')} FROM d").fetchall())

    want = {i: ref_tokens(t) for i, t in rows}
    assert got_spark == want
    assert got_duck == want


def test_udtf_matches_tokens_on_han_text(spark):
    register_tokenizer_udtf(spark)
    cases = ["中文分词测试",   # pure Han run
             "abc中文def",                     # inline mixed
             "中 abc 文字",                # single Han char
             "price:人民币100元!",     # digits + punct
             "plain ascii words", "", None]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "doc_id long, text string")
    df.createOrReplaceTempView("_cjk_docs")
    via_udtf = {}
    for r in spark.sql("""
            SELECT d.doc_id, t.keyword
            FROM _cjk_docs d, LATERAL ik_analyze(d.text) t""").collect():
        via_udtf.setdefault(r.doc_id, []).append(r.keyword)
    for i, c in enumerate(cases):
        assert via_udtf.get(i, []) == ref_tokens(c), (i, c)


def test_keyword_stats_oracle_green_on_chinese_corpus(spark):
    """The VERDICT 'done' bar: keyword_stats (Spark) vs the registry
    oracle SQL on a corpus containing Chinese search phrases, through
    the driver-equivalent compare harness. Under whitespace-only
    tokenization every phrase would be one opaque token; under the
    CJK tokenizer both engines count shared bigrams (e.g. 手机
    from both phone phrases) identically."""
    from gmall_flink_2021_spark.operators.dws import keyword_stats
    from gmall_flink_2021_spark.plans.registry import ORACLES
    from .parity import compare

    phrases = ["苹果手机壳",       # apple phone case
               "华为手机",             # huawei phone
               "连衣裙 夏季",      # dress + summer
               "red dress", "苹果", "苹果手机",
               "", None]
    rows = [(i, "zh", "search", len(p or ""), p)
            for i, p in enumerate(phrases)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, "
              "n_chars long, text string")

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR, "
                "source VARCHAR, n_chars BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)

    problems = compare(keyword_stats(docs), ORACLES["keyword_stats"], con)
    assert not problems, problems
    # sanity: the shared bigram 手机 ("phone") out-counts any phrase
    top = {r.keyword: r.ct for r in keyword_stats(docs).collect()}
    assert top["手机"] == 3


def test_script_mix_and_fertility_on_mixed_corpus(spark):
    """The two CJK-profiling reports must match the DuckDB oracle on
    a mixed Han/ASCII corpus, and the fertility report must expose
    the CJK tokenizer's token multiplication (bigrams > whitespace
    tokens on a zh slice — the signal a whitespace-only tokenizer
    would erase)."""
    import duckdb

    from gmall_flink_2021_spark.operators import textstats
    from gmall_flink_2021_spark.plans.registry import ORACLES
    from .parity import compare

    rows = [(1, "中文文档 example text", "zh", "mixed", 18),
            (2, "pure ascii words here", "en", "web", 21),
            (3, "数字123和空格", "zh", "mixed", 9),
            (4, None, "en", "web", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)

    assert not compare(textstats.script_mix_stats(docs),
                       ORACLES["script_mix_stats"], con)
    assert not compare(textstats.token_fertility_stats(docs),
                       ORACLES["token_fertility_stats"], con)
    fert = {r.lang: r for r in
            textstats.token_fertility_stats(docs).collect()}
    assert fert["zh"].fertility_vs_ws_permille > 1000  # bigrams multiply
    assert fert["en"].fertility_vs_ws_permille == 1000  # ascii unchanged
    mix = {r.source: r for r in
           textstats.script_mix_stats(docs).collect()}
    assert mix["mixed"].han_permille > 0
    assert mix["web"].han_permille == 0
