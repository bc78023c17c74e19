"""Adversarial-corpus generator for the parity fuzz harness
(VERDICT r7 #3).

The friendly driver testdata (lowercase single-spaced ASCII, no NULL
keys, every group populated) hides a whole class of parity bugs: the
null-lang-group join drop (r7), the DATE-stringify hash break (r5),
the empty-child fk_orphans NULL (r6) were all found by review or
luck, not by harness. This module writes parquet corpora that hit
those edges ON PURPOSE, and `tests/run_parity.py <dir>` (or
tests/test_adversarial_parity.py) runs the full mirrored-oracle sweep
over them.

Two variants:
 - ``edge``: adversarial documents / embeddings / events (NULL group
   keys, empty + whitespace-only + CJK + mixed-script + max-length +
   null-byte + combining-mark + RTL texts, exact/near duplicate rows
   across sources, single-row groups, zero vectors, duplicate
   vectors, failed-encoder vectors — NaN / ±Inf / NULL-element /
   NULL / float32-max-magnitude — tied timestamps, an undated
   (NULL-ts) event, NaN/Inf metric values, malformed props JSON,
   NULL primary keys on documents/embeddings), with the relational
   tables copied from sf0.001 so every registry query still runs.
 - ``empty``: zero-row documents / embeddings / events / orders /
   lineitem with the exact driver schemas (dimensions stay
   populated) — the "new deployment, no facts yet" shape that
   surfaces empty-aggregate / empty-child divergences.

Deterministic: fixed literal rows (a seeded RNG only for embedding
noise), so any failure reproduces bit-for-bit.

Usage: python tests/adversarial_corpus.py [dest_root]
  writes <dest_root>/edge and <dest_root>/empty
  (default dest_root: /tmp/gmall_adversarial)
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_BASE = "/root/testdata/sf0.001"
RELATIONAL = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem")
DEFAULT_ROOT = "/tmp/gmall_adversarial"

_HAN = "数据库查询优化器执行计划分区排序合并扫描"
_MIXED = "spark 数据 query 查询 123 plan 执行 merge"


def _documents_rows():
    """One row per edge; text/lang/source/n_chars follow the driver
    generator's contract (n_chars == codepoint length of text, NULL
    text -> NULL n_chars)."""
    long_text = " ".join(
        f"token{i % 97} filler word" for i in range(2500))  # ~50k chars
    rows = [
        # --- NULL group keys (the r7 null-lang-group bug class)
        (0, "a document with a null language group key", None, "src0"),
        (1, "another null lang doc so the group has two", None, "src1"),
        (2, "null source group key document body here", "en", None),
        (3, None, "en", "src2"),                 # NULL text
        (4, "", "en", "src3"),                   # empty text
        # empty-STRING group values (round-9 seeded-fuzz pin):
        # datasketches HLL ignores empty-string updates, so column
        # profiles must encode values before sketching or '' vanishes
        # from distinct estimates
        (33, "document whose lang is the empty string", "", "src3"),
        (5, "   \t  \n ", "en", "src4"),         # whitespace-only
        # --- CJK + mixed scripts (tokenizer bigram path)
        (6, _HAN, "zh", "src5"),
        (7, _MIXED, "zh", "src6"),
        (8, _HAN + " " + _HAN, "zh", "src7"),    # CJK exact-dup pair a
        (9, _HAN + " " + _HAN, "zh", "src8"),    # CJK exact-dup pair b
        # --- single-row groups
        (10, "the only klingon document in the corpus", "tlh", "src9"),
        (11, "sole document of a one-doc source group", "en",
         "only_src"),
        # --- duplicates across sources (dedup/provenance paths)
        (12, "identical body shared across three sources", "en",
         "src10"),
        (13, "identical body shared across three sources", "en",
         "src11"),
        (14, "identical body shared across three sources", "fr",
         "src12"),
        (15, "identical body shared across three sources but near",
         "en", "src13"),
        # --- pathological token shapes
        (16, "a a a a a a a a a a a a a a a a a a a a", "en", "src14"),
        (17, "!!! ??? ... ,,, ;;; ::: --- ###", "en", "src15"),
        (18, "MiXeD CaSe TeXt UPPER lower Title", "en", "src16"),
        (19, "word", "en", "src17"),             # single token
        (20, "double  space\ttab\nnewline mix", "en", "src18"),
        # --- unicode width / codepoint-length agreement
        (21, "emoji \U0001F600 snowman ☃ text", "en", "src19"),
        (22, "quote's \"and\" back\\slash $dollar %percent", "en",
         "src0"),
        # --- max-length doc
        (23, long_text, "en", "src1"),
        # --- negative / gap doc ids (ordering rules)
        (-1, "negative doc id arrives first in doc id order", "en",
         "src2"),
        (1_000_000, "huge doc id far from the dense range", "en",
         "src3"),
        # --- identical CJK VIDEO pair (both ids = 2 mod 3): their
        # byte-sliced frames collide, exercising the multi-byte frame
        # hash path of frame_dedup end-to-end
        (26, _HAN * 3, "zh", "src4"),
        (29, _HAN * 3, "zh", "src5"),
        # --- round-8 extension: byte-level and normalization edges
        (30, "null\x00byte embedded\x00in text", "en", "src6"),
        # combining accents: e + U+0301 (two codepoints render as é) —
        # codepoint-length engines must agree, and tokenizers must not
        # split on the combining mark differently
        (31, "cafe\u0301 nai\u0308ve re\u0301sume\u0301 words",
         "fr", "src7"),
        # RTL script (Arabic) mixed with Latin — regex tokenizers and
        # script-mix profiling see non-Latin non-CJK codepoints
        (32, "مرحبا hello "
             "بالعالم world",
         "ar", "src8"),
        # NULL primary key (malformed ingest): dedup keys, window
        # partitions and equi-joins must treat it identically —
        # NULL never equi-joins, NULL partitions group together
        (None, "document that arrived without a primary key", "en",
         "src9"),
    ]
    out = []
    for doc_id, text, lang, source in rows:
        n_chars = None if text is None else len(text)
        out.append((doc_id, text, lang, source, n_chars))
    return out


def _embeddings_rows():
    """40 dim-64 float vectors: a zero vector, exact duplicates, a
    near-duplicate pair, a single-vector label, a NULL label pair,
    and seeded noise vectors so k-means/PQ have mass to work on."""
    rng = np.random.default_rng(20260815)
    rows = []

    def add(vec_id, label, vec):
        rows.append((vec_id, label,
                     [float(np.float32(x)) for x in vec]))

    base = rng.normal(size=(30, 64))
    for i in range(30):
        add(i, i % 5, base[i])
    add(30, 0, np.zeros(64))                  # zero vector (norm 0)
    add(31, 1, base[0])                       # exact dup of vec 0
    add(32, 2, base[0])                       # same, different label
    add(33, 3, base[1] + 1e-4 * rng.normal(size=64))  # near-dup
    add(34, 9, base[2])                       # single-vector label
    add(35, None, base[3])                    # NULL label group...
    add(36, None, base[3])                    # ...with two members
    add(37, 4, np.full(64, 1e-30))            # denormal-ish tiny
    add(38, 4, np.full(64, 1.0))              # constant vector
    add(39, 4, -base[4])                      # exact negation
    # --- failed-encoder output (round-8 extension): the
    # valid_embeddings ingest gate must exclude ALL of these
    # identically in both engines — NaN comparison semantics differ
    # between SQL (NaN greatest) and numpy kernels (False), so a
    # single leaked row forks every cosine/top-k downstream.
    nanvec = base[5].copy(); nanvec[0] = float("nan")
    add(40, 0, nanvec)                        # one NaN element
    add(41, 1, np.full(64, float("inf")))     # all +Inf
    infvec = base[6].copy(); infvec[63] = float("-inf")
    add(42, 2, infvec)                        # one -Inf element
    rows.append((43, 3, None))                # NULL embedding
    nullelem = [float(np.float32(x)) for x in base[7]]
    nullelem[10] = None
    rows.append((44, 4, nullelem))            # NULL element inside
    add(45, 5, np.full(64, 3.0e38))           # float32-max magnitude:
    # finite per-element, but the norm overflows float32 — must
    # survive the gate and agree across engines (both cast to DOUBLE
    # before any arithmetic)
    add(None, 6, base[8])                     # NULL primary key
    return rows


def _events_rows():
    """Timestamp ties, NULL keys/values, malformed props, single-event
    users, extreme timestamps — all inside the driver's 2024-01 window
    except the two deliberate outliers."""
    from datetime import datetime

    def ts(s):
        return datetime.fromisoformat(s)

    return [
        (0, ts("2024-01-01 00:00:00"), 1, "view", 10.0, '{"k": 1}'),
        (1, ts("2024-01-01 00:00:00"), 1, "click", 20.0, '{"k": 2}'),
        # exact ts tie, same user, distinct event ids (ordering rules)
        (2, ts("2024-01-01 00:05:00"), 2, "view", 1.5, '{"k": 3}'),
        (3, ts("2024-01-01 00:05:00"), 2, "purchase", 99.99,
         '{"k": 4}'),
        # NULL group keys
        (4, ts("2024-01-02 10:00:00"), None, "view", 5.0, '{"k": 5}'),
        (5, ts("2024-01-02 10:01:00"), None, "click", 6.0, '{"k": 6}'),
        (6, ts("2024-01-02 11:00:00"), 3, None, 7.0, '{"k": 7}'),
        (7, ts("2024-01-02 11:30:00"), 3, "error", None, '{"k": 8}'),
        # props edge shapes (map-access path)
        (8, ts("2024-01-03 09:00:00"), 4, "signup", 1.0, None),
        (9, ts("2024-01-03 09:10:00"), 4, "view", 2.0, "{}"),
        (10, ts("2024-01-03 09:20:00"), 4, "click", 3.0,
         "not valid json"),
        (11, ts("2024-01-03 09:30:00"), 4, "view", 4.0,
         '{"k": null}'),
        # single-event user
        (12, ts("2024-01-04 12:00:00"), 99, "purchase", 500.0,
         '{"k": 9}'),
        # long same-user chain crossing a session gap
        (13, ts("2024-01-05 08:00:00"), 5, "view", 1.0, '{"k": 1}'),
        (14, ts("2024-01-05 08:10:00"), 5, "click", 2.0, '{"k": 2}'),
        (15, ts("2024-01-05 14:00:00"), 5, "view", 3.0, '{"k": 3}'),
        (16, ts("2024-01-05 14:05:00"), 5, "purchase", 4.0,
         '{"k": 4}'),
        # value extremes (exact decimals keep hash parity meaningful)
        (17, ts("2024-01-06 00:00:00"), 6, "view", 0.0, '{"k": 0}'),
        (18, ts("2024-01-06 00:01:00"), 6, "view", -12.5, '{"k": 1}'),
        (19, ts("2024-01-06 00:02:00"), 6, "view", 1e12, '{"k": 2}'),
        # timestamp outliers
        (20, ts("1970-01-01 00:00:01"), 7, "view", 1.0, '{"k": 1}'),
        (21, ts("2099-12-31 23:59:59"), 7, "click", 2.0, '{"k": 2}'),
        # round-8 extension: non-finite metric values (a crashed
        # emitter writes NaN/Inf doubles) and an undated event —
        # aggregates must agree on NaN/Inf propagation and NULL-ts
        # grouping/ordering between Spark (NULLS FIRST asc) and
        # DuckDB (NULLS LAST asc) defaults
        (22, ts("2024-01-07 08:00:00"), 8, "view", float("nan"),
         '{"k": 1}'),
        (23, ts("2024-01-07 08:05:00"), 8, "click", float("inf"),
         '{"k": 2}'),
        (24, None, 8, "purchase", 10.0, '{"k": 3}'),
        # round-9 extension (ADVICE r8): a NULL event_id tied on ts
        # with row 13 inside user 5's partition — every
        # order-dependent operator tiebreaks ORDER BY ts, event_id,
        # and Spark (NULLS FIRST asc) vs DuckDB (NULLS LAST asc)
        # fork unless the oracles pin NULLS FIRST explicitly
        (None, ts("2024-01-05 08:00:00"), 5, "click", 1.5,
         '{"k": 5}'),
        # round-9 seeded-fuzz pins (literal fixtures for the classes
        # seed 9001 surfaced):
        #  - a JSON-STRING props value: ANSI CAST aborts the engine
        #    where the oracle's digits-only regex yields NULL
        (25, ts("2024-01-07 09:00:00"), 8, "view", 1.0, '{"k": "s"}'),
        #  - a NULL event_type inside a >=3-event session: concat_ws
        #    SKIPS NULLs (trigram shrinks) while SQL || propagates
        #    them (whole path NULL) — user 3 now has 3 events
        (26, ts("2024-01-02 11:10:00"), 3, "view", 2.0, '{"k": 9}'),
        #  - TWO events tied on (ts, NULL event_id) with DIFFERENT
        #    types (seed 10002): without event_type as the final
        #    tiebreak their order — and every transition/path ngram
        #    they form — is engine-defined
        (None, ts("2024-01-05 14:00:00"), 5, "error", 1.0,
         '{"k": 2}'),
        (None, ts("2024-01-05 14:00:00"), 5, "signup", 2.0,
         '{"k": 3}'),
    ]


def _doc_schema():
    return pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())])


def _emb_schema():
    return pa.schema([("vec_id", pa.int64()),
                      ("label", pa.int32()),
                      ("embedding", pa.list_(pa.float32()))])


def _evt_schema():
    return pa.schema([("event_id", pa.int64()),
                      ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()),
                      ("event_type", pa.string()),
                      ("value", pa.float64()),
                      ("props", pa.string())])


def _write(path, schema, rows):
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = [pa.array(c, type=f.type) for c, f in zip(cols, schema)]
    pq.write_table(pa.table(dict(zip(schema.names, arrays)),
                            schema=schema), path)


def _copy_relational(dest, skip=()):
    for t in RELATIONAL:
        if t in skip:
            continue
        shutil.copy(os.path.join(SF_BASE, f"{t}.parquet"),
                    os.path.join(dest, f"{t}.parquet"))


def _empty_like(src_path, dest_path):
    pq.write_table(pq.read_table(src_path).slice(0, 0), dest_path)


def build(dest_root: str = DEFAULT_ROOT, force: bool = False):
    """Write both corpus variants; returns (edge_dir, empty_dir).
    Existing corpora are reused unless ``force`` (the stress-corpus
    convention)."""
    edge = os.path.join(dest_root, "edge")
    empty = os.path.join(dest_root, "empty")
    if force:
        shutil.rmtree(dest_root, ignore_errors=True)
    if not os.path.exists(edge):
        os.makedirs(edge)
        _copy_relational(edge)
        _write(os.path.join(edge, "documents.parquet"), _doc_schema(),
               _documents_rows())
        _write(os.path.join(edge, "embeddings.parquet"), _emb_schema(),
               _embeddings_rows())
        _write(os.path.join(edge, "events.parquet"), _evt_schema(),
               _events_rows())
    if not os.path.exists(empty):
        os.makedirs(empty)
        _copy_relational(empty, skip=("orders", "lineitem"))
        for t in ("orders", "lineitem"):
            _empty_like(os.path.join(SF_BASE, f"{t}.parquet"),
                        os.path.join(empty, f"{t}.parquet"))
        _write(os.path.join(empty, "documents.parquet"), _doc_schema(),
               [])
        _write(os.path.join(empty, "embeddings.parquet"), _emb_schema(),
               [])
        _write(os.path.join(empty, "events.parquet"), _evt_schema(), [])
    return edge, empty


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_ROOT
    e, m = build(root, force=True)
    print(e)
    print(m)
