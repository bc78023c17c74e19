"""Seeded property-based corpus generator (VERDICT r8 #3).

The fixed-literal adversarial corpora (adversarial_corpus.py) pin
the edges we thought of; this module generates the edges a GENERATOR
thinks of: every draw — NULL density per column, script mix per
text, duplicate-group sizes, key overlap, timestamp ties, dirty
metric values — comes from one seeded RNG, so any parity divergence
reproduces bit-for-bit from its seed.

The generator stays inside the engine's documented dirty-data
contracts (README): non-finite doubles appear only in events.value
and embedding elements; ``n_chars`` is the codepoint length of text
(NULL text -> NULL n_chars) per the driver generator's contract;
NULL is fair game for every other column including primary keys.

Usage:
    from fuzz_corpus import build_seeded
    sf_dir = build_seeded("/tmp/gmall_fuzz", seed=9001)

or  python tests/run_seeded_fuzz.py 9001 9002 ...
"""

from __future__ import annotations

import datetime
import os
import random
import shutil

import numpy as np
import pyarrow as pa

try:                                   # pytest package context
    from .adversarial_corpus import (
        _copy_relational, _doc_schema, _emb_schema, _evt_schema,
        _write)
except ImportError:                    # script context (dev tools)
    from adversarial_corpus import (
        _copy_relational, _doc_schema, _emb_schema, _evt_schema,
        _write)

_LATIN = ("data query plan spark merge scan filter join sort shuffle "
          "window state stream batch table column row group order "
          "the a an of to in on with for model train token corpus "
          "dedup shard split sample quality language").split()
_HAN = "数据库查询优化器执行计划分区排序合并扫描流批处理状态窗口"
_PUNCT = list("!?.,;:#-()[]\"'$%&*")
_LANGS = ["en", "de", "fr", "es", "zh", None, "", "xx"]
_EVENT_TYPES = ["view", "click", "purchase", "signup", "error",
                None, "scroll"]


def _text(rng: random.Random) -> str | None:
    """One random document text: script mix, length, whitespace and
    degenerate shapes all drawn from the seed."""
    shape = rng.random()
    if shape < 0.04:
        return None
    if shape < 0.07:
        return ""
    if shape < 0.10:
        return rng.choice([" ", "  \t ", "\n\n", " \t\n "])
    n = rng.choice([1, 2, 5, 12, 40, 120])
    parts = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.55:
            parts.append(rng.choice(_LATIN))
        elif kind < 0.70:
            i = rng.randrange(len(_HAN) - 4)
            parts.append(_HAN[i:i + rng.randint(1, 4)])
        elif kind < 0.80:
            parts.append(str(rng.randrange(10 ** rng.randint(1, 6))))
        elif kind < 0.88:
            parts.append(rng.choice(_PUNCT))
        elif kind < 0.93:
            parts.append(rng.choice(_LATIN).upper())
        elif kind < 0.97:
            parts.append(rng.choice(_LATIN) + rng.choice(_PUNCT))
        else:
            parts.append("café")  # combining mark
    sep = " " if rng.random() < 0.9 else rng.choice(["  ", "\t", " \n"])
    return sep.join(parts)


def _documents_rows(rng: random.Random, n_docs: int):
    rows = []
    next_id = 0

    def add(text, lang, source, doc_id="auto"):
        nonlocal next_id
        if doc_id == "auto":
            doc_id = next_id if rng.random() > 0.05 else None
            next_id += 1
        n_chars = None if text is None else len(text)
        rows.append((doc_id, text, lang, source, n_chars))

    n_sources = rng.randint(3, 8)
    sources = [f"src{i}" for i in range(n_sources)] + [None]
    while len(rows) < n_docs:
        text = _text(rng)
        lang = rng.choice(_LANGS)
        add(text, lang, rng.choice(sources))
        if text and rng.random() < 0.25:
            # duplicate group: exact copies across random sources,
            # sometimes a near-dup (one token perturbed)
            for _ in range(rng.randint(1, 3)):
                t = text
                if rng.random() < 0.3:
                    t = text + " " + rng.choice(_LATIN)
                add(t, rng.choice(_LANGS), rng.choice(sources))
    return rows


def _embeddings_rows(rng: random.Random, n_vecs: int):
    nrng = np.random.default_rng(rng.randrange(2 ** 31))
    rows = []
    next_id = 0

    def add(vec, label="auto"):
        nonlocal next_id
        vec_id = next_id if rng.random() > 0.05 else None
        next_id += 1
        if label == "auto":
            label = rng.choice([0, 1, 2, 3, 4, None])
        lst = (None if vec is None
               else [None if x is None else float(np.float32(x))
                     for x in vec])
        rows.append((vec_id, label, lst))

    base = nrng.normal(size=(n_vecs, 64))
    i = 0
    while len(rows) < n_vecs:
        kind = rng.random()
        if kind < 0.60:
            add(base[i % n_vecs]); i += 1
        elif kind < 0.72 and i:
            add(base[rng.randrange(i)])        # exact duplicate
        elif kind < 0.80 and i:
            add(base[rng.randrange(i)]
                + 1e-4 * nrng.normal(size=64))  # near-duplicate
        elif kind < 0.84:
            add(np.zeros(64))
        elif kind < 0.87:
            add(np.full(64, rng.choice([1.0, -1.0, 1e-30])))
        else:
            # failed-encoder shapes the valid_embeddings gate owns
            v = base[i % n_vecs].copy(); i += 1
            bad = rng.choice(["nan", "inf", "-inf", "null_el",
                              "huge", "null_vec"])
            if bad == "null_vec":
                add(None)
                continue
            j = rng.randrange(64)
            v = list(v)
            v[j] = {"nan": float("nan"), "inf": float("inf"),
                    "-inf": float("-inf"), "null_el": None,
                    "huge": rng.choice([101.0, 1e30, -5e4]),
                    }[bad]
            add(v)
    return rows


def _events_rows(rng: random.Random, n_events: int):
    base = datetime.datetime(2024, 1, 1)
    n_users = rng.randint(4, 15)
    # quantized timestamp pool ⇒ deliberate ties within and across
    # users (the tiebreak-divergence class)
    ts_pool = [base + datetime.timedelta(
        minutes=rng.randrange(0, 60 * 24 * 5))
        for _ in range(max(8, n_events // 3))]
    rows = []
    for i in range(n_events):
        event_id = i if rng.random() > 0.04 else None
        ts = rng.choice(ts_pool) if rng.random() > 0.03 else None
        user = rng.randrange(n_users) if rng.random() > 0.04 else None
        etype = rng.choice(_EVENT_TYPES)
        r = rng.random()
        if r < 0.04:
            value = None
        elif r < 0.06:
            value = rng.choice([float("nan"), float("inf"),
                                float("-inf")])
        elif r < 0.10:
            value = rng.choice([0.0, -12.5, 1e12, 0.01])
        else:
            value = round(rng.uniform(0, 500), 2)
        pr = rng.random()
        if pr < 0.70:
            props = '{"k": %d}' % rng.randrange(100)
        else:
            props = rng.choice(["{}", None, "not valid json",
                                '{"k": null}', '{"j": 1}',
                                '{"k": "s"}'])
        rows.append((event_id, ts, user, etype, value, props))
    return rows


def _dirty_relational(dest: str, rng: random.Random) -> None:
    """Copy the sf0.001 relational tables but inject NULLs into a
    seeded sample of orders/lineitem/part/supplier/customer rows —
    foreign keys, dates, statuses, prices, balances (NULL, never
    NaN/Inf: the warehouse dirty-data contract excludes non-finites
    but a loader CAN emit NULLs). Injection is per-column independent
    so mixed-shape rows occur.

    Money-boundary axis (VERDICT r9 #3): a seeded sample of
    o_totalprice values is boosted into the 3e13–8.9e13 range so
    daily / per-customer / running SUMS approach and cross 2^53
    unscaled cents — the magnitude where DuckDB's direct
    decimal->double presentation forks from Spark's (closed by the
    VARCHAR route in registry._doubled_sql). Boosted values land on
    the 0.25 grid AND stay below 9.0e13 per row: the INPUT
    conversion double->decimal(18,2) is only unambiguous while the
    cent count is double-representable (< 2^53) — DuckDB multiplies
    by 10^scale in double (116831905763043.25 -> .24), Spark casts
    the shortest repr (-> .25), so raw-double money above ~9.0e13 is
    outside the input contract (probed seed 20010; real prices are
    ~1e5).  l_extendedprice boosts stay under 1e12 (the Q1 oracle's
    per-row DECIMAL(18) disc multiplication width) where the double
    grid is still finer than a cent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    null_cols = {
        "orders": ["o_custkey", "o_orderdate", "o_orderstatus",
                   "o_totalprice", "o_orderpriority"],
        "lineitem": ["l_partkey", "l_suppkey", "l_shipdate",
                     "l_returnflag", "l_quantity", "l_discount"],
        "part": ["p_brand", "p_type", "p_size", "p_retailprice"],
        "supplier": ["s_nationkey", "s_acctbal"],
        "customer": ["c_nationkey", "c_mktsegment", "c_acctbal"],
    }
    _copy_relational(dest, skip=tuple(null_cols))
    for t, cols in null_cols.items():
        tab = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        n = tab.num_rows
        arrays = {}
        for name in tab.schema.names:
            col = tab.column(name).to_pylist()
            if name in cols:
                for _ in range(max(1, n // 80)):   # ~1.2% per column
                    col[rng.randrange(n)] = None
            if name == "o_totalprice":
                # 2^53-crossing SUMS: ~1% of orders at 3e13–8.9e13,
                # snapped to the 0.25 grid (see docstring)
                for _ in range(max(2, n // 100)):
                    i = rng.randrange(n)
                    if col[i] is not None:
                        col[i] = rng.randrange(
                            int(3e13 * 4), int(8.9e13 * 4)) / 4.0
            if name == "l_extendedprice":
                for _ in range(max(2, n // 200)):
                    i = rng.randrange(n)
                    if col[i] is not None:
                        col[i] = round(rng.uniform(1e11, 9.9e11), 2)
            arrays[name] = pa.array(col, type=tab.schema.field(name).type)
        pq.write_table(pa.table(arrays, schema=tab.schema),
                       os.path.join(dest, f"{t}.parquet"))


def build_seeded(dest_root: str, seed: int, n_docs: int = 90,
                 n_vecs: int = 60, n_events: int = 350,
                 force: bool = False,
                 relational_dirt: bool = False) -> str:
    """Write one seeded corpus under ``dest_root/seed{seed}`` with
    the canonical table schemas; returns the directory. Relational
    tables are copied from sf0.001 clean by default;
    ``relational_dirt=True`` (seeds ≥ 20000 by the dev-tool
    convention) additionally NULL-injects orders/lineitem columns."""
    dest = os.path.join(dest_root, f"seed{seed}")
    if force:
        shutil.rmtree(dest, ignore_errors=True)
    if os.path.exists(dest):
        return dest
    os.makedirs(dest)
    rng = random.Random(seed)
    if relational_dirt:
        _dirty_relational(dest, rng)
    else:
        _copy_relational(dest)
    _write(os.path.join(dest, "documents.parquet"), _doc_schema(),
           _documents_rows(rng, n_docs))
    _write(os.path.join(dest, "embeddings.parquet"), _emb_schema(),
           _embeddings_rows(rng, n_vecs))
    _write(os.path.join(dest, "events.parquet"), _evt_schema(),
           _events_rows(rng, n_events))
    return dest
