"""Literal fixture pins for the round-9 relational-dirt fuzz finds
(seeds 20001/20003), independent of seed rotation.

The corpus is sf0.001 with a handful of literally-appended dirty
rows: a NULL-suppkey late line (sole_late_suppliers must not count
an unattributable line the correlated NOT-EXISTS form never counts),
NULL order prices (winsorized quantile ranks must not be occupied by
absent measurements — Spark sorts NULLS FIRST, SQL NULLS LAST),
undated orders and undated/keyless lineitems (the SCD2 as-of window
would carry a NULL-dated version into everything after on one side
only), and an undated order under the running-GMV window (its NULL
day group enters the cumulative FIRST on Spark, LAST in SQL,
shifting every value by a constant).
"""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .adversarial_corpus import RELATIONAL, SF_BASE
from .parity import compare, duck_connect

AFFECTED = ["sole_late_suppliers", "winsorized_price_stats",
            "scd2_dim_join", "gmv_daily_delta", "pricing_summary",
            "late_shipment_priority", "priority_rollup"]


def _append(src, dest, extra_rows):
    tab = pq.read_table(src)
    cols = {n: tab.column(n).to_pylist() for n in tab.schema.names}
    for row in extra_rows:
        for n in tab.schema.names:
            cols[n].append(row.get(n))
    pq.write_table(pa.table(
        {n: pa.array(cols[n], type=tab.schema.field(n).type)
         for n in tab.schema.names}, schema=tab.schema), dest)


@pytest.fixture(scope="module")
def rel_edge_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rel_edge"))
    for t in RELATIONAL + ("events", "documents", "embeddings"):
        if t in ("orders", "lineitem"):
            continue
        shutil.copy(os.path.join(SF_BASE, f"{t}.parquet"),
                    os.path.join(root, f"{t}.parquet"))
    d = datetime.datetime(1995, 6, 1)
    _append(os.path.join(SF_BASE, "orders.parquet"),
            os.path.join(root, "orders.parquet"), [
        # NULL price in every priority (occupies no quantile rank)
        {"o_orderkey": 900001, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": None, "o_orderdate": d,
         "o_orderpriority": "1-URGENT"},
        # undated order: out of the SCD2 version timeline AND the
        # running-GMV axis; keyless-date combos too
        {"o_orderkey": 900002, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 1000.0, "o_orderdate": None,
         "o_orderpriority": "2-HIGH"},
        # finished multi-supplier order for the late-line pin
        {"o_orderkey": 900003, "o_custkey": 2, "o_orderstatus": "F",
         "o_totalprice": 500.0, "o_orderdate": d,
         "o_orderpriority": "3-MEDIUM"},
    ])
    late = d + datetime.timedelta(days=120)
    _append(os.path.join(SF_BASE, "lineitem.parquet"),
            os.path.join(root, "lineitem.parquet"), [
        # one on-time line from supplier 1, one late line from
        # supplier 2, and one late line with NO supplier identity —
        # supplier 2 is the sole late shipper; the NULL-suppkey late
        # line must not inflate its numwait
        {"l_orderkey": 900003, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 1, "l_quantity": 1.0,
         "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "F", "l_shipdate": d},
        {"l_orderkey": 900003, "l_partkey": 2, "l_suppkey": 2,
         "l_linenumber": 2, "l_quantity": 1.0,
         "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "F", "l_shipdate": late},
        {"l_orderkey": 900003, "l_partkey": 3, "l_suppkey": None,
         "l_linenumber": 3, "l_quantity": 1.0,
         "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "F", "l_shipdate": late},
        # undated and keyless facts: out of the SCD2 domain
        {"l_orderkey": 900003, "l_partkey": 4, "l_suppkey": 1,
         "l_linenumber": 4, "l_quantity": 1.0,
         "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "F", "l_shipdate": None},
        {"l_orderkey": None, "l_partkey": 5, "l_suppkey": 1,
         "l_linenumber": 5, "l_quantity": 1.0,
         "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "F", "l_shipdate": d},
    ])
    return root


@pytest.mark.parametrize("name", AFFECTED)
def test_relational_edge_corpus_parity(spark, rel_edge_corpus, name):
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES

    problems = compare(QUERIES[name](spark, rel_edge_corpus),
                       ORACLES[name], duck_connect(rel_edge_corpus))
    assert not problems, problems


def test_sole_late_supplier_excludes_unattributable_lines(
        spark, rel_edge_corpus):
    """Order 900003: supplier 2 is the sole late shipper; its numwait
    counts ONE late line (its own), not the NULL-suppkey one."""
    from gmall_flink_2021_spark.plans import QUERIES

    rows = {r.s_name: r.numwait for r in
            QUERIES["sole_late_suppliers"](
                spark, rel_edge_corpus).collect()}
    planted = [v for k, v in rows.items()
               if k == "Supplier#000000002"]
    assert planted and planted[0] >= 1
