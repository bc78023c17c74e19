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


# ---------------------------------------------------------------------------
# 2^53 decimal->double presentation edge (VERDICT r9 #3)
# ---------------------------------------------------------------------------
# The registry presents exact-DECIMAL aggregates as DOUBLE on both
# sides.  DuckDB's direct CAST(decimal AS DOUBLE) double-rounds
# (unscaled int -> double, then /10^scale) and forks from Spark's
# correctly-rounded BigDecimal.doubleValue once |unscaled| >= 2^53;
# the oracle presentation therefore routes through VARCHAR
# (registry._doubled_sql).  This corpus plants order/lineitem groups
# whose cent sums land EXACTLY in the forking neighborhood —
# 2^53 - 45 (safe either way) and 2^53 + 5 (a probed fork under the
# direct cast) — plus a running total that crosses the boundary
# mid-window, so any regression to the direct cast fails these pins.

# 45035996273704.25 is exactly representable as a double (x*4 < 2^53)
# and as DECIMAL(18,2); two of them put a group 142 cents below 2^53.
_HALF = 45035996273704.25
MONEY_EDGE_QUERIES = ["gmv_daily", "gmv_daily_delta", "pricing_summary"]


@pytest.fixture(scope="module")
def money_edge_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("money_edge"))
    for t in RELATIONAL + ("events", "documents", "embeddings"):
        if t in ("orders", "lineitem"):
            continue
        shutil.copy(os.path.join(SF_BASE, f"{t}.parquet"),
                    os.path.join(root, f"{t}.parquet"))

    def order(key, day, price):
        return {"o_orderkey": key, "o_custkey": 1,
                "o_orderstatus": "F", "o_totalprice": price,
                "o_orderdate": day, "o_orderpriority": "1-URGENT"}

    d_below = datetime.datetime(2035, 1, 1)   # day sum = 2^53 - 45 cents
    d_above = datetime.datetime(2035, 1, 2)   # day sum = 2^53 + 5 cents
    d_tail = datetime.datetime(2035, 1, 3)    # running sum stays > 2^53
    _append(os.path.join(SF_BASE, "orders.parquet"),
            os.path.join(root, "orders.parquet"), [
        order(910001, d_below, _HALF),
        order(910002, d_below, _HALF),
        order(910003, d_below, 0.97),
        order(910004, d_above, _HALF),
        order(910005, d_above, _HALF),
        order(910006, d_above, 1.47),
        order(910007, d_tail, 12.34),
    ])

    def line(pk, price):
        # isolated Q1 group (returnflag/linestatus "Z"/"Z"); zero
        # discount/tax keep the three price sums identical so all
        # land on the planted boundary value
        return {"l_orderkey": 910001, "l_partkey": pk, "l_suppkey": 1,
                "l_linenumber": pk, "l_quantity": 1.0,
                "l_extendedprice": price, "l_discount": 0.0,
                "l_tax": 0.0, "l_returnflag": "Z", "l_linestatus": "Z",
                "l_shipdate": datetime.datetime(1995, 1, 1)}

    # per-row prices stay below 10^12 dollars: the Q1 oracle's
    # per-row disc-price multiplication rescales inside DECIMAL(18)
    # (18 significant digits), which a 4.5e12 price already
    # overflows — the SUM is what must land on 2^53, not the rows.
    # 199 x 450359962737.25 + 450359962697.22 = 2^53 + 5 cents
    # (both double-exact / round-trip-stable; pinned below)
    big = 450359962737.25
    _append(os.path.join(SF_BASE, "lineitem.parquet"),
            os.path.join(root, "lineitem.parquet"),
            [line(pk, big) for pk in range(1, 200)]
            + [line(200, 450359962697.22)])
    return root


def test_money_edge_corpus_sits_on_the_boundary(money_edge_corpus):
    """Guard against silent fixture drift: the planted day sums land
    at exactly 2^53 - 45 and 2^53 + 5 cents under exact decimal
    arithmetic."""
    import decimal

    h = decimal.Decimal("45035996273704.25")
    below = 2 * h + decimal.Decimal("0.97")
    above = 2 * h + decimal.Decimal("1.47")
    assert int(below.scaleb(2)) == 2 ** 53 - 45
    assert int(above.scaleb(2)) == 2 ** 53 + 5
    # the lineitem group lands on 2^53 + 5 as well
    q1 = 199 * decimal.Decimal("450359962737.25") \
        + decimal.Decimal("450359962697.22")
    assert int(q1.scaleb(2)) == 2 ** 53 + 5
    # and the planted prices are double-stable: the big one is
    # exactly representable, the corrector's nearest double rounds
    # back to the same 2-dp decimal on both engines (HALF_UP on the
    # shortest repr == round of the true binary value here)
    assert decimal.Decimal(45035996273704.25) == h
    assert decimal.Decimal(450359962737.25) \
        == decimal.Decimal("450359962737.25")
    assert decimal.Decimal(float(decimal.Decimal("450359962697.22"))) \
        .quantize(decimal.Decimal("0.01"),
                  rounding=decimal.ROUND_HALF_UP) \
        == decimal.Decimal("450359962697.22")


@pytest.mark.parametrize("name", MONEY_EDGE_QUERIES)
def test_decimal_double_presentation_2e53(spark, money_edge_corpus,
                                          name):
    """Hash parity at/over the 2^53 unscaled boundary: the planted
    groups sum to 2^53±epsilon cents, where DuckDB's direct
    decimal->double cast forks from Spark (probed round 10: e.g.
    unscaled 2^53+5 -> ...409.97 Spark vs ...409.95 direct-cast
    DuckDB).  Passes only through the VARCHAR presentation route."""
    from gmall_flink_2021_spark.plans import ORACLES, QUERIES

    problems = compare(QUERIES[name](spark, money_edge_corpus),
                       ORACLES[name], duck_connect(money_edge_corpus))
    assert not problems, problems
