"""Deterministic gmall-shaped fixtures (FIXTURES.md).

The driver's TPC-H-ish tables cover relational checks; the fixtures
here are the gmall-shaped inputs (nested page-log JSON, CDC
envelopes, table_process config) needed to exercise the DWD/DWM
operators on the reference's actual record shapes: dirty routing,
3-way split, is_new repair, UV dedup, bounce timeout, interval-join
bounds, config routing.

Seeded (42) and pure-Python so tests are reproducible; sequences per
mid deliberately include the edge cases FIXTURES.md §7 lists
(repeat-visit claiming is_new=1, bounce-vs-timeout, same-day and
cross-day revisits, ±5 s / +15 min interval-join boundaries, ~1%
malformed JSON, CDC deletes and unknown tables).
"""

from __future__ import annotations

import json
import random

BASE_TS = 1_600_000_000_000  # 2020-09-13 12:26:40 UTC, fixed epoch millis
MINUTE = 60_000
DAY = 86_400_000

PAGES = ["home", "good_list", "good_detail", "cart", "trade", "payment"]
KEYWORD_PHRASES = ["apple phone case", "red dress", "running shoes men",
                   "apple watch band", "red running shoes"]


def _common(rng: random.Random, mid: int, is_new: str) -> dict:
    return {
        "mid": f"mid_{mid}",
        "uid": str(100 + mid),
        "vc": f"v2.1.{mid % 3}",
        "ch": ["huawei", "xiaomi", "appstore"][mid % 3],
        "ar": ["110000", "310000", "440000"][mid % 3],
        "ba": "brand", "md": "model", "os": "os13",
        "is_new": is_new,
    }


def page_log_lines(n_mids: int = 20, dirty_every: int = 97) -> list[str]:
    """Raw ods_base_log lines: JSON page/start/display events plus a
    sprinkle of malformed records (P1's dirty path)."""
    rng = random.Random(42)
    lines: list[str] = []
    for mid in range(n_mids):
        # day-0 session: start event then a short page walk
        t = BASE_TS + mid * 13_000
        lines.append(json.dumps({
            "common": _common(rng, mid, "1"),
            "start": {"entry": "icon", "loading_time": rng.randint(500, 3000),
                      "open_ad_id": 1, "open_ad_ms": 120, "open_ad_skip_ms": 0},
            "ts": t,
        }))
        last = None
        n_pages = 1 if mid % 5 == 0 else rng.randint(2, 4)
        for i in range(n_pages):
            t += 2_000 if mid % 7 else 11 * MINUTE  # some sessions time out
            page_id = PAGES[(mid + i) % len(PAGES)]
            page = {
                "page_id": page_id,
                "last_page_id": last,
                "during_time": rng.randint(1000, 30_000),
            }
            if page_id == "good_detail":
                page["item"] = str(rng.randint(1, 9))
                page["item_type"] = "sku_id"
            elif page_id == "good_list":
                page["item"] = rng.choice(KEYWORD_PHRASES)
                page["item_type"] = "keyword"
            ev = {"common": _common(rng, mid, "1" if mid % 4 == 0 else "0"),
                  "page": page, "ts": t}
            if page_id in ("home", "good_list"):
                ev["displays"] = [
                    {"item": str(rng.randint(1, 9)), "item_type": "sku_id",
                     "order": k, "pos_id": k}
                    for k in range(rng.randint(1, 4))]
            lines.append(json.dumps(ev))
            last = page_id
        # day-0 same-day revisit (UV dedup case) + day-1 revisit still
        # claiming is_new=1 (repair case)
        if mid % 3 == 0:
            lines.append(json.dumps({
                "common": _common(rng, mid, "0"),
                "page": {"page_id": "home", "last_page_id": None,
                         "during_time": 1500},
                "ts": BASE_TS + 6 * 3_600_000 + mid,
            }))
        if mid % 2 == 0:
            lines.append(json.dumps({
                "common": _common(rng, mid, "1"),  # lying: repaired to 0
                "page": {"page_id": "home", "last_page_id": None,
                         "during_time": 900},
                "ts": BASE_TS + DAY + mid * 1000,
            }))
    for i in range(0, len(lines), dirty_every):
        lines.insert(i, "not-a-json-record{{{")
    return lines


def _cdc(table: str, typ: str, data: dict, before: dict | None = None) -> dict:
    return {"database": "gmall2021", "table": table, "type": typ,
            "data": json.dumps(data),
            "before_data": json.dumps(before or {})}


def cdc_rows() -> list[dict]:
    """ods_base_db envelope rows: order_info/order_detail/payment_info
    chains with interval-join boundary cases, dim rows, deletes, and
    an unknown table (drop path)."""
    rng = random.Random(43)
    rows: list[dict] = []
    fmt = "%Y-%m-%d %H:%M:%S"
    import datetime as dt

    def t(ms: int) -> str:
        return dt.datetime.utcfromtimestamp(ms / 1000).strftime(fmt)

    for oid in range(1, 11):
        order_ts = BASE_TS + oid * MINUTE
        total = round(rng.uniform(50, 500), 2)
        rows.append(_cdc("order_info", "insert", {
            "id": oid, "province_id": 1 + oid % 3, "order_status": "1001",
            "user_id": 100 + oid % 5, "total_amount": total,
            "activity_reduce_amount": 0, "coupon_reduce_amount": 0,
            "original_total_amount": total, "feight_fee": 5,
            "expire_time": t(order_ts + 15 * MINUTE),
            "create_time": t(order_ts), "operate_time": t(order_ts),
        }))
        # details: one exactly at +5 s (inclusive bound), one far out
        # of window for odd orders
        for j, off in enumerate([0, 5_000] if oid % 2 else [0, 60_000]):
            rows.append(_cdc("order_detail", "insert", {
                "id": oid * 10 + j, "order_id": oid, "sku_id": 1 + (oid + j) % 9,
                "order_price": round(total / 2, 2), "sku_num": 1 + j,
                "sku_name": f"sku {1 + (oid + j) % 9}",
                "create_time": t(order_ts + off),
                "split_total_amount": round(total / 2, 2),
                "split_activity_amount": 0, "split_coupon_amount": 0,
            }))
        # payment exactly at +15 min for some, beyond for others
        pay_off = 15 * MINUTE if oid % 3 else 16 * MINUTE
        rows.append(_cdc("payment_info", "insert", {
            "id": 1000 + oid, "order_id": oid, "user_id": 100 + oid % 5,
            "total_amount": total, "subject": "order",
            "payment_type": ["1101", "1102", "1103"][oid % 3],
            "create_time": t(order_ts + pay_off),
            "callback_time": t(order_ts + pay_off + 2_000),
        }))
    # the other four ProductStats sources (P6's 7-stream union):
    # favor, cart, refund, comment
    for i in range(1, 6):
        t0 = BASE_TS + i * 2 * MINUTE
        rows.append(_cdc("favor_info", "insert", {
            "id": 500 + i, "user_id": 100 + i % 5, "sku_id": 1 + i % 9,
            "create_time": t(t0)}))
        rows.append(_cdc("cart_info", "insert", {
            "id": 600 + i, "user_id": 100 + i % 5, "sku_id": 1 + (i + 1) % 9,
            "sku_num": 1 + i % 3, "create_time": t(t0 + 30_000)}))
    for i in range(1, 4):
        t0 = BASE_TS + 30 * MINUTE + i * MINUTE
        rows.append(_cdc("order_refund_info", "insert", {
            "id": 700 + i, "order_id": i, "sku_id": 1 + i % 9,
            "refund_amount": 19.90, "create_time": t(t0)}))
        rows.append(_cdc("comment_info", "insert", {
            "id": 800 + i, "order_id": i, "sku_id": 1 + i % 9,
            "appraise": "1201" if i % 2 else "1202",  # good='1201'
            "create_time": t(t0 + 10_000)}))
    for sku in range(1, 10):
        rows.append(_cdc("sku_info", "insert", {
            "id": sku, "sku_name": f"sku {sku}", "price": 10 * sku,
            "spu_id": 1 + sku % 3, "category3_id": 1 + sku % 4,
            "tm_id": 1 + sku % 3}))
    rows.append(_cdc("base_trademark", "insert", {"id": 1, "tm_name": "tm-a"}))
    rows.append(_cdc("base_trademark", "insert", {"id": 2, "tm_name": "tm-b"}))
    rows.append(_cdc("base_trademark", "insert", {"id": 3, "tm_name": "tm-c"}))
    for uid in range(100, 105):
        rows.append(_cdc("user_info", "insert", {
            "id": uid, "birthday": f"19{60 + uid % 40}-0{1 + uid % 9}-15",
            "gender": "F" if uid % 2 else "M"}))
    for pid in range(1, 4):
        rows.append(_cdc("base_province", "insert", {
            "id": pid, "name": f"province_{pid}",
            "area_code": f"{110000 + pid}", "iso_code": f"CN-{pid}",
            "iso_3166_2": f"CN-P{pid}"}))
    for spu in range(1, 4):
        rows.append(_cdc("spu_info", "insert",
                         {"id": spu, "spu_name": f"spu {spu}"}))
    for c3 in range(1, 5):
        rows.append(_cdc("base_category3", "insert",
                         {"id": c3, "name": f"cat3_{c3}"}))
    rows.append(_cdc("order_info", "delete", {"id": 1}))          # P2 drop
    rows.append(_cdc("mystery_table", "insert", {"id": 1}))       # J4 drop
    return rows


def table_process_rows() -> list[dict]:
    """table_process config: facts → kafka, dims → hbase
    (bean/TableProcess.java:5-32)."""
    facts = {
        "order_info": "id,province_id,order_status,user_id,total_amount,"
                      "create_time",
        "order_detail": "id,order_id,sku_id,order_price,sku_num,sku_name,"
                        "create_time",
        "payment_info": "id,order_id,user_id,total_amount,payment_type,"
                        "create_time",
        "favor_info": "id,user_id,sku_id,create_time",
        "cart_info": "id,user_id,sku_id,sku_num,create_time",
        "order_refund_info": "id,order_id,sku_id,refund_amount,create_time",
        "comment_info": "id,order_id,sku_id,appraise,create_time",
    }
    dims = {
        "sku_info": "id,sku_name,price,spu_id,category3_id,tm_id",
        "base_trademark": "id,tm_name",
        "user_info": "id,birthday,gender",
        "base_province": "id,name,area_code,iso_code,iso_3166_2",
        "spu_info": "id,spu_name",
        "base_category3": "id,name",
    }
    rows = [{"source_table": s, "operate_type": "insert",
             "sink_type": "kafka", "sink_table": f"dwd_{s}",
             "sink_columns": c, "sink_pk": "id", "sink_extend": None}
            for s, c in facts.items()]
    rows += [{"source_table": s, "operate_type": "insert",
              "sink_type": "hbase", "sink_table": f"dim_{s}",
              "sink_columns": c, "sink_pk": "id", "sink_extend": None}
             for s, c in dims.items()]
    return rows
