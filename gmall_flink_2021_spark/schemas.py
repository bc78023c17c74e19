"""StructType schemas for the gmall data model.

Derived from the reference beans and JSON shapes (SURVEY.md §1.2):
 - behavior log event: nested common/page/displays/start/ts JSON
   (reference reads fields at gmall-realtime/.../app/dwd/BaseLogApp.java:52-147)
 - CDC envelope: {database, table, type, data, before-data}
   (gmall-realtime/.../app/func/MyDeserializerFunc.java:52-62)
 - fact beans: OrderInfo/OrderDetail/PaymentInfo
   (bean/OrderInfo.java:7-24, bean/OrderDetail.java:8-21, bean/PaymentInfo.java:8-17)
 - stats rows: VisitorStats/ProductStats/ProvinceStats/KeywordStats
   (bean/VisitorStats.java:11-36, bean/ProductStats.java:20-88,
    app/bean/ProvinceStats.java:15-41, bean/KeywordStats.java:13-20)

Monetary amounts are DECIMAL(16,2) end-to-end, matching the
reference's BigDecimal columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MONEY = DecimalType(16, 2)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# ---------------------------------------------------------------- page log
COMMON_SCHEMA = _s(
    _f("mid", StringType()),
    _f("uid", StringType()),
    _f("vc", StringType()),
    _f("ch", StringType()),
    _f("ar", StringType()),
    _f("ba", StringType()),
    _f("md", StringType()),
    _f("os", StringType()),
    _f("is_new", StringType()),
)

PAGE_SCHEMA = _s(
    _f("page_id", StringType()),
    _f("last_page_id", StringType()),
    _f("item", StringType()),
    _f("item_type", StringType()),
    _f("during_time", LongType()),
    _f("source_type", StringType()),
)

DISPLAY_SCHEMA = _s(
    _f("item", StringType()),
    _f("item_type", StringType()),
    _f("display_type", StringType()),
    _f("order", LongType()),
    _f("pos_id", LongType()),
)

START_SCHEMA = _s(
    _f("entry", StringType()),
    _f("loading_time", LongType()),
    _f("open_ad_id", LongType()),
    _f("open_ad_ms", LongType()),
    _f("open_ad_skip_ms", LongType()),
)

# The full ods_base_log event (one JSON document per row).
PAGE_LOG_SCHEMA = _s(
    _f("common", COMMON_SCHEMA),
    _f("page", PAGE_SCHEMA),
    _f("displays", ArrayType(DISPLAY_SCHEMA)),
    _f("start", START_SCHEMA),
    _f("ts", LongType()),
)

# ---------------------------------------------------------------- CDC
# MyDeserializerFunc.java:52-62 — "before-data" renamed to before_data
# (Spark column names cannot contain '-'; readers map it).
CDC_SCHEMA = _s(
    _f("database", StringType()),
    _f("table", StringType()),
    _f("type", StringType()),
    _f("data", StringType()),
    _f("before_data", StringType()),
)

# table_process routing config (bean/TableProcess.java:5-32).
TABLE_PROCESS_SCHEMA = _s(
    _f("source_table", StringType()),
    _f("operate_type", StringType()),
    _f("sink_type", StringType()),
    _f("sink_table", StringType()),
    _f("sink_columns", StringType()),
    _f("sink_pk", StringType()),
    _f("sink_extend", StringType()),
)

# ---------------------------------------------------------------- facts
ORDER_INFO_SCHEMA = _s(
    _f("id", LongType()),
    _f("province_id", LongType()),
    _f("order_status", StringType()),
    _f("user_id", LongType()),
    _f("total_amount", MONEY),
    _f("activity_reduce_amount", MONEY),
    _f("coupon_reduce_amount", MONEY),
    _f("original_total_amount", MONEY),
    _f("feight_fee", MONEY),
    _f("expire_time", StringType()),
    _f("create_time", StringType()),
    _f("operate_time", StringType()),
)

ORDER_DETAIL_SCHEMA = _s(
    _f("id", LongType()),
    _f("order_id", LongType()),
    _f("sku_id", LongType()),
    _f("order_price", MONEY),
    _f("sku_num", LongType()),
    _f("sku_name", StringType()),
    _f("create_time", StringType()),
    _f("split_total_amount", MONEY),
    _f("split_activity_amount", MONEY),
    _f("split_coupon_amount", MONEY),
)

PAYMENT_INFO_SCHEMA = _s(
    _f("id", LongType()),
    _f("order_id", LongType()),
    _f("user_id", LongType()),
    _f("total_amount", MONEY),
    _f("subject", StringType()),
    _f("payment_type", StringType()),
    _f("create_time", StringType()),
    _f("callback_time", StringType()),
)

# ProductStats side sources (app/dws/ProductStatsApp.java:139-191)
FAVOR_INFO_SCHEMA = _s(
    _f("id", LongType()), _f("user_id", LongType()),
    _f("sku_id", LongType()), _f("create_time", StringType()),
)

CART_INFO_SCHEMA = _s(
    _f("id", LongType()), _f("user_id", LongType()),
    _f("sku_id", LongType()), _f("sku_num", LongType()),
    _f("create_time", StringType()),
)

ORDER_REFUND_INFO_SCHEMA = _s(
    _f("id", LongType()), _f("order_id", LongType()),
    _f("sku_id", LongType()), _f("refund_amount", MONEY),
    _f("create_time", StringType()),
)

COMMENT_INFO_SCHEMA = _s(
    _f("id", LongType()), _f("order_id", LongType()),
    _f("sku_id", LongType()), _f("appraise", StringType()),
    _f("create_time", StringType()),
)
