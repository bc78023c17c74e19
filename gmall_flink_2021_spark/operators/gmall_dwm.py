"""The gmall-shaped DWM pipeline: typed fact parsing, the two interval
joins with the reference's exact bounds, and the 6-dim enrichment
chain — the OrderWideApp/PaymentWideApp jobs re-expressed as pure
DataFrame transforms that run in batch and (with watermarks) in
Structured Streaming.

Reference parity:
 - bean conversion + derived time cols (P5): OrderWideApp.java:49-73 —
   create_date/create_hour split, epoch-millis create_ts.
 - interval join J1 (order ⋈ detail, ±5 s): OrderWideApp.java:76-85;
   bounds inclusive on both ends (Flink intervalJoin default).
 - interval join J2 (payment ⋈ order_wide, payment within
   [order, order+15 min]): PaymentWideApp.java:80-88.
 - dim enrichment J3 (6 chained async Phoenix lookups + Redis cache →
   broadcast hash joins): OrderWideApp.java:87-194; age derivation
   from birthday at :100-110 (integer-division year arithmetic kept).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import schemas

FACT_SCHEMAS: dict[str, StructType] = {
    "order_info": schemas.ORDER_INFO_SCHEMA,
    "order_detail": schemas.ORDER_DETAIL_SCHEMA,
    "payment_info": schemas.PAYMENT_INFO_SCHEMA,
    "favor_info": schemas.FAVOR_INFO_SCHEMA,
    "cart_info": schemas.CART_INFO_SCHEMA,
    "order_refund_info": schemas.ORDER_REFUND_INFO_SCHEMA,
    "comment_info": schemas.COMMENT_INFO_SCHEMA,
}


def parse_fact(routed: DataFrame, table: str,
               schema: StructType | None = None,
               data_col: str = "data") -> DataFrame:
    """CDC payload JSON → typed fact rows for one source table."""
    schema = schema or FACT_SCHEMAS[table]
    return (routed.filter(F.col("table") == table)
            .select(F.from_json(F.col(data_col), schema).alias("d"))
            .select("d.*"))


def with_time_cols(fact: DataFrame,
                   time_col: str = "create_time") -> DataFrame:
    """P5: split 'yyyy-MM-dd HH:mm:ss' into create_date/create_hour and
    derive epoch-millis create_ts (OrderWideApp.java:54-60). The string
    clock is interpreted in UTC (the engine's pinned session zone)."""
    return (fact
            .withColumn("create_date", F.split(time_col, " ")[0])
            .withColumn("create_hour", F.split(F.split(time_col, " ")[1],
                                               ":")[0])
            .withColumn("create_ts",
                        F.unix_timestamp(time_col) * 1000)
            .withColumn("create_et", F.to_timestamp(time_col)))


def order_wide_join(order_info: DataFrame, order_detail: DataFrame,
                    streaming: bool = False,
                    watermark: str = "5 seconds") -> DataFrame:
    """J1: order_info ⋈ order_detail on order id, detail time within
    ±5 s of the order (OrderWideApp.java:76-85). In streaming mode both
    sides carry watermarks and the range condition bounds the join
    state Spark keeps."""
    oi = with_time_cols(order_info).select(
        F.col("id").alias("order_id"), "province_id", "order_status",
        "user_id", "total_amount", "activity_reduce_amount",
        "coupon_reduce_amount", "original_total_amount", "feight_fee",
        F.col("create_time").alias("order_create_time"),
        F.col("create_date").alias("create_date"),
        F.col("create_hour").alias("create_hour"),
        F.col("create_ts").alias("order_ts"),
        F.col("create_et").alias("order_et"))
    od = with_time_cols(order_detail).select(
        F.col("id").alias("detail_id"), F.col("order_id").alias("d_order_id"),
        "sku_id", "order_price", "sku_num", "sku_name",
        "split_total_amount", "split_activity_amount",
        "split_coupon_amount",
        F.col("create_ts").alias("detail_ts"),
        F.col("create_et").alias("detail_et"))
    if streaming:
        oi = oi.withWatermark("order_et", watermark)
        od = od.withWatermark("detail_et", watermark)
    cond = (
        (oi.order_id == od.d_order_id)
        & (od.detail_et >= F.expr("order_et - interval 5 seconds"))
        & (od.detail_et <= F.expr("order_et + interval 5 seconds"))
    )
    return oi.join(od, cond, "inner").drop("d_order_id")


def payment_wide_join(payment_info: DataFrame, order_wide: DataFrame,
                      streaming: bool = False) -> DataFrame:
    """J2: payment ⋈ order_wide on order_id, payment within
    [order time, order time + 15 min] (PaymentWideApp.java:80-88)."""
    pay = with_time_cols(payment_info).select(
        F.col("id").alias("payment_id"),
        F.col("order_id").alias("p_order_id"),
        F.col("user_id").alias("payment_user_id"),
        F.col("total_amount").alias("payment_amount"),
        "subject", "payment_type",
        F.col("create_time").alias("payment_create_time"),
        F.col("create_ts").alias("payment_ts"),
        F.col("create_et").alias("payment_et"))
    ow = order_wide
    if streaming:
        pay = pay.withWatermark("payment_et", "15 minutes")
        ow = ow.withWatermark("order_et", "15 minutes")
    cond = (
        (pay.p_order_id == ow.order_id)
        & (pay.payment_et >= ow.order_et)
        & (pay.payment_et <= F.expr("order_et + interval 15 minutes"))
    )
    return pay.join(ow, cond, "inner").drop("p_order_id")


def enrich_order_wide(order_wide: DataFrame, dims: dict[str, DataFrame],
                      now_date: str | None = None) -> DataFrame:
    """J3: the 6-hop dim enrichment as broadcast left joins.

    dims keys: user_info, base_province, sku_info, spu_info,
    base_trademark, base_category3 (lookup key always 'id',
    utils/DimUtil.java:68-69). user_age keeps the reference's integer
    millisecond arithmetic (OrderWideApp.java:100-110):
    (now - birthday_ms) / year_ms, floored. ``now_date`` makes the
    processing-time dependency injectable for tests (F5).
    """
    now = (F.lit(now_date).cast("date") if now_date
           else F.current_date())

    def b(name: str, cols: dict[str, str]) -> DataFrame:
        d = dims[name]
        return F.broadcast(d.select(
            *[F.col(src).alias(dst) for src, dst in cols.items()]))

    user = b("user_info", {"id": "u_id", "birthday": "birthday",
                           "gender": "user_gender"})
    prov = b("base_province", {"id": "prov_id", "name": "province_name",
                               "area_code": "province_area_code",
                               "iso_code": "province_iso_code",
                               "iso_3166_2": "province_3166_2_code"})
    sku = b("sku_info", {"id": "s_id", "sku_name": "dim_sku_name",
                         "price": "sku_price", "spu_id": "spu_id",
                         "category3_id": "category3_id", "tm_id": "tm_id"})
    spu = b("spu_info", {"id": "spu_join_id", "spu_name": "spu_name"})
    tm = b("base_trademark", {"id": "tm_join_id", "tm_name": "tm_name"})
    c3 = b("base_category3", {"id": "c3_join_id", "name": "category3_name"})

    year_ms = F.lit(365 * 24 * 3600 * 1000)
    age = F.floor(
        (F.unix_timestamp(now.cast("timestamp")) * 1000
         - F.unix_timestamp(F.col("birthday").cast("timestamp")) * 1000)
        / year_ms).cast("int")
    return (order_wide
            .join(user, F.col("user_id") == F.col("u_id"), "left")
            .withColumn("user_age", age)
            .drop("u_id", "birthday")
            .join(prov, F.col("province_id") == F.col("prov_id"), "left")
            .drop("prov_id")
            .join(sku, F.col("sku_id") == F.col("s_id"), "left")
            .drop("s_id")
            .join(spu, F.col("spu_id") == F.col("spu_join_id"), "left")
            .drop("spu_join_id")
            .join(tm, F.col("tm_id") == F.col("tm_join_id"), "left")
            .drop("tm_join_id")
            .join(c3, F.col("category3_id") == F.col("c3_join_id"), "left")
            .drop("c3_join_id"))
