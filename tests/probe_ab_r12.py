"""Interleaved same-session A/B probes for the r12 rewrites
(guide §1.4/§1.5): the rig's run-to-run drift exceeds per-change
effects, so OLD and NEW builds of the same query run alternately in
ONE session and each side takes its min — drift cancels.

OLD sides are the r11 (HEAD-at-session-start) operator tails,
reproduced inline from git history; NEW sides call the live code.

Usage: SPARK_GRAFT_SF_DIR=... python tests/probe_ab_r12.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_langid(documents):
    """r11 langid_trigram_confusion scoring tail (verbatim shape:
    crossJoin grid + SMJ-left against matched)."""
    from gmall_flink_2021_spark.functions import spread
    from gmall_flink_2021_spark.functions.text import tokens  # noqa: F401

    tris = F.expr(
        "filter(transform(sequence(1, greatest(length(coalesce(text, ''))"
        " - 2, 1)), i -> substring(coalesce(text, ''), i, 3)),"
        " t -> length(t) = 3)")
    doc_tri = (spread(documents)
               .select("doc_id", F.col("lang").alias("label_lang"),
                       F.explode(tris).alias("tri")))
    profile = (doc_tri
               .groupBy(F.col("label_lang").alias("lang_p"), "tri")
               .agg(F.count(F.lit(1)).alias("c")))
    v = profile.agg(F.countDistinct("tri").alias("v"))
    lang_tot = (profile.groupBy("lang_p")
                .agg(F.sum("c").alias("ct_lang"))
                .crossJoin(F.broadcast(v)))
    llr = (profile
           .join(F.broadcast(lang_tot), "lang_p")
           .select("lang_p", "tri",
                   F.round(F.log((F.col("c") + 1).cast("double")
                                 / (F.col("ct_lang") + F.col("v")))
                           * 1e6).cast("long").alias("llr_micro")))
    floors = lang_tot.select(
        "lang_p",
        F.round(F.log(F.lit(1.0)
                      / (F.col("ct_lang") + F.col("v"))) * 1e6)
        .cast("long").alias("floor_micro"))
    matched = (doc_tri
               .join(F.broadcast(llr), "tri")
               .groupBy("doc_id", "lang_p")
               .agg(F.count(F.lit(1)).alias("m"),
                    F.sum("llr_micro").alias("s")))
    n_tri = (documents
             .select("doc_id", F.col("lang").alias("label_lang"),
                     F.greatest(
                         F.length(F.coalesce(F.col("text"), F.lit("")))
                         - 2, F.lit(0)).cast("long").alias("n_tri"))
             .filter(F.col("n_tri") > 0))
    scored = (n_tri
              .crossJoin(F.broadcast(floors))
              .join(matched, ["doc_id", "lang_p"], "left")
              .select("doc_id", "label_lang", "lang_p",
                      (F.coalesce("s", F.lit(0))
                       + (F.col("n_tri")
                          - F.coalesce("m", F.lit(0)))
                       * F.col("floor_micro")).alias("score")))
    pred = (scored
            .groupBy("doc_id", "label_lang")
            .agg(F.min(F.struct((-F.col("score")).alias("ns"),
                                F.col("lang_p"))).alias("best")))
    return (pred.groupBy(F.col("label_lang"),
                         F.col("best.lang_p").alias("pred_lang"))
            .agg(F.count(F.lit(1)).alias("ct")))


def old_media_text_alignment(documents):
    """r11 media_text_alignment (encoder output joined back to a
    second documents scan on doc_id)."""
    from gmall_flink_2021_spark.operators.multimodal import (
        EMB_DIM, documents_as_media, encode_media)

    enc = encode_media(documents_as_media(documents))
    m = F.split("media_emb", ",").cast("array<long>")
    cap = F.md5(F.concat(F.lit("cap|"),
                         F.coalesce(F.col("text"), F.lit(""))))

    def nib(i):
        a = F.ascii(F.substring(cap, i, 1))
        v = F.when(a >= 97, a - 87).otherwise(a - 48)
        return (v * 2 - 15).cast("long")

    t = F.array(*[nib(i + 1) for i in range(EMB_DIM)])
    dot = F.aggregate(F.zip_with(m, t, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    nm = F.aggregate(F.transform(m, lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, v: acc + v)
    nt = F.aggregate(F.transform(t, lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, v: acc + v)
    joined = (documents.select("doc_id", "text")
              .join(enc, "doc_id"))
    return (joined
            .select("doc_id", "media_type",
                    F.round(dot.cast("double")
                            / F.sqrt((nm * nt).cast("double")) * 1e6)
                    .cast("long").alias("align_micro"))
            .withColumn("keep",
                        (F.col("align_micro") >= 0).cast("long")))


def v2_langid(documents):
    """Variant: doc-functional columns (label_lang, n_tri) and the
    lang-functional floor ride the GROUP KEY of the hot aggregation
    instead of first() buffers; same bf-constant union tail."""
    from gmall_flink_2021_spark.functions import spread

    tris = F.expr(
        "filter(transform(sequence(1, greatest(length(coalesce(text, ''))"
        " - 2, 1)), i -> substring(coalesce(text, ''), i, 3)),"
        " t -> length(t) = 3)")
    doc_tri = (spread(documents)
               .select("doc_id", F.col("lang").alias("label_lang"),
                       F.greatest(
                           F.length(F.coalesce(F.col("text"), F.lit("")))
                           - 2, F.lit(0)).cast("long").alias("n_tri"),
                       F.explode(tris).alias("tri")))
    profile = (doc_tri
               .groupBy(F.col("label_lang").alias("lang_p"), "tri")
               .agg(F.count(F.lit(1)).alias("c")))
    v = profile.agg(F.countDistinct("tri").alias("v"))
    lang_tot = (profile.groupBy("lang_p")
                .agg(F.sum("c").alias("ct_lang"))
                .crossJoin(F.broadcast(v)))
    llr = (profile
           .join(F.broadcast(lang_tot), "lang_p")
           .select("lang_p", "tri",
                   F.round(F.log((F.col("c") + 1).cast("double")
                                 / (F.col("ct_lang") + F.col("v")))
                           * 1e6).cast("long").alias("llr_micro"),
                   F.round(F.log(F.lit(1.0)
                                 / (F.col("ct_lang") + F.col("v"))) * 1e6)
                   .cast("long").alias("floor_micro")))
    floors = lang_tot.select(
        "lang_p",
        F.round(F.log(F.lit(1.0)
                      / (F.col("ct_lang") + F.col("v"))) * 1e6)
        .cast("long").alias("floor_micro"))
    matched = (doc_tri
               .join(F.broadcast(llr), "tri")
               .groupBy("doc_id", "label_lang", "n_tri", "lang_p",
                        "floor_micro")
               .agg(F.count(F.lit(1)).alias("m"),
                    F.sum("llr_micro").alias("s")))
    cand1 = matched.select(
        "doc_id", "label_lang",
        F.struct((-(F.col("s")
                    + (F.col("n_tri") - F.col("m"))
                    * F.col("floor_micro"))).alias("ns"),
                 F.col("lang_p")).alias("cand"))
    bf = F.broadcast(floors.agg(
        F.min(F.struct((-F.col("floor_micro")).alias("nf"),
                       F.col("lang_p"))).alias("bf")))
    n_tri = (documents
             .select("doc_id", F.col("lang").alias("label_lang"),
                     F.greatest(
                         F.length(F.coalesce(F.col("text"), F.lit("")))
                         - 2, F.lit(0)).cast("long").alias("n_tri"))
             .filter(F.col("n_tri") > 0))
    cand2 = (n_tri.crossJoin(bf)
             .select("doc_id", "label_lang",
                     F.struct((F.col("n_tri") * F.col("bf.nf"))
                              .alias("ns"),
                              F.col("bf.lang_p").alias("lang_p"))
                     .alias("cand")))
    pred = (cand1.unionByName(cand2)
            .groupBy("doc_id", "label_lang")
            .agg(F.min("cand").alias("best")))
    return (pred.groupBy(F.col("label_lang"),
                         F.col("best.lang_p").alias("pred_lang"))
            .agg(F.count(F.lit(1)).alias("ct")))


def new_langid(documents):
    from gmall_flink_2021_spark.operators.textstats import (
        langid_trigram_confusion)

    out, h = langid_trigram_confusion(documents)
    h.unpersist()
    return out


def new_media(documents):
    from gmall_flink_2021_spark.operators.multimodal import (
        media_text_alignment)

    return media_text_alignment(documents)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gmall_flink_2021_spark.session import get_spark
    from gmall_flink_2021_spark.sources.tables import load_table

    spark = get_spark("probe-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull())

    cases = {
        "langid_old": lambda: old_langid(documents),
        "langid_new": lambda: new_langid(documents),
        "langid_v2": lambda: v2_langid(documents),
        "media_old": lambda: old_media_text_alignment(documents),
        "media_new": lambda: new_media(documents),
    }
    best: dict[str, float] = {}
    # warm both builds once so codegen/JIT is paid outside the probes
    for name, build in cases.items():
        build().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for r in range(reps):
        for name, build in cases.items():
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, dt), dt)
            spark.catalog.clearCache()
            print(f"  {name} rep{r}: {dt:.3f}s", file=sys.stderr)
    for name in cases:
        print(f"{name}: min={best[name]:.3f}s")
    for q in ("langid", "media"):
        o, n = best[f"{q}_old"], best[f"{q}_new"]
        print(f"{q}: old {o:.3f}s -> new {n:.3f}s  ({o / n:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
