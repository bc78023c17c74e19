"""Multimodal column plumbing: opaque binary media columns with typed
metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Training-data-pipeline extension. The actual decoders (image/audio/
video libs) are not available in this environment, so ``_decode`` is a
clearly-marked deterministic fake keyed only on the payload bytes —
but the Spark-side plumbing is real: binary column schema, Arrow batch
transfer, per-batch vectorized processing, and a stable output
schema. Swapping the fake for PIL/ffmpeg is a one-function change.

At scale this is the right shape: mapInPandas streams Arrow record
batches (no per-row Python overhead), media bytes never pass through
a shuffle (the decode is a narrow map), and the output is a slim
feature row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("media", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the documents table's text as opaque binary payloads —
    the stand-in corpus for media blobs (utf-8 bytes; the oracles
    mirror the stub arithmetic over strlen(text) = UTF-8 byte count,
    so CJK and NULL texts stay engine-exact too)."""
    # NULL text wraps as the EMPTY payload (0 bytes): a dirty corpus
    # must not kill the decode job, and total integer arithmetic keeps
    # the oracle mirror exact (same rule as encode_media's stub)
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
         .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("media_type"),
        F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("media"))


def _decode(media: bytes, media_type: str) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake. A real deployment decodes
    with PIL/torchaudio/ffmpeg here; only this function changes."""
    n = len(media)
    if media_type == "image":
        return 16 + n % 64, 16 + n % 48, 1
    if media_type == "audio":
        return 0, 0, 1 + n % 100          # "frames" = chunks
    return 16 + n % 64, 16 + n % 48, 1 + n % 5


def decode_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, slim feature rows out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode(m, t)
                    for m, t in zip(pdf["media"], pdf["media_type"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(m) for m in pdf["media"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            })

    return media_df.mapInPandas(fn, FEATURE_SCHEMA)


def media_features(documents: DataFrame) -> DataFrame:
    """End-to-end: documents → binary media column → decoded feature
    rows (the registry query; oracle recomputes the deterministic
    fake's arithmetic from n_chars)."""
    return decode_features(documents_as_media(documents))


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_offset", LongType()),
])


def sample_frames(media_df: DataFrame) -> DataFrame:
    """Frame sampling: one output row per (stub-)decoded frame of each
    video payload — a row fan-out through the same Arrow mapInPandas
    path (each frame's byte offset = idx * (n_bytes div n_frames))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": []}
            for doc_id, m, t in zip(pdf["doc_id"], pdf["media"],
                                    pdf["media_type"]):
                if t != "video":
                    continue
                n = len(m)
                _, _, frames = _decode(m, t)
                stride = n // frames
                for i in range(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * stride)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(fn, FRAME_SCHEMA)


def video_frame_samples(documents: DataFrame) -> DataFrame:
    return sample_frames(documents_as_media(documents))


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("new_width", IntegerType()),
    StructField("new_height", IntegerType()),
    StructField("out_bytes", LongType()),
])


def resize_media(media_df: DataFrame, max_dim: int = 64) -> DataFrame:
    """mapInPandas resize: cap the longest side at ``max_dim`` with
    integer aspect-preserving scaling; audio passes through. The pixel
    transform is the stub (a real deployment calls PIL here); the
    batch shape, integer-exact dim math and slim output row are the
    real scale-relevant parts — RGB out_bytes = w*h*3*frames."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc, m, t in zip(pdf["doc_id"], pdf["media"],
                                 pdf["media_type"]):
                w, h, frames = _decode(m, t)
                mx = max(w, h)
                if t == "audio" or mx <= max_dim:
                    nw, nh = w, h
                else:
                    nw = max(1, w * max_dim // mx)
                    nh = max(1, h * max_dim // mx)
                out["doc_id"].append(doc)
                out["media_type"].append(t)
                out["width"].append(w)
                out["height"].append(h)
                out["new_width"].append(nw)
                out["new_height"].append(nh)
                out["out_bytes"].append(
                    len(m) if t == "audio" else nw * nh * 3 * frames)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(fn, RESIZE_SCHEMA)


def media_resize(documents: DataFrame) -> DataFrame:
    return resize_media(documents_as_media(documents))


FRAME_HASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_hash", StringType()),
])


def frame_hashes(media_df: DataFrame) -> DataFrame:
    """Per-frame content hashes for video payloads: each (stub-)
    decoded frame's byte slice is md5'd inside the Arrow batch — the
    fingerprint step of cross-video frame dedup. Zero-length frames
    (payload shorter than the frame count) are skipped. A real
    deployment swaps the byte-slice for a decoded-keyframe perceptual
    hash; the Spark shape (mapInPandas fan-out → hash column) is
    identical."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, m, t in zip(pdf["doc_id"], pdf["media"],
                                    pdf["media_type"]):
                if t != "video":
                    continue
                n = len(m)
                _, _, frames = _decode(m, t)
                stride = n // frames
                if stride == 0:
                    continue
                for i in range(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    # hash the lowercase HEX of the slice: md5-of-raw-
                    # bytes is not oracle-expressible when a slice
                    # splits a multi-byte codepoint (DuckDB md5 takes
                    # VARCHAR only); hex is byte-faithful everywhere
                    out["frame_hash"].append(hashlib.md5(
                        bytes(m[i * stride:(i + 1) * stride])
                        .hex().encode()).hexdigest())
            yield pd.DataFrame(out)

    return media_df.mapInPandas(fn, FRAME_HASH_SCHEMA)


# Planted re-upload payload for the frame-dedup audit: the synthetic
# corpus has no byte-identical videos, so (like pii_redaction's
# planted PII) every 11th video gets a shared payload — mirrored
# verbatim in the oracle — making the duplicate-frame path genuinely
# exercised with nonzero counts. 214 ascii chars -> 5 frames of 42
# bytes whose content varies by offset phase (13-char period vs 42
# stride), so the audit sees multiple distinct colliding hashes.
PLANTED_VIDEO = "shared-intro " * 16 + "tail42"


def frame_dedup(documents: DataFrame) -> DataFrame:
    """Cross-video duplicate-frame audit: hash every sampled frame
    (Arrow path) and report content hashes occurring more than once —
    occurrence count, number of distinct videos, and the first
    occupant — the dedup step that catches re-uploads/shared intros a
    doc-level hash misses. One hash-keyed map-side-combined
    aggregation above the fan-out; at 100 TB this is the same plan as
    any per-key count."""
    media = documents_as_media(documents)  # NULL text -> empty payload
    media = media.withColumn(
        "media",
        F.when((F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 11 == 0),
               F.encode(F.lit(PLANTED_VIDEO), "utf-8"))
         .otherwise(F.col("media")))
    f = frame_hashes(media)
    return (f.groupBy("frame_hash")
            .agg(F.count(F.lit(1)).alias("occurrence_ct"),
                 F.countDistinct("doc_id").alias("video_ct"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("occurrence_ct") > 1))


EMB_DIM = 8  # stand-in encoder output width

EMBED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("media_emb", StringType()),  # csv of 8 odd ints
])


def encode_media(media_df: DataFrame) -> DataFrame:
    """Arrow-batched media encoder STUB: maps each blob to an
    ``EMB_DIM``-dim integer vector derived from the first md5 nibbles
    of the payload (2·nibble − 15 — odd, so never the zero vector and
    cosine denominators never vanish). A real deployment swaps the
    body for a CLIP/SigLIP image tower over the decoded pixels; the
    Spark shape — mapInPandas over Arrow record batches, blobs never
    shuffled, slim vector rows out — is the production shape."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for m in pdf["media"]:
                # null payload (e.g. null text upstream) encodes like
                # the empty blob — a dirty corpus must not kill the job
                h = hashlib.md5(b"" if m is None else bytes(m)).hexdigest()
                embs.append(",".join(
                    str(2 * int(h[i], 16) - 15) for i in range(EMB_DIM)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "media_emb": embs,
            })

    return media_df.mapInPandas(fn, EMBED_SCHEMA)


def media_text_alignment(documents: DataFrame) -> DataFrame:
    """Image-text pair curation (the LAION/DataComp CLIP-score gate):
    every media blob is encoded by the Arrow-batched stub tower, its
    caption (the doc text) by a JVM-side stand-in text tower (md5
    nibbles of a salted caption digest), and the pair's cosine
    alignment decides keep/drop. Scores are exact: both towers emit
    odd-integer vectors, so dot and squared norms are exact int64
    and the single double rounding (micro-units) is IEEE-identical
    across engines.

    Scale shape: the pair join is doc_id-to-doc_id (media and caption
    derive from the same row here; with a separate media table it is
    one equi-join), encoding is a narrow Arrow map over the blobs,
    and scoring is whole-stage-codegen arithmetic — no shuffle except
    the join, no blob ever crosses the wire."""
    enc = encode_media(documents_as_media(documents))
    m = F.split("media_emb", ",").cast("array<long>")
    cap = F.md5(F.concat(F.lit("cap|"),
                         F.coalesce(F.col("text"), F.lit(""))))

    def nib(i: int) -> F.Column:
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
