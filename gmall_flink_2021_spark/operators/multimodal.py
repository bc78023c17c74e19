"""Multimodal column plumbing: opaque binary media columns with typed
metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Training-data-pipeline extension. Since round 10 the decode is REAL
for uncompressed container formats: ``_decode`` sniffs the payload
magic and genuinely parses BMP headers (width/height from the
BITMAPINFOHEADER) and RIFF/WAVE chunk lists (sample count = data
size / block align) with stdlib ``struct`` — and
``documents_as_media(containers=True)`` builds valid BMP/WAV
containers around the synthetic payloads, so ``media_features`` /
``media_resize`` exercise a genuine end-to-end decode.  Only
COMPRESSED formats (jpeg/mp4-class) remain a clearly-marked
deterministic fake — their codecs (PIL/ffmpeg) are absent from this
environment; swapping the fake for a real codec is a one-branch
change in ``_decode``.

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


def documents_as_media(documents: DataFrame,
                       containers: bool = False) -> DataFrame:
    """Wrap the documents table's text as binary payloads — the
    stand-in corpus for media blobs.

    ``containers=False`` (default): raw utf-8 bytes, standing in for
    opaque/compressed blobs (the fake-decode path; oracles mirror the
    arithmetic over strlen(text) = UTF-8 byte count, so CJK and NULL
    texts stay engine-exact).

    ``containers=True``: image docs become REAL 24-bit uncompressed
    BMP files and audio docs REAL 16-bit mono PCM WAV files (valid
    headers, text bytes as pixel/sample payload) built in an Arrow
    batch, so the downstream ``_decode`` genuinely parses container
    headers end-to-end.  Video docs stay raw utf-8 (the mp4-class
    compressed stand-in).  Dimensions derive from the payload byte
    count B: BMP width = 1 + B%96, height = 1 + B%20; WAV samples =
    ceil(B/2) — integer-expressible, so the DuckDB oracles can mirror
    the CONTAINER GEOMETRY while the engine actually reads it from
    the parsed headers."""
    # NULL text wraps as the EMPTY payload (0 bytes): a dirty corpus
    # must not kill the decode job, and total integer arithmetic keeps
    # the oracle mirror exact (same rule as encode_media's stub)
    raw = documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
         .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("media_type"),
        F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("media"))
    if not containers:
        return raw

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for m, t in zip(pdf["media"], pdf["media_type"]):
                b = b"" if m is None else bytes(m)
                if t == "image":
                    media.append(_build_bmp(b))
                elif t == "audio":
                    media.append(_build_wav(b))
                else:
                    media.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_type": pdf["media_type"],
                                "media": media})

    return raw.mapInPandas(wrap, MEDIA_SCHEMA)


def _build_bmp(payload: bytes) -> bytes:
    """A valid 24-bit uncompressed BMP whose pixel buffer carries the
    payload bytes (truncated / zero-padded to the row grid). Width
    1 + B%96, height 1 + B%20 with B = len(payload); rows padded to
    4-byte boundaries per the BMP spec."""
    import struct

    b = len(payload)
    width, height = 1 + b % 96, 1 + b % 20
    rowbytes = ((3 * width + 3) // 4) * 4
    pix = payload[:rowbytes * height].ljust(rowbytes * height, b"\0")
    size = 54 + len(pix)
    return (struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                          0, len(pix), 2835, 2835, 0, 0)
            + pix)


def _build_wav(payload: bytes) -> bytes:
    """A valid 16-bit mono 8 kHz PCM WAV whose data chunk carries the
    payload bytes (zero-padded to the 2-byte block align)."""
    import struct

    data = payload + (b"\0" if len(payload) % 2 else b"")
    return (struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000,
                          16000, 2, 16)
            + struct.pack("<4sI", b"data", len(data))
            + data)


def _parse_bmp(media: bytes) -> tuple[int, int, int] | None:
    """Genuine BMP header parse: BITMAPINFOHEADER width/height.
    Returns None when the payload is not a parseable BMP."""
    import struct

    if len(media) < 54 or media[:2] != b"BM":
        return None
    header_size = struct.unpack_from("<I", media, 14)[0]
    if header_size < 40:
        return None
    width, height = struct.unpack_from("<ii", media, 18)
    return abs(width), abs(height), 1     # negative height = top-down


def _parse_wav(media: bytes) -> tuple[int, int, int] | None:
    """Genuine RIFF/WAVE chunk walk: sample count = data chunk size
    // fmt chunk block align. Returns None when not a WAV."""
    import struct

    if len(media) < 12 or media[:4] != b"RIFF" or media[8:12] != b"WAVE":
        return None
    off, block_align, data_size = 12, None, None
    while off + 8 <= len(media):
        cid, csize = struct.unpack_from("<4sI", media, off)
        if cid == b"fmt " and csize >= 16:
            block_align = struct.unpack_from("<H", media, off + 20)[0]
        elif cid == b"data":
            data_size = csize
        off += 8 + csize + (csize % 2)    # chunks are word-aligned
    if not block_align or data_size is None:
        return None
    return 0, 0, data_size // block_align


def _decode(media: bytes, media_type: str) -> tuple[int, int, int]:
    """Media decode: REAL header parsing for uncompressed containers
    (BMP via ``_parse_bmp``, WAV via ``_parse_wav`` — magic-sniffed),
    deterministic FAKE for everything else. The fake stands in for
    compressed formats (jpeg/mp4-class) whose codecs are absent from
    this environment; a real deployment replaces only the fallback
    branch with PIL/torchaudio/ffmpeg."""
    parsed = _parse_bmp(media) or _parse_wav(media)
    if parsed is not None:
        return parsed
    # --- compressed-format STUB (deterministic fake) ---
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
    """End-to-end: documents → REAL BMP/WAV containers (video stays
    the raw compressed stand-in) → genuinely parsed feature rows.
    The oracle recomputes the container GEOMETRY (BMP header+rowgrid
    size, WAV header+block-aligned data) from strlen(text); the
    engine reads the same numbers from the parsed headers."""
    return decode_features(documents_as_media(documents,
                                              containers=True))


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
    # containers=True: dims come from genuinely parsed BMP/WAV
    # headers (media_features' contract); the scaling math above is
    # then exercised on real decoded dimensions
    return resize_media(documents_as_media(documents,
                                           containers=True))


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
