"""Multimodal column plumbing: opaque binary media columns with typed
metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Training-data-pipeline extension. Since round 10 the decode is REAL
for uncompressed container formats: ``_decode`` genuinely parses BMP
headers (width/height from the BITMAPINFOHEADER) and RIFF/WAVE chunk
lists (sample count = data size / block align) with stdlib
``struct`` — and ``documents_as_media(containers=True)`` builds
valid BMP/WAV containers around the synthetic payloads, so
``media_features`` / ``media_resize`` exercise a genuine end-to-end
decode.  Round 11 adds a REAL PNG codec with nothing but stdlib
``zlib``: ``_build_png`` emits spec-valid PNGs (8-bit RGB, per-row
filter types 0-4, stored-deflate IDAT, CRC'd chunks) and
``_png_decode`` walks chunks with CRC verification, inflates IDAT
and reconstructs every filter type — so half the image corpus now
round-trips through genuine compressed-container decode.  Dispatch
is on ``media_type`` FIRST (ADVICE r10): a video/raw payload whose
bytes coincidentally match a container magic is never parsed as one,
keeping the engine and the stub-arithmetic oracles on the same
branch by construction.  Only codec-bound formats (jpeg/mp4-class)
remain a clearly-marked deterministic fake — PIL/ffmpeg are absent
from this environment; swapping the fake for a real codec is a
one-branch change in ``_decode``.

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


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for the Python decode stages
    (guide §2: derive partitioning from the input, don't hard-code
    either local or cluster constants).  A single small parquet file
    scans as ONE task, which would serialize every Arrow decode batch
    through one Python worker; when the scan yields fewer partitions
    than the cluster's parallelism, hash-repartition on doc_id
    (deterministic under task retry, unlike round-robin) up to
    defaultParallelism.  On real corpora — thousands of splits ≥
    cores — this is a no-op, so no blob-shuffle is ever added at
    scale; the explicit partition count keeps AQE from coalescing
    the tiny local exchange back to one task."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, "doc_id")


def documents_as_media(documents: DataFrame,
                       containers: bool = False) -> DataFrame:
    """Wrap the documents table's text as binary payloads — the
    stand-in corpus for media blobs.

    ``containers=False`` (default): raw utf-8 bytes, standing in for
    opaque/compressed blobs (the fake-decode path; oracles mirror the
    arithmetic over strlen(text) = UTF-8 byte count, so CJK and NULL
    texts stay engine-exact).

    ``containers=True``: image docs become REAL image files — 24-bit
    uncompressed BMP for doc_id % 6 == 0, spec-valid zlib-compressed
    PNG for the rest (round 11) — and audio docs REAL 16-bit mono PCM
    WAV files (valid headers, text bytes as pixel/sample payload)
    built in an Arrow batch, so the downstream ``_decode`` genuinely
    parses containers end-to-end.  Video docs stay raw utf-8 (the
    mp4-class compressed stand-in).  Dimensions derive from the
    payload byte count B: BMP width = 1 + B%96, height = 1 + B%20;
    PNG width = 1 + B%80, height = 1 + B%24; WAV samples = ceil(B/2)
    — integer-expressible, so the DuckDB oracles can mirror the
    CONTAINER GEOMETRY (for PNG including the stored-deflate stream
    size) while the engine actually reads it from the parsed
    headers."""
    raw = _media_raw(documents)
    if not containers:
        return raw

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = [
                _build_container(doc_id, m, t)
                for doc_id, m, t in zip(pdf["doc_id"], pdf["media"],
                                        pdf["media_type"])]
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_type": pdf["media_type"],
                                "media": media})

    return raw.mapInPandas(wrap, MEDIA_SCHEMA)


def _media_raw(documents: DataFrame) -> DataFrame:
    """The pre-container media projection (JVM-only): payload = utf-8
    text bytes, media_type from doc_id. NULL text wraps as the EMPTY
    payload (0 bytes): a dirty corpus must not kill the decode job,
    and total integer arithmetic keeps the oracle mirror exact (same
    rule as encode_media's stub)."""
    return _spread(documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
         .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("media_type"),
        F.encode(F.coalesce("text", F.lit("")), "utf-8").alias("media")))


def _build_container(doc_id: int, payload, mtype: str) -> bytes:
    """Per-row container build shared by documents_as_media and the
    fused build+parse operators: image docs become BMP (doc_id%6==0)
    or PNG, audio docs WAV, video stays the raw compressed stand-in."""
    b = b"" if payload is None else bytes(payload)
    if mtype == "image":
        return _build_bmp(b) if doc_id % 6 == 0 else _build_png(b)
    if mtype == "audio":
        return _build_wav(b)
    return b


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


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward-apply PNG filter type ``ft`` (0-4) to a scanline.
    Predictors read the ORIGINAL (unfiltered) neighbors, per spec."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter(ft: int, line: bytes, prev: bytes,
                  bpp: int) -> bytes:
    """Reconstruct a filtered scanline. Predictors read the
    RECONSTRUCTED left neighbors (sequential dependency, per spec)."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] + pred) & 0xFF
    return bytes(out)


def _unfilter_avg(line: list, prev: list, bpp: int) -> list:
    """Specialized Average-filter reconstruction: the same serial
    recurrence as ``_png_unfilter(3, ...)`` with the per-byte filter
    dispatch and function-call overhead hoisted out (this row type
    and Paeth are the only ones whose reconstructed-left dependency
    defeats vectorization)."""
    out = [0] * len(line)
    for i in range(bpp):
        out[i] = (line[i] + (prev[i] >> 1)) & 0xFF
    for i in range(bpp, len(line)):
        out[i] = (line[i] + ((out[i - bpp] + prev[i]) >> 1)) & 0xFF
    return out


def _unfilter_paeth(line: list, prev: list, bpp: int) -> list:
    """Specialized Paeth reconstruction (see ``_unfilter_avg``)."""
    out = [0] * len(line)
    for i in range(bpp):
        # a = c = 0 ⇒ p = b, |p-a| = b ≥ 0, |p-b| = 0, |p-c| = b:
        # pa <= pb only when b == 0, in which case a(=0) == b — the
        # predictor is prev[i] either way
        out[i] = (line[i] + prev[i]) & 0xFF
    for i in range(bpp, len(line)):
        a, b, c = out[i - bpp], prev[i], prev[i - bpp]
        p = a + b - c
        pa = p - a if p >= a else a - p
        pb = p - b if p >= b else b - p
        pc = p - c if p >= c else c - p
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        out[i] = (line[i] + pred) & 0xFF
    return out


def _stored_deflate(data: bytes) -> bytes:
    """A zlib stream framing ``data`` in stored (uncompressed)
    deflate blocks, written by hand so its size is a closed-form
    function of len(data): 2 + 5·max(1, ceil(n/65535)) + n + 4 —
    which lets the DuckDB oracles mirror the PNG container size
    exactly while ``zlib.decompress`` genuinely inflates it."""
    import struct
    import zlib

    out = bytearray(b"\x78\x01")          # CM=deflate, 32K, no dict
    n, i = len(data), 0
    if n == 0:
        out += struct.pack("<BHH", 1, 0, 0xFFFF)
    while i < n:
        chunk = data[i:i + 65535]
        i += len(chunk)
        out += struct.pack("<BHH", 1 if i >= n else 0,
                           len(chunk), 0xFFFF ^ len(chunk))
        out += chunk
    out += struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF)
    return bytes(out)


def _filter_grid(pix: bytes, height: int, stride: int,
                 bpp: int) -> bytes:
    """Forward-filter a whole pixel grid (row r gets type r % 5) in
    one vectorized NumPy pass — bit-identical to applying
    ``_png_filter`` row by row, which is possible because forward
    filtering reads ORIGINAL (unfiltered) neighbors only, so there is
    no sequential dependency (guide §4.2: hand whole batches to
    vectorized native code).  Returns the ``height * (1 + stride)``
    filtered byte grid (leading filter-type byte per row)."""
    import numpy as np

    arr = np.frombuffer(pix, np.uint8).reshape(height, stride) \
        .astype(np.int16)
    prev = np.zeros_like(arr)
    prev[1:] = arr[:-1]
    a = np.zeros_like(arr)
    a[:, bpp:] = arr[:, :-bpp]
    c = np.zeros_like(arr)
    c[:, bpp:] = prev[:, :-bpp]
    ft = np.arange(height, dtype=np.int64) % 5
    pred = np.zeros_like(arr)
    m = ft == 1
    pred[m] = a[m]
    m = ft == 2
    pred[m] = prev[m]
    m = ft == 3
    pred[m] = (a[m] + prev[m]) >> 1      # (a+b)//2, both in 0..255
    m = ft == 4
    if m.any():
        pa4, b4, c4 = a[m], prev[m], c[m]
        p = pa4 + b4 - c4
        da, db, dc = (np.abs(p - pa4), np.abs(p - b4),
                      np.abs(p - c4))
        pred[m] = np.where((da <= db) & (da <= dc), pa4,
                           np.where(db <= dc, b4, c4))
    out = np.empty((height, 1 + stride), np.uint8)
    out[:, 0] = ft
    out[:, 1:] = ((arr - pred) & 0xFF).astype(np.uint8)
    return out.tobytes()


def _build_png(payload: bytes) -> bytes:
    """A spec-valid 8-bit RGB PNG whose pixel buffer carries the
    payload bytes (truncated / zero-padded to width·height·3).  Width
    1 + B%80, height 1 + B%24 with B = len(payload); row r is
    forward-filtered with type r % 5 so a decoder must implement ALL
    five filters to reconstruct; IDAT is a hand-framed stored-deflate
    stream (size closed-form, see ``_stored_deflate``); every chunk
    carries its real CRC-32."""
    import struct
    import zlib

    b = len(payload)
    width, height = 1 + b % 80, 1 + b % 24
    stride = 3 * width
    pix = payload[:stride * height].ljust(stride * height, b"\0")
    raw = _filter_grid(pix, height, stride, 3)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I",
                              zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _stored_deflate(bytes(raw)))
            + chunk(b"IEND", b""))


def _png_decode(media: bytes) -> tuple[int, int, bytes] | None:
    """Genuine PNG decode with stdlib only: chunk walk with CRC-32
    verification, zlib inflate of the concatenated IDAT stream, and
    per-row filter reconstruction for all five filter types.
    Supports 8-bit non-interlaced images of any color type; returns
    (width, height, reconstructed_pixels) or None when the payload is
    not a valid PNG (bad magic/CRC/IHDR, torn chunk, inflate error,
    or a pixel buffer that doesn't match the declared geometry)."""
    import struct
    import zlib

    if len(media) < 8 or media[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    off, width, height, channels = 8, None, None, None
    idat = bytearray()
    while off + 12 <= len(media):
        clen, ctype = struct.unpack_from(">I4s", media, off)
        if off + 12 + clen > len(media):
            return None                   # torn chunk
        data = media[off + 8:off + 8 + clen]
        (crc,) = struct.unpack_from(">I", media, off + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            if clen != 13:
                return None
            width, height, depth, color, comp, filt, ilace = (
                struct.unpack(">IIBBBBB", data))
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if (channels is None or depth != 8 or comp != 0
                    or filt != 0 or ilace != 0):
                return None
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        off += 12 + clen
    if width is None:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) != height * (1 + stride):
        return None
    # Row reconstruction is inherently sequential in the row axis
    # (each row's predictors read the previous RECONSTRUCTED row) but
    # vectorizes within a row for filter types 0/1/2: None = copy,
    # Up = one vector add against prev, Sub = a per-lane cumulative
    # sum (mod-256 addition is associative, so the running
    # reconstructed-left chain is exactly cumsum(line) & 0xFF per
    # byte lane).  Average/Paeth read the reconstructed LEFT neighbor
    # through a floor-div/branch, a genuinely serial recurrence —
    # those rows keep the scalar spec-reference loop.  Bit-identical
    # to ``_png_unfilter`` on every row (pinned by the golden-bytes
    # and builder-roundtrip tests).
    import numpy as np

    mat = np.frombuffer(raw, np.uint8).reshape(height, 1 + stride)
    fts = mat[:, 0]
    if (fts > 4).any():
        return None
    lines = mat[:, 1:].astype(np.int16)
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int16)
    bpp = channels
    for r in range(height):
        ft = fts[r]
        line = lines[r]
        if ft == 0:
            rec = line
        elif ft == 1:
            # per-lane running sum: stride = width * channels is
            # always a multiple of bpp, so the lanes are the columns
            # of the (width, bpp) reshape
            rec = (np.cumsum(line.reshape(-1, bpp), axis=0)
                   & 0xFF).reshape(-1)
        elif ft == 2:
            rec = (line + prev) & 0xFF
        elif ft == 3:
            # serial recurrence (reconstructed left through a
            # floor-div): tight specialized loop, no per-byte branch
            rec = _unfilter_avg(line.tolist(), prev.tolist(), bpp)
        else:
            rec = _unfilter_paeth(line.tolist(), prev.tolist(), bpp)
        out[r] = rec
        prev = out[r].astype(np.int16)
    return width, height, out.tobytes()


def _parse_png(media: bytes) -> tuple[int, int, int] | None:
    """(width, height, 1) from a genuine full decode — the inflate
    and defilter are load-bearing: a corrupt IDAT or geometry
    mismatch refuses rather than reporting header dims."""
    dec = _png_decode(media)
    if dec is None:
        return None
    return dec[0], dec[1], 1


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
        # a truncated container must not report bytes it doesn't
        # have: clamp the effective chunk size to what's present
        # (ADVICE r10); the FIRST data chunk wins, per spec
        avail = len(media) - off - 8
        if cid == b"fmt " and csize >= 16 and avail >= 16:
            block_align = struct.unpack_from("<H", media, off + 20)[0]
        elif cid == b"data" and data_size is None:
            data_size = min(csize, avail)
        off += 8 + csize + (csize % 2)    # chunks are word-aligned
    if not block_align or data_size is None:
        return None
    return 0, 0, data_size // block_align


def _decode(media: bytes, media_type: str) -> tuple[int, int, int]:
    """Media decode: REAL parsing for container formats (BMP via
    ``_parse_bmp``, PNG via ``_parse_png`` — a genuine inflate +
    defilter — WAV via ``_parse_wav``), deterministic FAKE for
    everything else.  Dispatch is on ``media_type`` FIRST (ADVICE
    r10): only image payloads are tried as BMP/PNG and only audio as
    WAV, so a video/raw payload whose bytes coincidentally start
    with a container magic never forks the engine from the oracles'
    stub arithmetic.  The fake stands in for codec-bound formats
    (jpeg/mp4-class) absent from this environment; a real deployment
    replaces only the fallback branches with PIL/torchaudio/ffmpeg."""
    n = len(media)
    if media_type == "image":
        parsed = _parse_bmp(media) or _parse_png(media)
        if parsed is not None:
            return parsed
        return 16 + n % 64, 16 + n % 48, 1     # compressed-image STUB
    if media_type == "audio":
        parsed = _parse_wav(media)
        if parsed is not None:
            return parsed
        return 0, 0, 1 + n % 100          # STUB: "frames" = chunks
    return 16 + n % 64, 16 + n % 48, 1 + n % 5  # video STUB


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
    """End-to-end: documents → REAL BMP/PNG/WAV containers (video
    stays the raw compressed stand-in) → genuinely parsed feature
    rows. The oracle recomputes the container GEOMETRY from
    strlen(text); the engine reads the same numbers from the parsed
    headers.

    Build and parse are FUSED into one mapInPandas (r11): chaining
    documents_as_media → decode_features serialized every container
    Python→JVM→Python with no JVM operator in between — the blob
    crosses the Arrow boundary zero times now (slim feature rows come
    back, the §8 move-heavy-bytes-once rule). `documents_as_media` +
    `decode_features` stay available for callers that need the
    container frame itself."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = [_build_container(d, m, t)
                     for d, m, t in zip(pdf["doc_id"], pdf["media"],
                                        pdf["media_type"])]
            dims = [_decode(m, t)
                    for m, t in zip(media, pdf["media_type"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(m) for m in media],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            })

    return _media_raw(documents).mapInPandas(fn, FEATURE_SCHEMA)


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
                if frames <= 0:           # defensive (ADVICE r10):
                    continue              # no decode path emits 0 now
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


def media_resize(documents: DataFrame, max_dim: int = 64) -> DataFrame:
    """Container build + decode + resize math fused into ONE
    mapInPandas (same r11 fusion as media_features — the container
    bytes never cross the Arrow boundary); dims come from genuinely
    parsed BMP/PNG/WAV headers, the scaling math from resize_media
    is then exercised on real decoded dimensions."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc, m0, t in zip(pdf["doc_id"], pdf["media"],
                                  pdf["media_type"]):
                m = _build_container(doc, m0, t)
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

    return _media_raw(documents).mapInPandas(fn, RESIZE_SCHEMA)


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
                if frames <= 0:           # defensive (ADVICE r10)
                    continue
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


def encode_media(media_df: DataFrame,
                 passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched media encoder STUB: maps each blob to an
    ``EMB_DIM``-dim integer vector derived from the first md5 nibbles
    of the payload (2·nibble − 15 — odd, so never the zero vector and
    cosine denominators never vanish). A real deployment swaps the
    body for a CLIP/SigLIP image tower over the decoded pixels; the
    Spark shape — mapInPandas over Arrow record batches, blobs never
    shuffled, slim vector rows out — is the production shape.

    ``passthrough`` names slim extra input columns to carry through
    the Arrow stage unchanged (r12: media_text_alignment rides its
    32-char caption digest through here instead of joining back to
    the documents scan for it — a few bytes/row across the boundary
    vs a second corpus scan plus a doc_id shuffle)."""
    import hashlib

    schema = StructType(
        [StructField("doc_id", LongType()),
         StructField("media_type", StringType())]
        + [media_df.schema[c] for c in passthrough]
        + [StructField("media_emb", StringType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for m in pdf["media"]:
                # null payload (e.g. null text upstream) encodes like
                # the empty blob — a dirty corpus must not kill the job
                h = hashlib.md5(b"" if m is None else bytes(m)).hexdigest()
                embs.append(",".join(
                    str(2 * int(h[i], 16) - 15) for i in range(EMB_DIM)))
            out = {"doc_id": pdf["doc_id"],
                   "media_type": pdf["media_type"]}
            for c in passthrough:
                out[c] = pdf[c]
            out["media_emb"] = embs
            yield pd.DataFrame(out)

    return media_df.mapInPandas(fn, schema)


def media_text_alignment(documents: DataFrame) -> DataFrame:
    """Image-text pair curation (the LAION/DataComp CLIP-score gate):
    every media blob is encoded by the Arrow-batched stub tower, its
    caption (the doc text) by a JVM-side stand-in text tower (md5
    nibbles of a salted caption digest), and the pair's cosine
    alignment decides keep/drop. Scores are exact: both towers emit
    odd-integer vectors, so dot and squared norms are exact int64
    and the single double rounding (micro-units) is IEEE-identical
    across engines.

    Scale shape (r12): ONE corpus scan, zero joins — the caption
    digest (md5 of 'cap|'+text, 32 chars/row) is computed JVM-side on
    the media projection (the payload IS the utf-8 caption bytes, so
    md5('cap|'||payload) ≡ md5 of the salted caption string) and
    rides through the Arrow encode stage as a passthrough column;
    scoring is whole-stage-codegen arithmetic above it. The r11 shape
    re-scanned documents and equi-joined the encoder output back on
    doc_id just to rebuild that digest — a second scan plus a
    corpus-wide shuffle/broadcast for 32 bytes/row of derivable data.
    NULL doc_id rows are dropped exactly as the old inner join
    dropped them (NULL never equi-joins)."""
    src = (documents_as_media(documents)
           .filter(F.col("doc_id").isNotNull())
           .withColumn("cap_digest",
                       F.md5(F.concat(F.encode(F.lit("cap|"), "utf-8"),
                                      F.col("media")))))
    enc = encode_media(src, passthrough=("cap_digest",))
    m = F.split("media_emb", ",").cast("array<long>")

    def nib(i: int) -> F.Column:
        a = F.ascii(F.substring(F.col("cap_digest"), i, 1))
        v = F.when(a >= 97, a - 87).otherwise(a - 48)
        return (v * 2 - 15).cast("long")

    t = F.array(*[nib(i + 1) for i in range(EMB_DIM)])
    dot = F.aggregate(F.zip_with(m, t, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    nm = F.aggregate(F.transform(m, lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, v: acc + v)
    nt = F.aggregate(F.transform(t, lambda x: x * x),
                     F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (enc
            .select("doc_id", "media_type",
                    F.round(dot.cast("double")
                            / F.sqrt((nm * nt).cast("double")) * 1e6)
                    .cast("long").alias("align_micro"))
            .withColumn("keep",
                        (F.col("align_micro") >= 0).cast("long")))
