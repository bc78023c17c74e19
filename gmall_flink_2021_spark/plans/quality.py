"""Plans: data-quality, profiling and multimodal family (queries + mirrored DuckDB oracles)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import expectations, multimodal

from ._base import (  # noqa: F401
    _DRIFT_COLS, _PROFILE_COLS, _RI_RELATIONS, _t)
from ._sql import (  # noqa: F401
    _profile_sql,
    _ri_rel_sql)

def q_media_text_alignment(spark, sf):
    """Gates: CLIP-score-style image-text pair curation — Arrow-batched
    stub media tower + JVM text tower, exact integer dot/norms, one
    IEEE-identical micro rounding; the LAION/DataComp filter gate."""
    (documents,) = _t(spark, sf, "documents")
    return multimodal.media_text_alignment(documents)

def q_media_features(spark, sf):
    """Gates: Arrow-batched mapInPandas typed-metadata extraction over
    binary media columns."""
    (documents,) = _t(spark, sf, "documents")
    return multimodal.media_features(documents)

def q_video_frame_samples(spark, sf):
    """Gates: deterministic frame sampling via posexplode over per-row
    frame counts."""
    (documents,) = _t(spark, sf, "documents")
    return multimodal.video_frame_samples(documents)

def q_media_resize(spark, sf):
    """Gates: Arrow-batched mapInPandas resize plumbing (stubbed decode,
    real batch shape)."""
    (documents,) = _t(spark, sf, "documents")
    return multimodal.media_resize(documents)

def q_frame_dedup(spark, sf):
    """Gates: multimodal DEDUP composition — frame-level content hashes
    computed inside the Arrow mapInPandas fan-out, aggregated by hash
    (planted re-uploads make the duplicate path nonzero; oracle
    mirrors the byte-slice hashing with substr+md5)."""
    (documents,) = _t(spark, sf, "documents")
    return multimodal.frame_dedup(documents)

def q_data_quality_report(spark, sf):
    """Gates: declarative data-quality expectations (Deequ-style)
    compiled into ONE conditional-aggregation pass — not-null /
    uniqueness / range / accepted-values metrics in integer permille
    with pass flags."""
    (orders,) = _t(spark, sf, "orders")
    rules = [
        {"name": "custkey_not_null", "kind": "not_null",
         "column": "o_custkey", "min_permille": 999},
        {"name": "orderkey_unique", "kind": "unique",
         "column": "o_orderkey", "min_permille": 1000},
        {"name": "totalprice_positive", "kind": "range",
         "column": "o_totalprice", "lo": 0, "min_permille": 1000},
        {"name": "status_accepted", "kind": "accepted_values",
         "column": "o_orderstatus", "values": ["O", "F", "P"],
         "min_permille": 1000},
        {"name": "priority_format", "kind": "matches_regex",
         "column": "o_orderpriority", "pattern": "^[1-5]-[A-Z ]+$",
         "min_permille": 1000},
    ]
    return expectations.validate(orders, rules)

def q_source_quality_report(spark, sf):
    """Gates: PER-GROUP expectations — the rule grid keyed by source in
    one grouped conditional-aggregation pass (catches a single bad
    source a table-level gate averages away)."""
    (documents,) = _t(spark, sf, "documents")
    rules = [
        {"name": "text_not_null", "kind": "not_null",
         "column": "text", "min_permille": 1000},
        {"name": "chars_in_range", "kind": "range", "column": "n_chars",
         "lo": 1, "hi": 100000, "min_permille": 900},
        {"name": "doc_id_unique", "kind": "unique",
         "column": "doc_id", "min_permille": 1000},
    ]
    return expectations.validate_by(documents, "source", rules)

def q_profile_drift(spark, sf):
    """Gates: snapshot profile monitoring — stack-based unpivot
    profiling with ONE scan for both snapshot sides (the old side is
    a slice of the new, so the unpivot carries a membership flag and
    a two-level (col, val)-keyed aggregation derives both sides'
    counts — no second pass, no multi-distinct Expand). Old snapshot
    = orders minus the o_orderkey % 17 == 5 slice; rows identical to
    the two-sided profile_drift form (r11 optimization)."""
    (orders,) = _t(spark, sf, "orders")
    return expectations.profile_drift_sliced(
        orders, F.col("o_orderkey") % 17 != 5, list(_DRIFT_COLS))

def q_profile_sketch_report(spark, sf):
    """Gates: MERGEABLE column profiling — exact additive counters +
    per-column HLL sketches (stack unpivot, one grouped sketch agg),
    the no-distinct-shuffle monitoring substrate whose shard/stream
    merges equal the single-pass profile exactly. Rows-only at the
    driver (sketch estimates); 3σ accuracy gate in SKETCH_GATES /
    tests/test_sketch_accuracy.py; streaming merge pinned in
    tests/test_streaming.py (exact counters, sparse-mode sketches
    bit-exact, dense estimates banded). Round 7: graded as an accuracy
    AUDIT — exact counters + exact distinct + ~5σ in-band verdict,
    hash-checked against a SQL oracle (previously rows-only); the
    estimate form stays in SKETCH_ESTIMATE_QUERIES."""
    (documents,) = _t(spark, sf, "documents")
    return expectations.profile_accuracy_audit(
        documents, list(_PROFILE_COLS))

def q_referential_integrity(spark, sf):
    """Gates: cross-table referential-integrity report — each
    relationship reduces the child to a map-side (fk, count)
    aggregate before the keys-only parent join (never raw fact rows);
    null-FK vs orphan split, integer permille resolution."""
    tables = {}
    for child, fk, parent, pk, name in _RI_RELATIONS:
        for t in (child, parent):
            if t not in tables:
                (tables[t],) = _t(spark, sf, t)
    rels = [(tables[c], fk, tables[p], pk, name)
            for c, fk, p, pk, name in _RI_RELATIONS]
    return expectations.referential_integrity_audit(rels)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_features": q_media_features,
    "video_frame_samples": q_video_frame_samples,
    "media_resize": q_media_resize,
    "media_text_alignment": q_media_text_alignment,
    "frame_dedup": q_frame_dedup,
    "data_quality_report": q_data_quality_report,
    "source_quality_report": q_source_quality_report,
    "referential_integrity": q_referential_integrity,
    "profile_drift": q_profile_drift,
    "profile_sketch_report": q_profile_sketch_report,
}

ORACLES: dict[str, str] = {
    "frame_dedup": """
        WITH v AS (
            -- hex the whole payload once, slice at 2x byte offsets:
            -- byte-faithful frame content for multi-byte payloads
            -- (mirrors the Spark frame_hashes hex kernel; DuckDB has
            -- no BLOB substring/md5)
            SELECT doc_id,
                   lower(hex(encode(
                        CASE WHEN doc_id % 3 = 2 AND doc_id % 11 = 0
                        THEN repeat('shared-intro ', 16) || 'tail42'
                        ELSE coalesce(text, '') END))) AS phex
            FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 NOT IN (0, 1)),
        s AS (
            SELECT doc_id, phex, length(phex) // 2 AS n,
                   1 + (length(phex) // 2) % 5 AS fr
            FROM v),
        f AS (
            SELECT doc_id,
                   md5(substr(phex,
                              CAST(i * (n // fr) * 2 AS INT) + 1,
                              CAST((n // fr) * 2 AS INT))) AS frame_hash
            FROM s, unnest(range(0, fr)) AS t(i)
            WHERE n // fr > 0)
        SELECT frame_hash, count(*) AS occurrence_ct,
               count(DISTINCT doc_id) AS video_ct,
               min(doc_id) AS first_doc
        FROM f GROUP BY frame_hash HAVING count(*) > 1
    """,
    "media_features": """
        -- mirrors the REAL-container contract: image docs are
        -- genuine containers — 24-bit BMP for doc_id%6=0 (n_bytes =
        -- 54-byte headers + 4-byte-padded row grid; width 1+B%96,
        -- height 1+B%20), spec-valid PNG for the rest (r11: width
        -- 1+B%80, height 1+B%24; n_bytes = 8 sig + 25 IHDR + 12 IEND
        -- + 12+z IDAT where the stored-deflate stream z = 6 + nraw +
        -- 5*ceil(nraw/65535) over nraw = height*(1+3*width) filtered
        -- scanline bytes) — audio docs genuine 16-bit mono PCM WAVs
        -- (n_bytes = 44 + block-aligned data; samples = ceil(B/2));
        -- video stays the raw compressed stand-in (fake-decode
        -- arithmetic).  The ENGINE reads these numbers from genuinely
        -- parsed (for PNG: inflated + defiltered) containers; the
        -- oracle recomputes the geometry from B = strlen bytes.
        WITH m AS (
            SELECT doc_id, strlen(coalesce(text, '')) AS n
            FROM documents WHERE doc_id IS NOT NULL),
        g AS (
            SELECT doc_id, n,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   doc_id % 6 = 0 AS is_bmp,
                   1 + n % 96 AS bw, 1 + n % 20 AS bh,
                   1 + n % 80 AS pw, 1 + n % 24 AS ph
            FROM m),
        g2 AS (
            SELECT *, ph * (1 + 3 * pw) AS nraw FROM g)
        SELECT doc_id, media_type,
               CAST(CASE WHEN media_type = 'image' AND is_bmp
                         THEN 54 + ((3 * bw + 3) // 4) * 4 * bh
                         WHEN media_type = 'image'
                         THEN 63 + nraw + 5 * ((nraw + 65534) // 65535)
                         WHEN media_type = 'audio'
                         THEN 44 + n + (n % 2)
                         ELSE n END AS BIGINT) AS n_bytes,
               CAST(CASE WHEN media_type = 'image' AND is_bmp THEN bw
                         WHEN media_type = 'image' THEN pw
                         WHEN media_type = 'audio' THEN 0
                         ELSE 16 + n % 64 END AS INT) AS width,
               CAST(CASE WHEN media_type = 'image' AND is_bmp THEN bh
                         WHEN media_type = 'image' THEN ph
                         WHEN media_type = 'audio' THEN 0
                         ELSE 16 + n % 48 END AS INT) AS height,
               CAST(CASE WHEN media_type = 'image' THEN 1
                         WHEN media_type = 'audio' THEN (n + 1) // 2
                         ELSE 1 + n % 5 END AS INT) AS n_frames
        FROM g2
    """,
    "video_frame_samples": """
        WITH m AS (
            SELECT doc_id, strlen(coalesce(text, '')) AS n
            FROM documents
            WHERE doc_id IS NOT NULL AND doc_id % 3 NOT IN (0, 1))
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * (n // (1 + n % 5)) AS BIGINT) AS frame_offset
        FROM m, unnest(range(0, 1 + n % 5)) AS t(i)
    """,
    "media_resize": """
        -- REAL-container dims: image = parsed BMP (doc_id%6=0:
        -- 1+B%96 x 1+B%20) or genuinely decoded PNG (r11: 1+B%80 x
        -- 1+B%24), audio = parsed WAV (0 x 0, ceil(B/2) samples,
        -- out_bytes = whole container), video = the raw compressed
        -- stand-in's fake-decode arithmetic
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   doc_id % 6 = 0 AS is_bmp,
                   strlen(coalesce(text, '')) AS n
            FROM documents WHERE doc_id IS NOT NULL),
        dims0 AS (
            SELECT doc_id, media_type, n AS b,
                   CASE WHEN media_type = 'audio' THEN 0
                        WHEN media_type = 'image' AND is_bmp
                        THEN 1 + n % 96
                        WHEN media_type = 'image' THEN 1 + n % 80
                        ELSE 16 + n % 64 END AS width,
                   CASE WHEN media_type = 'audio' THEN 0
                        WHEN media_type = 'image' AND is_bmp
                        THEN 1 + n % 20
                        WHEN media_type = 'image' THEN 1 + n % 24
                        ELSE 16 + n % 48 END AS height,
                   CASE WHEN media_type = 'image' THEN 1
                        WHEN media_type = 'audio' THEN (n + 1) // 2
                        ELSE 1 + n % 5 END AS frames,
                   is_bmp
            FROM base),
        dims AS (
            -- n = the payload the engine holds: whole container for
            -- image/audio, raw bytes for video (image n is unused by
            -- out_bytes — resized RGB bytes are computed from dims)
            SELECT doc_id, media_type, width, height, frames,
                   CASE WHEN media_type = 'audio' THEN 44 + b + (b % 2)
                        WHEN media_type = 'image' AND is_bmp
                        THEN 54 + ((3 * width + 3) // 4) * 4 * height
                        WHEN media_type = 'image'
                        THEN 63 + height * (1 + 3 * width)
                             + 5 * ((height * (1 + 3 * width)
                                     + 65534) // 65535)
                        ELSE b END AS n
            FROM dims0),
        scaled AS (
            SELECT *, greatest(width, height) AS mx FROM dims),
        resized AS (
            SELECT doc_id, media_type, width, height, frames, n,
                   CASE WHEN media_type = 'audio' OR mx <= 64 THEN width
                        ELSE greatest(width * 64 // mx, 1)
                        END AS new_width,
                   CASE WHEN media_type = 'audio' OR mx <= 64 THEN height
                        ELSE greatest(height * 64 // mx, 1)
                        END AS new_height
            FROM scaled)
        SELECT doc_id, media_type,
               CAST(width AS INT) AS width, CAST(height AS INT) AS height,
               CAST(new_width AS INT) AS new_width,
               CAST(new_height AS INT) AS new_height,
               CAST(CASE WHEN media_type = 'audio' THEN n
                         ELSE new_width * new_height * 3 * frames
                    END AS BIGINT) AS out_bytes
        FROM resized
    """,
    "data_quality_report": """
        WITH m AS (
            SELECT count(*) AS n,
                   coalesce(sum(CASE WHEN o_custkey IS NOT NULL
                                     THEN 1 ELSE 0 END), 0) AS m0,
                   count(DISTINCT o_orderkey) AS m1,
                   coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                             AND o_totalprice >= 0 THEN 1 ELSE 0 END),
                            0) AS m2,
                   coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                            THEN 1 ELSE 0 END), 0) AS m3,
                   coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
                             AND regexp_matches(o_orderpriority,
                                                '^[1-5]-[A-Z ]+$')
                            THEN 1 ELSE 0 END), 0) AS m4
            FROM orders),
        rows_ AS (
            SELECT 'custkey_not_null' AS rule,
                   CAST(m0 * 1000 // greatest(n, 1) AS BIGINT)
                       AS metric_permille,
                   CAST(999 AS BIGINT) AS min_permille FROM m
            UNION ALL
            SELECT 'orderkey_unique',
                   CAST(m1 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(1000 AS BIGINT) FROM m
            UNION ALL
            SELECT 'totalprice_positive',
                   CAST(m2 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(1000 AS BIGINT) FROM m
            UNION ALL
            SELECT 'status_accepted',
                   CAST(m3 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(1000 AS BIGINT) FROM m
            UNION ALL
            SELECT 'priority_format',
                   CAST(m4 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(1000 AS BIGINT) FROM m)
        SELECT rule, metric_permille, min_permille,
               CAST(CASE WHEN metric_permille >= min_permille
                         THEN 1 ELSE 0 END AS BIGINT) AS passed
        FROM rows_
    """,
    "source_quality_report": """
        WITH m AS (
            SELECT source, count(*) AS n,
                   sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS m0,
                   sum(CASE WHEN n_chars IS NOT NULL AND n_chars >= 1
                             AND n_chars <= 100000 THEN 1 ELSE 0 END) AS m1,
                   count(DISTINCT doc_id) AS m2
            FROM documents WHERE doc_id IS NOT NULL GROUP BY source),
        rows_ AS (
            SELECT source, 'text_not_null' AS rule,
                   CAST(m0 * 1000 // greatest(n, 1) AS BIGINT)
                       AS metric_permille,
                   CAST(1000 AS BIGINT) AS min_permille FROM m
            UNION ALL
            SELECT source, 'chars_in_range',
                   CAST(m1 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(900 AS BIGINT) FROM m
            UNION ALL
            SELECT source, 'doc_id_unique',
                   CAST(m2 * 1000 // greatest(n, 1) AS BIGINT),
                   CAST(1000 AS BIGINT) FROM m)
        SELECT source, rule, metric_permille, min_permille,
               CAST(CASE WHEN metric_permille >= min_permille
                         THEN 1 ELSE 0 END AS BIGINT) AS passed
        FROM rows_
    """,
}


ORACLES["media_text_alignment"] = """
    WITH vecs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 1, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 1, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 1, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m0,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 2, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 2, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 2, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m1,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 3, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 3, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 3, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m2,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 4, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 4, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 4, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m3,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 5, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 5, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 5, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m4,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 6, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 6, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 6, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m5,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 7, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 7, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 7, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m6,
               CAST(((CASE WHEN ascii(substr(md5(coalesce(text, '')), 8, 1)) >= 97 THEN ascii(substr(md5(coalesce(text, '')), 8, 1)) - 87 ELSE ascii(substr(md5(coalesce(text, '')), 8, 1)) - 48 END) * 2 - 15) AS BIGINT) AS m7,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 1, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 1, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 1, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t0,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 2, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 2, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 2, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t1,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 3, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 3, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 3, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t2,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 4, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 4, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 4, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t3,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 5, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 5, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 5, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t4,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 6, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 6, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 6, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t5,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 7, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 7, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 7, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t6,
               CAST(((CASE WHEN ascii(substr(md5('cap|' || coalesce(text, '')), 8, 1)) >= 97 THEN ascii(substr(md5('cap|' || coalesce(text, '')), 8, 1)) - 87 ELSE ascii(substr(md5('cap|' || coalesce(text, '')), 8, 1)) - 48 END) * 2 - 15) AS BIGINT) AS t7
        FROM documents WHERE doc_id IS NOT NULL
    ),
    scored AS (
        SELECT doc_id, media_type,
               CAST(round(CAST(m0 * t0 + m1 * t1 + m2 * t2 + m3 * t3 + m4 * t4 + m5 * t5 + m6 * t6 + m7 * t7 AS DOUBLE)
                          / sqrt(CAST((m0 * m0 + m1 * m1 + m2 * m2 + m3 * m3 + m4 * m4 + m5 * m5 + m6 * m6 + m7 * m7) * (t0 * t0 + t1 * t1 + t2 * t2 + t3 * t3 + t4 * t4 + t5 * t5 + t6 * t6 + t7 * t7) AS DOUBLE))
                          * 1e6) AS BIGINT) AS align_micro
        FROM vecs
    )
    SELECT doc_id, media_type, align_micro,
           CAST(CASE WHEN align_micro >= 0 THEN 1 ELSE 0 END AS BIGINT)
               AS keep
    FROM scored
"""


ORACLES["profile_drift"] = f"""
    WITH oldt AS (SELECT * FROM orders WHERE o_orderkey % 17 <> 5),
    po AS ({_profile_sql('oldt', 'old')}),
    pn AS ({_profile_sql('orders', 'new')})
    SELECT po.col_name, old_ct, new_ct, old_null_ct, new_null_ct,
           old_distinct_ct, new_distinct_ct,
           new_distinct_ct - old_distinct_ct AS distinct_delta,
           (new_null_ct * 1000 // greatest(new_ct, 1))
         - (old_null_ct * 1000 // greatest(old_ct, 1))
               AS null_permille_delta
    FROM po JOIN pn USING (col_name)
"""


ORACLES["referential_integrity"] = " UNION ALL ".join(
    _ri_rel_sql(c, fk, p, pk, n) for c, fk, p, pk, n in _RI_RELATIONS)

ORACLES["profile_sketch_report"] = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS ct, "
    f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)"
    f" AS BIGINT)"
    f" AS null_ct, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS distinct_exact, "
    f"CAST(1 AS BIGINT) AS distinct_in_band FROM documents WHERE doc_id IS NOT NULL"
    for c in _PROFILE_COLS)
