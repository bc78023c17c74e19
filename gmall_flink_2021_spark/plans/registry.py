"""The query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable, paired with the equivalent
DuckDB oracle SQL for the driver's correctness gate.

Conventions that keep the value-hash comparison exact:
 - every aggregate/computed column is aliased identically on both
   sides;
 - monetary aggregates are DECIMAL(18,2) end-to-end (order-
   independent exact arithmetic);
 - doubles are only ever derived by identical sequential IEEE
   operations on both engines (see functions/vectors.py), or rounded
   where an upstream aggregation order is engine-dependent
   (label centroids);
 - events.ts is CAST(ts AS TIMESTAMP) in the oracle because the
   parquet stores nanos (微-aligned) while Spark reads micros;
 - ORDER BY ... LIMIT queries always carry a unique tie-break key.

Registry pruning policy (round 3): every query wrapper's docstring
names the unique plan feature it gates ("Gates: ..."), so every
registry slot (len(QUERIES) is the count of record) is justified.
The near-duplicate candidates were
examined and kept deliberately: token_stats vs bpe_token_stats gate
the split/array path vs the regexp_extract_all path; top_brands vs
top_revenue_supplier gate TakeOrderedAndProject vs a scalar-max
subquery join; gmv_daily vs gmv_daily_delta gate a distinct-combined
aggregate vs the window chain layered on it. A query whose feature
set became a strict subset of another's should be folded here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import expectations, dwm, textstats


from . import analytics as _p_analytics
from . import dedup as _p_dedup
from . import events as _p_events
from . import quality as _p_quality
from . import relational as _p_relational
from . import similarity as _p_similarity
from . import text as _p_text
from ._base import _PROFILE_COLS, _t  # noqa: F401
from ._sql import _ri_rel_sql, _tok_expr  # noqa: F401
from .events import q_visitor_stats_window  # noqa: F401  (driver entry)

_FAMILY_MODULES = (_p_relational, _p_events, _p_dedup, _p_similarity,
                   _p_text, _p_analytics, _p_quality)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in _FAMILY_MODULES:
    for _k in _m.QUERIES:
        assert _k not in QUERIES, f"duplicate registry entry {_k}"
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

# ---------------------------------------------------------------------------
# Identity-gate oracle mirror: the documents pipeline is
# identity-centric (dedup, provenance, chunk/frame addressing all key
# on doc_id), so a NULL primary key is invalid ingest — excluded at
# the canonical load (plans/_base._t; the P1 dirty-side-output
# placement).  Every oracle mirrors the gate with an in-place
# `doc_id IS NOT NULL` predicate on each FROM/JOIN documents
# reference (an earlier mechanical subquery wrap cost the DuckDB
# optimizer its CSE on the tokenization expressions — 1.8× on the
# heavy dedup oracles — so the predicates live in the SQL text where
# they push into the scan; test_plans pins the invariant).  events
# deliberately keep NULL event_id rows: its aggregates count page
# views, which need no identity (only joins on event_id would — and
# NULL never equi-joins, identically in both engines).  embeddings
# are gated inside plans/similarity._EMB_VALID_SQL.
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# Quantitative accuracy gates for the sketch queries
# ---------------------------------------------------------------------------
# The two HLL queries have no value-level oracle (sketch encodings are
# algorithm-specific), so the driver records a rows-only check. These
# gates restore a quantitative criterion locally: each estimate column
# must sit within ~3 standard errors of the EXACT distinct count the
# DuckDB oracle computes on the same keys.
#  - approx_count_distinct(rsd=0.05): σ = rsd ⇒ bound 3·0.05 = 0.15
#  - hll_sketch_agg (datasketches, lgConfigK=12): σ ≈ 1.04/√2¹² ≈
#    0.016 ⇒ bound ~3σ = 0.05
# tests/test_sketch_accuracy.py asserts these per key at sf0.01.

SKETCH_GATES: dict[str, tuple[dict, ...]] = {
    # hll_sketch_agg (datasketches, default lgConfigK=12): σ ≈
    # 1.04/√2¹² ≈ 1.6% ⇒ ~3σ band 0.05, per column
    "profile_sketch_report": (
        {
            "keys": ("col_name",),
            "estimate": "distinct_est",
            "max_rel_err": 0.05,
            "exact_sql": " UNION ALL ".join(
                f"SELECT '{c}' AS col_name, "
                f"count(DISTINCT CAST({c} AS VARCHAR)) AS exact_ct "
                f"FROM documents WHERE doc_id IS NOT NULL"
                for c in _PROFILE_COLS),
        },
    ),
    # percentile_approx(accuracy=10000): rank error ≤ 1e-4 of the
    # group; the VALUE-relative band below is loose enough for any
    # non-degenerate length distribution (quantile_disc exact ref)
    "doc_length_percentiles_approx": tuple(
        {
            "keys": ("lang",),
            "estimate": f"p{p}",
            "max_rel_err": 0.10,
            "exact_sql": f"""
                SELECT lang,
                       CAST(quantile_disc(n_chars, 0.{p}) AS BIGINT)
                           AS exact_ct
                FROM documents WHERE doc_id IS NOT NULL GROUP BY lang
            """,
        }
        for p in (50, 90, 99)
    ),
    "unique_visitors_daily_approx": (
        {
            "keys": ("day",),
            "estimate": "uv_approx",
            "max_rel_err": 0.15,
            "exact_sql": """
                SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS TIMESTAMP) AS day,
                       count(DISTINCT user_id) AS exact_ct
                FROM events GROUP BY 1
            """,
        },
    ),
    "rolling_active_users_approx": (
        {
            "keys": ("day",),
            "estimate": "day_uv_est",
            "max_rel_err": 0.05,
            "exact_sql": """
                SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS TIMESTAMP) AS day,
                       count(DISTINCT user_id) AS exact_ct
                FROM events GROUP BY 1
            """,
        },
        {
            "keys": ("day",),
            "estimate": "rolling_uv_est",
            "max_rel_err": 0.05,
            "exact_sql": """
                WITH ud AS (
                    SELECT DISTINCT user_id,
                           date_trunc('day', CAST(ts AS TIMESTAMP))
                               AS day
                    FROM events
                ),
                expanded AS (
                    SELECT DISTINCT user_id,
                           unnest(generate_series(
                               day, day + INTERVAL 6 DAY,
                               INTERVAL 1 DAY)) AS day
                    FROM ud
                )
                SELECT CAST(day AS TIMESTAMP) AS day,
                       count(*) AS exact_ct
                FROM expanded GROUP BY day
            """,
        },
    ),
    "uv_sketch_rollup": (
        {
            "keys": ("day",),
            "estimate": "daily_uv_est",
            "max_rel_err": 0.05,
            "exact_sql": """
                SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS TIMESTAMP) AS day,
                       count(DISTINCT user_id) AS exact_ct
                FROM events GROUP BY 1
            """,
        },
        {
            "keys": ("month",),
            "estimate": "month_uv_est",
            "max_rel_err": 0.05,
            "exact_sql": """
                SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP))
                            AS TIMESTAMP) AS month,
                       count(DISTINCT user_id) AS exact_ct
                FROM events GROUP BY 1
            """,
        },
    ),
}


# Raw ESTIMATE forms of the sketch queries whose registry entry is the
# round-7 driver-gradeable audit form (exact counters + in-band
# verdicts): the 3σ accuracy gates in tests/test_sketch_accuracy.py
# and the plan pins in tests/test_plans.py run against these, so the
# tight-band evidence survives the grading upgrade.
SKETCH_ESTIMATE_QUERIES: dict[
        str, Callable[[SparkSession, str], DataFrame]] = {
    "unique_visitors_daily_approx": lambda spark, sf:
        dwm.unique_visitors_daily_approx(_t(spark, sf, "events")[0]),
    "rolling_active_users_approx": lambda spark, sf:
        dwm.rolling_uv_sketches(_t(spark, sf, "events")[0]),
    "profile_sketch_report": lambda spark, sf:
        expectations.profile_estimates(expectations.profile_sketches(
            _t(spark, sf, "documents")[0], list(_PROFILE_COLS))),
    "uv_sketch_rollup": lambda spark, sf:
        dwm.uv_sketch_rollup(_t(spark, sf, "events")[0]),
    "doc_length_percentiles_approx": lambda spark, sf:
        textstats.doc_length_percentiles_approx(
            _t(spark, sf, "documents")[0]),
}


# ---------------------------------------------------------------------------
# Output normalization (the driver-hash contract)
# ---------------------------------------------------------------------------
# The driver's value-hash canonicalizes both result sets through pandas,
# where DuckDB DECIMAL columns become float64 while Spark DECIMAL columns
# stay decimal.Decimal objects: `Decimal('34607792.20')` vs `34607792.2`
# stringify differently even though the values are equal, so any result
# containing a trailing-zero decimal hash-mismatches (empirically
# reproduced the full 13-fail/36-pass split of CORRECTNESS_r01).
#
# Therefore: aggregation stays exact DECIMAL *inside* every operator
# (order-independent arithmetic), and the registry boundary presents
# DOUBLE on both sides.  Spark's decimal->double
# (BigDecimal.doubleValue) and CPython's are correctly rounded at
# EVERY magnitude, but DuckDB's direct CAST(decimal AS DOUBLE)
# double-rounds (unscaled int -> double, then /10^scale), forking
# from Spark once |unscaled| >= 2^53 (~9e13 at scale 2; probed round
# 10: 14 forks in 51 boundary candidates).  The oracle side therefore
# routes the presentation through VARCHAR — DuckDB's decimal->text is
# exact and text->double is strtod, correctly rounded — making the
# conversion bit-identical on all three sides at all magnitudes up to
# double overflow (verified: 0 forks over 120k random unscaled values
# spanning ±10^24 plus the 2^53 neighborhood; pinned by
# tests/test_relational_edges.py::test_decimal_double_presentation_2e53).

_DECIMAL_OUT: dict[str, tuple[str, ...]] = {
    "pricing_summary": ("sum_qty", "sum_base_price", "sum_disc_price",
                        "sum_charge"),
    "segment_revenue": ("revenue",),
    "region_revenue": ("revenue",),
    "top_brands": ("revenue",),
    "gmv_daily": ("gmv",),
    "order_wide_stats": ("order_amount",),
    "visitor_stats_window": ("value_sum",),
    "event_stats_daily": ("purchase_amount",),
    "province_stats_sql": ("order_amount",),
    "click_purchase_join": ("amount",),
    "gmv_daily_delta": ("gmv", "gmv_delta", "gmv_running"),
    "priority_rollup": ("gmv",),
    "revenue_forecast": ("revenue",),
    "promo_revenue_share": ("promo_revenue", "total_revenue"),
    "disjunctive_revenue": ("revenue",),
    "large_volume_customers": ("o_totalprice", "total_qty"),
    "bilateral_trade": ("revenue",),
    "top_revenue_supplier": ("total_revenue",),
    "small_qty_part_revenue": ("revenue",),
    "high_balance_inactive_customers": ("total_acctbal",),
    "nation_year_revenue": ("revenue",),
    "price_tier_stats": ("gmv",),
    "region_segment_cube": ("gmv",),
    "salted_brand_revenue": ("revenue",),
    "purchase_click_window_join": ("amount",),
    "grouping_sets_revenue": ("revenue",),
    "returned_item_customers": ("revenue",),
    "nation_market_share": ("nation_revenue", "total_revenue"),
    "visitor_stats_sliding": ("value_sum",),
    "customer_value_quartiles": ("min_spend", "max_spend", "total_spend"),
}


def _doubled(fn: Callable[[SparkSession, str], DataFrame]
             ) -> Callable[[SparkSession, str], DataFrame]:
    """Cast every DECIMAL output column to double (schema-driven, so a
    future operator change can't silently reintroduce a decimal)."""
    import functools

    from pyspark.sql.types import DecimalType

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        if not any(isinstance(f.dataType, DecimalType)
                   for f in df.schema.fields):
            return df
        return df.select(*[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType) else F.col(f.name)
            for f in df.schema.fields])

    return wrapped


def _doubled_sql(sql: str, cols: tuple[str, ...]) -> str:
    # VARCHAR route, not a direct CAST(c AS DOUBLE): see the
    # presentation-contract comment above (DuckDB's direct cast
    # double-rounds above 2^53 unscaled; text->double is strtod,
    # correctly rounded like Spark/CPython at every magnitude)
    reps = ", ".join(
        f"CAST(CAST({c} AS VARCHAR) AS DOUBLE) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({reps}) FROM (\n{sql}\n)"


# ---------------------------------------------------------------------------
# Grading priority: the driver grades the first ~50 registry entries per
# round.  Order queries so every entry still lacking a driver-green
# CORRECTNESS row (never graded, or graded before an output-contract
# change) sits inside that window; stable-green entries rotate to the
# back.  Rotate per round.
# ---------------------------------------------------------------------------

# Queries whose OUTPUT CONTRACT changed (new queries, semantics
# changes), mapped to the round the change landed in — promoted to
# the very front of the grading window until an artifact of that
# round (or newer) has graded them green, because artifact-derived
# staleness cannot know about in-flight changes. Append on change;
# entries expire automatically once confirmed.
# --- rotation invariant (round 8; ceiling decision round 9) ---------
# The driver grades the first GRADE_WINDOW registry entries per round.
# Documented ceiling: every live query's newest green CORRECTNESS row
# must be from one of the last ROTATION_CEILING_ROUNDS rounds.
#
# Round-9 consolidation folded doc_length_percentiles into its
# sketch audit (150 entries), which makes 3×50 arithmetically exact —
# but the DECISION (VERDICT r8 #5's alternative) is to KEEP the
# ceiling at FOUR rounds: a provable 3-round cycle offers 150 slots
# with ZERO slack, so any single contract-change promotion (queries
# needing a re-grade the round their output contract changes — 3-6
# per round historically) displaces a stale re-grade past round 3.
# The 4-round cycle offers 200 slots = 50 promotion-slack slots,
# which `test_registry_fits_rotation_ceiling` enforces as a ≥20-slot
# budget. Lowering to 3 honestly requires the registry at ≤130.
#
# Round-10 decision (VERDICT r9 #6): KEEP 150 entries + the 4-round
# ceiling rather than folding to ≤147 — every remaining
# near-duplicate pair gates a distinct plan feature (see the pruning
# policy in the module docstring), and the slack arithmetic is now
# REALIZED-order-enforced, not just documented:
# `test_pending_promotions_are_in_next_window` asserts every pending
# contract-change promotion sits inside the next grading window,
# alongside the existing at-risk assertion — a starved rotation is a
# failing suite before the driver ever runs.
# `tests/test_rotation_invariant.py` computes the realized staleness
# from the CORRECTNESS artifacts and FAILS the suite when any query
# exceeds the ceiling or is about to (at-risk query not in the next
# window) — the invariant is enforced by test, not by manual
# arithmetic.
GRADE_WINDOW = 50
ROTATION_CEILING_ROUNDS = 4

# ---------------------------------------------------------------------------
# Oracle feasibility ceiling (VERDICT r8 #2, machine-readable).
# Values are the largest sf0.1-replica factor at which the query's
# DuckDB oracle is still runnable on a 128 GB box; the ENGINE side
# has no ceiling.  cross_source_dup_matrix: the oracle's exact-dup
# axis pair-expands md5-equal groups across sources — at x16 that
# expansion needs >115 GB of working set (OOM-killed at ~97 GB RSS,
# dmesg-confirmed; a 35 GB-capped retry exhausted 80 GB of spill
# disk) while the engine's banded-LSH + capped-candidate substrate
# finishes the same input in 25.1 s.  Value-exactness is proven
# through x10 (1161 s oracle wall, PASS — SCALE.md round 8).
# tests/run_parity.py honors this: above the ceiling it runs the
# ENGINE side only and reports ORACLE-INFEASIBLE (counted as a skip,
# not a pass), so a full-corpus sweep needs zero prose exceptions.
# ---------------------------------------------------------------------------
ORACLE_INFEASIBLE_ABOVE: dict[str, int] = {
    "cross_source_dup_matrix": 10,
}


REPLICA_MARKER = "replica_factor.json"


def replica_factor(sf_dir: str) -> int:
    """Replica factor of a corpus directory relative to sf0.1, read
    from the explicit ``replica_factor.json`` marker that
    tests/stress_scale.replicate writes next to the tables
    (``{"factor": N}``).  Directories without the marker
    (sf0.001/sf0.01/sf0.1, adversarial corpora, pytest tmp dirs) are
    at-or-below the bench scale and map to 1.  The marker replaces
    the earlier basename ``_x{N}`` pattern-match (ADVICE r9): a path
    coincidentally ending in ``_x16`` must NOT silently downgrade a
    parity sweep to engine-only."""
    import json
    import os

    marker = os.path.join(sf_dir, REPLICA_MARKER)
    if os.path.isfile(marker):
        try:
            with open(marker) as fh:
                return int(json.load(fh)["factor"])
        except (ValueError, KeyError, TypeError, OSError) as e:
            raise ValueError(
                f"corrupt replica marker {marker}: expected JSON of "
                f'shape {{"factor": N}} ({e})') from e
    return 1


def oracle_is_feasible(name: str, sf_dir: str) -> bool:
    """False when ``name``'s DuckDB oracle is pinned infeasible at
    ``sf_dir``'s replica factor (ORACLE_INFEASIBLE_ABOVE)."""
    return replica_factor(sf_dir) <= ORACLE_INFEASIBLE_ABOVE.get(
        name, 10**9)

_CHANGED_THIS_ROUND: dict[str, int] = {
    # (rounds 4-6 entries all confirmed green by their round's
    # artifact — expired, removed)
    # round 7: sketch queries upgraded from rows-only estimates to
    # driver-gradeable audit forms (exact counters + in-band verdicts
    # with real oracles). NOTE the window arithmetic: the registry
    # holds 151 queries against a 50/round grading window, so a full
    # ≤3-round rotation needs ≥151/3 ≈ 50.3 slots/round — it is
    # over-subscribed by construction; these 3 promotions (one of
    # which was due for re-grade anyway) push 3 stale-r4 queries to
    # round 8, where they sort first.
    "unique_visitors_daily_approx": 7,
    "rolling_active_users_approx": 7,
    "profile_sketch_report": 7,
    # landed in round 7 but scheduled to GRADE in round 8 (their r6
    # green is the freshest tier, and round 7's window is already
    # over-subscribed by the three above) — the max_round guard in
    # _finalize keeps a future-round entry from eating earlier slots
    "uv_sketch_rollup": 8,
    "doc_length_percentiles_approx": 8,
    # ws_token_ct -> engine_token_ct rename (ADVICE r6); bpe_token_stats
    # is r5-green so it re-grades in round 8 anyway — zero extra slots
    "bpe_token_stats": 8,
    # round 8: frame hashes became md5-of-hex-of-byte-slice (the
    # adversarial-fuzz fix that makes multi-byte frame content oracle-
    # expressible) — friendly-data hash VALUES change, so the contract
    # is re-certified the round it next grades; frame_dedup is
    # r6-green and rotates into round 9 anyway — zero extra slots
    "frame_dedup": 9,
    # round 9: the interpolated exact profile (former
    # doc_length_percentiles entry) merged into the audit's output
    # contract (p{50,90,99}_interp columns) — registry consolidation
    # to 150 entries (VERDICT r8 #5); the audit re-grades in round 9
    "doc_length_percentiles_approx": 9,
    # round 10: image/audio payloads became REAL BMP/WAV containers
    # genuinely parsed by _decode (VERDICT r9 #5); round 11: half the
    # image corpus (doc_id%6!=0) became spec-valid zlib-compressed
    # PNGs with a genuine stdlib inflate+defilter decode (VERDICT r10
    # #3) — n_bytes/dims change for those rows, so both queries
    # re-certify in round 11's window
    "media_features": 11,
    "media_resize": 11,
    # round 12 (VERDICT r11 #1): queries whose PHYSICAL PLANS the r11
    # optimization round restructured (outputs proven identical
    # against the DuckDB oracle pre-commit, but their driver grades
    # predate the restructure) — promoted so CORRECTNESS_r12 samples
    # them first and the semantic-preservation claim stops being
    # self-certified. Plus the two r8-stale names, and the query
    # restructured in round 12 itself (media_text_alignment
    # join-back removal).
    "minhash_dedup_marks": 12,
    "minhash_band_pairs": 12,
    "minhash_jaccard_pairs": 12,
    "minhash_signatures": 12,
    "semdedup_prune": 12,
    "kmeans_clusters": 12,
    "profile_drift": 12,
    "dup_clusters": 12,
    "dedup_keep_best": 12,
    "embedding_dups_lsh": 12,
    "corpus_funnel": 12,
    "corpus_filter": 12,
    "near_dup_rate_by_source": 12,
    "cross_source_dup_matrix": 12,
    "dedup_provenance": 12,
    "dedup_threshold_calibration": 12,
    "frame_dedup": 12,
    "media_text_alignment": 12,
    "rfm_segments": 12,
    "video_frame_samples": 12,
}

_GRADE_PRIORITY: tuple[str, ...] = (
    # STATIC FALLBACK ordering, used only when no CORRECTNESS_r*.json
    # artifacts are readable (fresh clone) — otherwise _finalize
    # derives the order from artifact staleness automatically
    # (self-rotating window; see _staleness_order).
    # new/changed in round 4 (classifier scorer is new; nulls-last
    # ranking; candidate cap):
    "hashed_classifier_scores", "contrastive_pairs",
    "minhash_jaccard_pairs",
    # newest green row is from round 1:
    "exact_dups", "minhash_signatures", "minhash_band_pairs",
    "token_stats", "quality_scores", "lang_id", "fingerprints",
    "knn_bruteforce", "simhash_signatures",
    "label_centroid_similarity", "ivf_ann", "top_orders_per_segment",
    "sessionize", "customers_without_orders", "media_features",
    "late_shipment_priority", "funnel_conversion",
    "video_frame_samples", "unique_visitors_daily_approx",
    "top_supplier_per_nation", "corpus_filter", "train_val_split",
    "order_count_distribution",
    # newest green row is from round 2:
    "dup_clusters", "dedup_summary", "simhash_band_pairs",
    "repetition_stats", "doc_top_terms", "term_df_stats",
    "bpe_token_stats", "lsh_ann", "norm_histogram", "pricing_summary",
    "segment_revenue", "region_revenue", "top_brands", "gmv_daily",
    "order_wide_stats", "visitor_stats_window", "event_stats_daily",
    "province_stats_sql", "click_purchase_join", "gmv_daily_delta",
    "priority_rollup", "revenue_forecast", "promo_revenue_share",
    "disjunctive_revenue", "large_volume_customers", "bilateral_trade",
    "top_revenue_supplier", "small_qty_part_revenue",
    "high_balance_inactive_customers", "nation_year_revenue",
    "purchase_attribution", "price_tier_stats", "region_segment_cube",
    "stratified_sample", "media_resize",
    "salted_brand_revenue", "purchase_click_window_join",
    "hourly_activity_pivot", "retention_cohorts",
    "native_session_windows", "quantization_error",
    "returnflag_priority_stats", "part_supplier_variety",
    "sole_late_suppliers", "grouping_sets_revenue",
    "returnflag_part_overlap", "returned_item_customers",
    "nation_market_share", "visitor_stats_sliding",
)


def _staleness_order(queries, root: str | None = None):
    """Self-rotating grading window: the driver grades the FIRST 50
    registry entries each round, so order queries by the round of
    their newest green CORRECTNESS row (never-graded first, then
    stalest), read from the CORRECTNESS_r*.json artifacts the driver
    leaves in the repo root. Every round the window then rotates
    automatically — no manual reorder. `_GRADE_PRIORITY` still jumps
    the queue for queries whose OUTPUT CONTRACT changed this round
    (not derivable from artifacts). Returns None when no artifacts
    are readable (fresh clone) — the static list then stands alone."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    found = False
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(p))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        found = True
        for name, v in rows.items():
            green = bool(v.get("hash_match")) or (
                v.get("err") == "no_oracle"
                and v.get("spark_rows") is not None)
            if green and rnd > latest.get(name, 0):
                latest[name] = rnd
    if not found:
        return None
    names = list(queries)
    order = sorted(names,
                   key=lambda n: (latest.get(n, 0), names.index(n)))
    max_round = max(latest.values(), default=0)
    return order, latest, max_round


def _finalize(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracles: dict[str, str],
) -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]],
           dict[str, str]]:
    staleness = _staleness_order(queries)
    if staleness is None:
        order = [n for n in _GRADE_PRIORITY if n in queries]
        order += [n for n in queries if n not in _GRADE_PRIORITY]
    else:
        base, latest, _max_round = staleness
        # promote contract-changed queries only until an artifact of
        # the change's round (or newer) has graded them green — after
        # that the change is confirmed and normal staleness rotation
        # resumes (a stale promotion entry cannot waste window slots
        # in later rounds, and a pre-change green row cannot expire
        # the promotion early). A change stamped for a FUTURE round
        # (chg > max_round + 1) stays dormant until that round
        # arrives, so landing code early cannot eat earlier windows.
        changed = [n for n, chg in _CHANGED_THIS_ROUND.items()
                   if n in queries and latest.get(n, 0) < chg
                   and _max_round >= chg - 1]
        order = changed + [n for n in base if n not in changed]
    q = {n: _doubled(queries[n]) for n in order}
    o = {}
    for n in order:
        if n not in oracles:
            continue
        sql = oracles[n]
        if n in _DECIMAL_OUT:
            sql = _doubled_sql(sql, _DECIMAL_OUT[n])
        o[n] = sql
    return q, o


QUERIES, ORACLES = _finalize(QUERIES, ORACLES)
