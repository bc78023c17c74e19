"""Shared DuckDB-oracle SQL fragment builders (used by more than
one family module or by the grading layer)."""

from __future__ import annotations



from ..operators import dedup, similarity, textstats


from ._base import (  # noqa: F401
    _DRIFT_COLS, _PROFILE_COLS, _RI_RELATIONS, _emb_key, _t)

# --------------------------------------------------------------------------
# DuckDB oracle SQL
# --------------------------------------------------------------------------

# Shared CTE fragments for the text queries.

# Mirror of functions/text.tokens: whitespace split + Han-run
# (U+4E00-U+9FFF) codepoint bigrams. THE SAME pattern constant as the
# engine (literal Han chars, valid in RE2 and Java regex alike) —
# imported, not re-derived, so a block change can never fork the
# oracle from the tokenizer.
from ..functions.text import HAN_ANY as _HAN  # noqa: E402


def _tok_expr(col: str) -> str:
    """DuckDB expression producing the engine's token array for a
    text column — bit-for-bit tokens() (functions/text.py)."""
    return f"""flatten(list_transform(
        list_filter(string_split(
            regexp_replace(coalesce({col}, ''), '({_HAN}+)', ' \\1 ', 'g'),
            ' '), t -> len(t) > 0),
        t -> CASE WHEN len(t) > 1 AND regexp_matches(t, '^{_HAN}+$')
                  THEN list_transform(range(1, len(t)),
                                      i -> substring(t, i, 2))
                  ELSE [t] END))"""


_TOKS = f"""
toks AS (
    SELECT doc_id, lang, source, n_chars,
           {_tok_expr('text')} AS tok
    FROM documents WHERE doc_id IS NOT NULL
)"""

_SHINGLES = _TOKS + """,
shing AS (
    SELECT doc_id,
           CASE WHEN len(tok) >= 3
                THEN list_transform(range(1, len(tok) - 1),
                     i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
                ELSE [] END AS sh
    FROM toks
)"""

# Signature scheme mirrors operators/dedup.minhash_signatures: two
# salted md5s per shingle, sliced into eight 8-hex-char sub-hashes.
_SIG = _SHINGLES + """,
sig AS (
    SELECT doc_id,
""" + ",\n".join(
    f"           CASE WHEN len(sh) > 0 THEN list_aggregate("
    f"list_transform(sh, x -> substr(md5('{j // 4}|' || x), {1 + 8 * (j % 4)}, 8)),"
    f" 'min') END AS h{j}"
    for j in range(8)
) + """
    FROM shing
)"""

_BANDS = _SIG + """,
bands AS (
""" + "\n    UNION ALL\n".join(
    f"    SELECT {b} AS band, md5(h{2*b} || '|' || h{2*b+1}) AS band_hash,"
    f" doc_id FROM sig WHERE h{2*b} IS NOT NULL"
    for b in range(4)
) + """
)"""

# shared with the engine so a seed-count change can never fork the
# oracle's est_jaccard denominator silently (it is asserted == 8 by
# the fixed slicing scheme in operators/dedup.minhash_signatures)
from ..functions.text import MINHASH_SEEDS as _N_MINHASH  # noqa: E402

_MINHASH_MATCH = " + ".join(
    f"CASE WHEN a.h{j} = b.h{j} THEN 1 ELSE 0 END"
    for j in range(_N_MINHASH))

_DISC = ("(CAST(l_extendedprice AS DECIMAL(18,2)) * "
         "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))")

# SimHash: 60 per-bit ±1 vote sums from the first 15 md5 nibbles,
# mirroring operators/dedup.simhash_signatures (60-bit: 15-bit band
# keyspace for the pairing step, int64-safe combine).
_SIMHASH_BITS = 60
_SIMHASH_SUMS = ",\n".join(
    f"           sum((((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1))"
    f" - 1) // {2 ** (b % 4)}) % 2) * 2 - 1) AS s{b}"
    for b in range(_SIMHASH_BITS))
_SIMHASH_COMBINE = " + ".join(
    f"CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END"
    for b in range(_SIMHASH_BITS))
_SIMHASH_BAND_MASKS = ", ".join(
    f"simhash & {0x7FFF << (15 * b)}" for b in range(4))

# Per-label centroids rounded to 6 dp (portable across engines).
_CENTROIDS = """
e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pos AS (
    SELECT label, vec_id,
           UNNEST(range(1, len(v) + 1)) AS pos, UNNEST(v) AS x
    FROM e
),
cpos AS (
    SELECT label, pos, round(avg(x), 6) AS cx FROM pos GROUP BY 1, 2
),
cent AS (
    SELECT label, list(cx ORDER BY pos) AS centroid FROM cpos GROUP BY label
)"""

_DOT = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        "(acc, v) -> acc + v)")


def _lsh_bucket_sql(qvec: str) -> str:
    """The oracle's bucket expression, generated from the SAME
    hyperplanes as operators/similarity.lsh_bucket — integer weights
    against the QUANT_SCALE fixed-point vector, pure int64 arithmetic
    (matches both the JVM fold and the Arrow matmul path exactly)."""
    from ..operators.similarity import lsh_hyperplanes

    terms = []
    for i, plane in enumerate(lsh_hyperplanes()):
        lits = ", ".join(f"CAST({w} AS BIGINT)" for w in plane)
        d = _IDOT.format(a=qvec, b=f"list_value({lits})")
        terms.append(f"(CASE WHEN {d} > 0 THEN {2 ** i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_IDOT = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
         "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
         "(acc, v) -> acc + v)")


def _emb_band_key_sql(qvec: str, band: int) -> str:
    """Oracle band key b: planes [8b, 8b+8) of the 64 shared
    hyperplanes, local weights 2^j, computed on the QUANT_SCALE
    fixed-point vector ``qvec`` in pure int64 arithmetic — mirrors
    operators/similarity.emb_band_keys / emb_band_keys_arrow exactly
    (order-independent integers, so Spark's numpy matmul and this
    sequential fold cannot disagree)."""
    from ..operators.similarity import (
        EMB_BAND_PLANES, EMB_BANDS, lsh_hyperplanes)

    planes = lsh_hyperplanes(EMB_BANDS * EMB_BAND_PLANES)
    terms = []
    for j in range(EMB_BAND_PLANES):
        plane = planes[band * EMB_BAND_PLANES + j]
        lits = ", ".join(f"CAST({w} AS BIGINT)" for w in plane)
        d = _IDOT.format(a=qvec, b=f"list_value({lits})")
        terms.append(f"(CASE WHEN {d} > 0 THEN {2 ** j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _emb_bands_sql(src: str = "vecs") -> str:
    """UNION ALL of the 8 per-band key projections over ``src``
    (any CTE exposing label, vec_id, q)."""
    from ..operators.similarity import EMB_BANDS

    return "\n            UNION ALL\n".join(
        f"            SELECT label, vec_id, {b} AS band,"
        f" CAST({_emb_band_key_sql('q', b)} AS BIGINT) AS bkey"
        f" FROM {src}"
        for b in range(EMB_BANDS))


_ISQD = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
         "list_transform(range(1, len({a}) + 1), "
         "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
         "(acc, v) -> acc + v)")


def _kmeans_ctes() -> str:
    """Unrolled Lloyd iterations mirroring similarity.kmeans_clusters
    (shared by the kmeans and semdedup oracles): seeds = k lowest
    vec_ids; per iteration, argmin-(distance, cluster) assignment on
    INTEGER fixed-point squared distances and EXACT fixed-point
    centroid recomputation — everything that could diverge between
    engines is int64 arithmetic, which cannot."""
    from ..operators.similarity import KMEANS_ITERS, KMEANS_K

    sqd = _ISQD.format(a="q", b="qc")
    parts = [f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
        c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                   v AS centroid
            FROM vecs ORDER BY vec_id LIMIT {KMEANS_K})"""]
    for n in range(1, KMEANS_ITERS + 1):
        parts.append(f""",
        cq{n - 1} AS (
            SELECT cluster,
                   list_transform(centroid,
                       x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT))
                       AS qc
            FROM c{n - 1}),
        a{n} AS (
            SELECT vec_id, q, cluster FROM (
                SELECT vec_id, q, cluster,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY {sqd}, cluster) AS rn
                FROM vecs, cq{n - 1}
            ) WHERE rn = 1),
        c{n} AS (
            SELECT cluster, list(cx ORDER BY dim) AS centroid
            FROM (
                SELECT cluster, dim,
                       CAST(sum(qx) AS DOUBLE)
                           / (count(*) * 1048576.0) AS cx
                FROM (SELECT cluster,
                             unnest(range(1, len(q) + 1)) AS dim,
                             unnest(q) AS qx
                      FROM a{n})
                GROUP BY cluster, dim
            ) GROUP BY cluster)""")
    return "".join(parts)


def _kmeans_oracle_sql() -> str:
    """_kmeans_ctes + the cluster summary (fingerprint over
    floor(x·10⁶+½)-scaled centroid elements)."""
    from ..operators.similarity import KMEANS_ITERS

    return _kmeans_ctes() + f"""
        SELECT f.cluster AS cluster, f.vec_ct AS vec_ct,
               f.exemplar_id AS exemplar_id,
               md5(array_to_string(list_transform(c.centroid,
                   x -> CAST(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)
                             AS VARCHAR)), ',')) AS centroid_fp
        FROM (SELECT cluster, count(*) AS vec_ct,
                     min(vec_id) AS exemplar_id
              FROM a{KMEANS_ITERS} GROUP BY cluster) f
        JOIN c{KMEANS_ITERS} c ON f.cluster = c.cluster"""


def _semdedup_oracle_sql(threshold: float) -> str:
    """_kmeans_ctes + banded LSH + exact cosine inside the learned
    clusters — mirrors similarity.semdedup_prune."""
    from ..operators.similarity import KMEANS_ITERS

    return _kmeans_ctes() + f""",
        av AS (
            SELECT a.cluster AS label, a.vec_id, v.v AS v, v.q AS q
            FROM a{KMEANS_ITERS} a JOIN vecs v USING (vec_id)),
        bands AS (
{_emb_bands_sql('av')}
        ),
        cand AS (
            SELECT DISTINCT l.label AS label,
                   l.vec_id AS vec_a, r.vec_id AS vec_b
            FROM bands l
            JOIN bands r ON l.label = r.label AND l.band = r.band
                        AND l.bkey = r.bkey
            WHERE l.vec_id < r.vec_id)
        SELECT c.label AS cluster, c.vec_a AS vec_a, c.vec_b AS vec_b,
               {_cos('a.v', 'b.v')} AS cos_sim
        FROM cand c
        JOIN av a ON c.label = a.label AND c.vec_a = a.vec_id
        JOIN av b ON c.label = b.label AND c.vec_b = b.vec_id
        WHERE {_cos('a.v', 'b.v')} >= {threshold}"""


def _cos(a: str, b: str) -> str:
    return (f"({_DOT.format(a=a, b=b)} / "
            f"(sqrt({_DOT.format(a=a, b=a)}) * "
            f"sqrt({_DOT.format(a=b, b=b)})))")

# ANN recall audit: composed from the two ranking oracles above so
# the exact and approximate sides can never drift from the graded
# definitions (DuckDB allows WITH inside subqueries). Exact side
# re-filtered to rank <= 3 => recall@3 against the k=3 LSH probe.
def _pq_subspace_ctes(m: int = 8, w: int = 8) -> list:
    """The per-subspace Lloyd chains of the PQ oracle (s{s}_vecs …
    s{s}_a{N}, s{s}_cqf) as a CTE list — shared by the PQ audit
    oracle and the composed IVF-PQ search oracle."""
    from ..operators.similarity import KMEANS_ITERS, KMEANS_K

    quant = "x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)"
    sqd = _ISQD.format(a="q", b="qc")
    ctes = []
    for s in range(m):
        p = f"s{s}_"
        lo, hi = s * w + 1, s * w + w
        sl = f"array_slice(CAST(embedding AS DOUBLE[]), {lo}, {hi})"
        ctes.append(f"""{p}vecs AS (
            SELECT vec_id, {sl} AS v,
                   list_transform({sl}, {quant}) AS q
            FROM embeddings)""")
        ctes.append(f"""{p}c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                   v AS centroid
            FROM {p}vecs ORDER BY vec_id LIMIT {KMEANS_K})""")
        for n in range(1, KMEANS_ITERS + 1):
            ctes.append(f"""{p}cq{n - 1} AS (
            SELECT cluster, list_transform(centroid, {quant}) AS qc
            FROM {p}c{n - 1})""")
            ctes.append(f"""{p}a{n} AS (
            SELECT vec_id, q, cluster FROM (
                SELECT vec_id, q, cluster,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY {sqd}, cluster) AS rn
                FROM {p}vecs, {p}cq{n - 1}
            ) WHERE rn = 1)""")
            ctes.append(f"""{p}c{n} AS (
            SELECT cluster, list(cx ORDER BY dim) AS centroid
            FROM (
                SELECT cluster, dim,
                       CAST(sum(qx) AS DOUBLE)
                           / (count(*) * 1048576.0) AS cx
                FROM (SELECT cluster,
                             unnest(range(1, len(q) + 1)) AS dim,
                             unnest(q) AS qx
                      FROM {p}a{n})
                GROUP BY cluster, dim
            ) GROUP BY cluster)""")
        it = KMEANS_ITERS
        ctes.append(f"""{p}cqf AS (
            SELECT cluster, list_transform(centroid, {quant}) AS qc,
                   md5(array_to_string(list_transform(centroid,
                       x -> CAST(CAST(floor(x * 1048576.0 + 0.5)
                                      AS BIGINT) AS VARCHAR)), ','))
                       AS fp
            FROM {p}c{it})""")
    return ctes

def _pq_oracle_sql(m: int = 8, w: int = 8) -> str:
    """Fully-unrolled PQ oracle mirroring similarity.pq_codebook_audit:
    one _kmeans_ctes-style Lloyd chain PER SUBSPACE over the sliced
    vectors, then per (subspace, cluster) exact integer error vs the
    quantized final codeword. Everything that could diverge between
    engines is int64 arithmetic."""
    from ..operators.similarity import KMEANS_ITERS

    sqd_af = _ISQD.format(a="a.q", b="f.qc")
    it = KMEANS_ITERS
    selects = []
    for s in range(m):
        p = f"s{s}_"
        selects.append(f"""
            SELECT CAST({s} AS BIGINT) AS subspace,
                   CAST(a.cluster AS BIGINT) AS cluster,
                   count(*) AS vec_ct,
                   CAST(sum({sqd_af}) AS BIGINT) AS sq_err_sum,
                   CAST(max({sqd_af}) AS BIGINT) AS sq_err_max,
                   min(f.fp) AS codeword_fp
            FROM {p}a{it} a JOIN {p}cqf f USING (cluster)
            GROUP BY 1, 2""")
    return ("WITH " + ",\n".join(_pq_subspace_ctes(m, w)) + "\n"
            + "\nUNION ALL\n".join(selects))

def _ivfpq_oracle_sql(m: int = 8, w: int = 8, n_queries: int = 5,
                      k: int = 3) -> str:
    """Composed IVF-PQ search oracle: the coarse k-means chain
    (_kmeans_ctes — a{N} is the inverted-list assignment) + the m
    per-subspace PQ chains (codes = s{s}_a{N}.cluster, codewords =
    s{s}_cqf.qc) + asymmetric integer distances summed over subspaces
    and ranked per query. Mirrors similarity.ivfpq_ann bit-for-bit."""
    from ..operators.similarity import KMEANS_ITERS

    it = KMEANS_ITERS
    contribs = "\n            UNION ALL\n".join(
        f"""            SELECT p.query_id, p.vec_id,
                   {_ISQD.format(a='qs.q', b='f.qc')} AS d
            FROM pairs p
            JOIN s{s}_vecs qs ON qs.vec_id = p.query_id
            JOIN s{s}_a{it} cc ON cc.vec_id = p.vec_id
            JOIN s{s}_cqf f ON f.cluster = cc.cluster"""
        for s in range(m))
    return (_kmeans_ctes() + ",\n"
            + ",\n".join(_pq_subspace_ctes(m, w)) + f""",
        qv AS (
            SELECT vec_id AS query_id, cluster
            FROM a{it} WHERE vec_id < {n_queries}),
        pairs AS (
            SELECT qv.query_id, a.vec_id
            FROM a{it} a JOIN qv ON a.cluster = qv.cluster
            WHERE a.vec_id <> qv.query_id),
        contrib AS (
{contribs}
        ),
        adc AS (
            SELECT query_id, vec_id,
                   CAST(sum(d) AS BIGINT) AS adc_dist
            FROM contrib GROUP BY 1, 2)
        SELECT query_id, vec_id AS neighbor_id,
               CAST(rank AS BIGINT) AS rank, adc_dist
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dist, vec_id) AS rank
            FROM adc
        ) WHERE rank <= {k}""")

def _bpe_oracle_cte(n: int = textstats.BPE_N_MERGES) -> str:
    """The iterative BPE trainer unrolled as n materialized-CTE
    rounds (MATERIALIZED is load-bearing: v{s} and m{s+1} both read
    v{s-1}, so un-materialized CTE inlining re-expands the chain
    2^n times). Each round is the byte-identical DuckDB twin of
    textstats.bpe_learn's Spark round: weighted adjacent-pair count
    over the vocab, argmax by (count desc, pair asc), literal
    replace of "a;b;" with "ab;"."""
    parts = [_TOKS + """,
        bpe_words AS MATERIALIZED (
            SELECT word, CAST(count(*) AS BIGINT) AS ct
            FROM (SELECT unnest(tok) AS word FROM toks)
            WHERE NOT contains(word, ';')
            GROUP BY word),
        v0 AS MATERIALIZED (
            SELECT word, ct,
                   regexp_replace(word, '(.)', '\\1;', 'g') AS sym
            FROM bpe_words)"""]
    for s in range(1, n + 1):
        parts.append(f""",
        m{s} AS MATERIALIZED (
            SELECT CAST({s} AS BIGINT) AS step, pair,
                   replace(pair, ';', '') || ';' AS merged,
                   CAST(sum(ct) AS BIGINT) AS merge_ct
            FROM (SELECT ct,
                         unnest([arr[i] || ';' || arr[i+1] || ';'
                                 for i in range(1, len(arr) - 1)]) AS pair
                  FROM (SELECT ct, str_split(sym, ';') AS arr
                        FROM v{s - 1}))
            GROUP BY pair
            ORDER BY merge_ct DESC, pair LIMIT 1),
        v{s} AS MATERIALIZED (
            SELECT word, ct,
                   replace(sym, coalesce((SELECT pair FROM m{s}), ''),
                           coalesce((SELECT merged FROM m{s}), '')) AS sym
            FROM v{s - 1})""")
    return "".join(parts)

_BPE_N = textstats.BPE_N_MERGES

def _profile_sql(src: str, tag: str) -> str:
    return " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, count(*) AS {tag}_ct, "
        f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),"
        f" 0) AS BIGINT)"
        f" AS {tag}_null_ct, "
        f"count(DISTINCT {c}) AS {tag}_distinct_ct FROM {src}"
        for c in _DRIFT_COLS)

# integer permille: both engines compute (1000·n) with int64 then
# divide by the positive row total — trunc == floor, no float ratio


def _ri_rel_sql(child, fk, parent, pk, name):
    """One UNION ALL arm of the referential-integrity oracle —
    mirrors fk_orphans: child reduced to (fk, count) before the
    keys-only parent join."""
    return f"""
    SELECT '{name}' AS relation,
           CAST(coalesce(sum(ct), 0) AS BIGINT) AS child_rows,
           CAST(coalesce(sum(CASE WHEN k IS NULL THEN ct END), 0)
                AS BIGINT) AS null_fk_ct,
           CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND hit IS NULL
                                  THEN ct END), 0)
                AS BIGINT) AS orphan_ct,
           CAST((1000 * (coalesce(sum(ct), 0)
                 - coalesce(sum(CASE WHEN k IS NULL THEN ct END), 0)
                 - coalesce(sum(CASE WHEN k IS NOT NULL
                                     AND hit IS NULL
                                     THEN ct END), 0)))
                // greatest(coalesce(sum(ct), 0), 1)
                AS BIGINT) AS resolved_permille
    FROM (SELECT c.k, c.ct, p.hit
          FROM (SELECT {fk} AS k, count(*) AS ct
                FROM {child} GROUP BY {fk}) c
          LEFT JOIN (SELECT DISTINCT {pk} AS k, 1 AS hit
                     FROM {parent}) p ON c.k = p.k)
    """
