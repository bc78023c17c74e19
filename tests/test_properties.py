"""Property-based tests (hypothesis): the window-function batch
oracles for the stateful trio and sessionization are checked against
straight-line Python reference implementations on random event
sequences — the generative complement of the fixture tests."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

TIMEOUT_MS = 10_000
GAP = datetime.timedelta(minutes=30)

# (user 0..2, ts-offset seconds 0..3600, is_entry)
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3600), st.booleans()),
    min_size=1, max_size=40, unique_by=lambda e: (e[0], e[1]))

_slow = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _mk_page_events(spark, seq):
    base = 1_600_000_000_000
    rows = [(f"mid_{u}", base + s * 1000,
             None if entry else "home", "page")
            for u, s, entry in seq]
    return spark.createDataFrame(
        rows, "mid string, ts long, last_page_id string, page_id string")


@given(seq=events_strategy)
@_slow
def test_user_jumps_oracle_matches_python(spark, seq):
    from gmall_flink_2021_spark.operators.dwm import user_jumps_page_log

    got = {(r.mid, r.ts) for r in
           user_jumps_page_log(_mk_page_events(spark, seq)).collect()}

    # straight-line reference: per mid ordered by ts, an entry bounces
    # iff next event is absent, later than +10 s, or itself an entry
    want = set()
    by_mid: dict = {}
    base = 1_600_000_000_000
    for u, s, entry in seq:
        by_mid.setdefault(f"mid_{u}", []).append((base + s * 1000, entry))
    for mid, evs in by_mid.items():
        evs.sort()
        for i, (ts, entry) in enumerate(evs):
            if not entry:
                continue
            if i + 1 >= len(evs):
                want.add((mid, ts))
            else:
                nts, nentry = evs[i + 1]
                if nts - ts > TIMEOUT_MS or nentry:
                    want.add((mid, ts))
    assert got == want


@given(seq=events_strategy)
@_slow
def test_is_new_repair_oracle_matches_python(spark, seq):
    from gmall_flink_2021_spark.operators.dwm import is_new_repair

    base = 1_600_000_000_000
    rows = [(i, u, base + s * 1000) for i, (u, s, _) in enumerate(seq)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long") \
        .withColumn("ts", F.timestamp_millis("ts"))
    got = {(r.event_id): r.is_new for r in is_new_repair(df).collect()}

    first_day: dict = {}
    days = {}
    for i, (u, s, _) in enumerate(seq):
        d = datetime.datetime.utcfromtimestamp(
            (base + s * 1000) / 1000).date()
        days[i] = (u, d)
        first_day[u] = min(first_day.get(u, d), d)
    for i, (u, d) in days.items():
        assert got[i] == (1 if d == first_day[u] else 0)


@given(seq=events_strategy)
@_slow
def test_sessionize_matches_python(spark, seq):
    from gmall_flink_2021_spark.operators.analytics import sessionize

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, u, base + datetime.timedelta(seconds=s * 120))
            for i, (u, s, _) in enumerate(seq)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {(r.user_id, r.session_seq): (r.n_events, r.session_start,
                                        r.session_end)
           for r in sessionize(df).collect()}

    by_user: dict = {}
    for i, (u, s, _) in enumerate(seq):
        by_user.setdefault(u, []).append(
            base + datetime.timedelta(seconds=s * 120))
    want = {}
    for u, tss in by_user.items():
        tss.sort()
        sess, start = 0, None
        cur: list = []
        for ts in tss:
            if cur and ts - cur[-1] > GAP:
                want[(u, sess)] = (len(cur), cur[0], cur[-1])
                cur = []
            if not cur:
                sess += 1
            cur.append(ts)
        if cur:
            want[(u, sess)] = (len(cur), cur[0], cur[-1])
    assert got == want


def test_salted_join_equals_plain_join(spark):
    from gmall_flink_2021_spark.operators.skew import salted_join

    # heavily skewed: 90% of big rows share one key
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("payload"))
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("v"))
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k")
    assert sorted(map(tuple, plain.select("k", "payload", "v").collect())) \
        == sorted(map(tuple, salted.select("k", "payload", "v").collect()))

def test_dup_clusters_local_and_distributed_paths_agree(spark):
    from gmall_flink_2021_spark.operators.dedup import dup_clusters
    from gmall_flink_2021_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    local = sorted(map(tuple, dup_clusters(docs).collect()))
    dist = sorted(map(tuple,
                      dup_clusters(docs, driver_pair_limit=0).collect()))
    assert local == dist
    # every cluster has >= 2 docs and carries its min id as cluster_id
    by_cluster: dict = {}
    for cid, doc, sz in local:
        by_cluster.setdefault(cid, []).append((doc, sz))
    for cid, docs_sz in by_cluster.items():
        assert len(docs_sz) >= 2
        assert all(sz == len(docs_sz) for _, sz in docs_sz)
        assert cid == min(d for d, _ in docs_sz)


def test_native_session_window_exact_gap_merges(spark):
    """Spark session_window MERGES an event landing at exactly
    prev+gap (inclusive end, verified empirically) — the oracle's
    new-session condition is strictly greater-than."""
    import datetime as dt

    from gmall_flink_2021_spark.operators.analytics import (
        native_session_windows)

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, base, 1),
            (1, base + dt.timedelta(minutes=30), 2),
            (1, base + dt.timedelta(minutes=59, seconds=59), 3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = native_session_windows(df).orderBy("session_start").collect()
    assert [r.n_events for r in out] == [3]


def test_uv_sketch_rollup_estimates_are_sane(spark):
    """HLL rollup invariants: the monthly union estimate dominates
    every member day (union takes per-register max), and estimates sit
    within 5% of the exact distinct counts at this cardinality."""
    from pyspark.sql import functions as F

    from gmall_flink_2021_spark.operators.dwm import uv_sketch_rollup
    from gmall_flink_2021_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    got = uv_sketch_rollup(events).collect()
    assert got
    for r in got:
        assert r.month_uv_est >= r.daily_uv_est

    exact = {r.day: r.uv for r in
             events.groupBy(F.date_trunc("DAY", "ts").alias("day"))
             .agg(F.countDistinct("user_id").alias("uv")).collect()}
    for r in got:
        assert abs(r.daily_uv_est - exact[r.day]) <= 0.05 * exact[r.day]


def test_text_operators_tolerate_null_and_empty_text(spark):
    """Dirty-corpus hardening: null/empty text must yield zero counts,
    never F.size(null) = -1 artifacts."""
    from gmall_flink_2021_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, None, "en", "src0", 0), (2, "", "en", "src0", 0),
         (3, "a b c a", "en", "src0", 7)],
        "doc_id long, text string, lang string, source string, n_chars long")
    tok = textstats.token_stats(docs).collect()[0]
    assert tok.token_ct == 4 and tok.doc_ct == 3

    rep = {r.doc_id: r for r in textstats.repetition_stats(docs).collect()}
    assert rep[1].n_tokens == 0 and rep[1].top_token_frac == 0.0
    assert rep[2].n_tokens == 0 and rep[2].dup_2gram_frac == 0.0
    assert rep[3].top_token_ct == 2

    packed = textstats.sequence_packing(docs).collect()
    assert sum(r.doc_ct for r in packed) == 3

    # round-3 additions: the MG recount, LM scores, BPE pairs, and
    # the funnel must all survive null/empty text without -1 sizes,
    # null divisions, or dropped documents
    hh = {(r.term, r.cnt) for r in
          textstats.heavy_hitter_terms(docs, phi_permille=250,
                                       counters=8).collect()}
    # 'a' = 500‰; 'b'/'c' = exactly 250‰, and the gate is ≥
    assert hh == {("a", 2), ("b", 1), ("c", 1)}
    lm = {r.doc_id: r for r in textstats.unigram_lm_scores(docs).collect()}
    assert set(lm) == {3} and lm[3].n_tokens == 4  # null/empty drop out
    bpe = {r.pair for r in textstats.bpe_merge_candidates(docs).collect()}
    assert bpe == set()  # all words single-char: no adjacent pairs
    fun, fh = textstats.corpus_funnel(docs)
    frow = fun.collect()[0]
    fh.unpersist()
    assert frow.total_ct == 3 and frow.len_ct == 0  # nothing reaches 30
    bg = {r.doc_id: r for r in textstats.bigram_lm_scores(docs).collect()}
    assert set(bg) == {3} and bg[3].n_transitions == 3  # <2-token docs drop


docs_strategy = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=80)
      .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=12)


@given(texts=docs_strategy)
@_slow
def test_segment_dedup_matches_python_reference(spark, texts):
    """segment_dedup against a straight-line Python first-occurrence
    reference on random word-soup corpora (including empty docs and
    heavy cross-doc repetition — single-letter words make segment
    collisions common)."""
    from gmall_flink_2021_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r.doc_id, r.n_segs, r.n_kept) for r in
           segment_dedup(docs, seg_tokens=5).collect()}

    seen, want = set(), set()
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        segs = [" ".join(toks[s:s + 5])
                for s in range(0, max(len(toks) - 1, 0) + 1, 5)]
        kept = [s for s in segs if s not in seen]
        seen.update(segs)
        if kept:
            want.add((i, len(segs), len(kept)))
    assert got == want


@given(texts=docs_strategy)
@_slow
def test_doc_chunks_cover_every_token_exactly(spark, texts):
    """Chunk windows must tile each document: chunk starts every
    stride tokens, each chunk ≤ chunk_tokens long, the union covers
    all tokens, and adjacent chunks overlap by chunk-stride."""
    from gmall_flink_2021_spark.operators.textstats import doc_chunks

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = doc_chunks(docs, chunk_tokens=16, stride=12).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_len))
    for i, t in enumerate(texts):
        n = len([w for w in t.split(" ") if w])
        chunks = sorted(by_doc[i])
        want_ct = len(range(0, max(n - 1, 0) + 1, 12))
        assert len(chunks) == want_ct
        assert [c[0] for c in chunks] == list(range(want_ct))
        covered = sum(c[1] for c in chunks)
        overlap = sum(max(0, min(j * 12 + 16, n) - (j + 1) * 12)
                      for j in range(want_ct - 1))
        assert covered == n + overlap


words_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdef")) | st.just("the"),
             min_size=1, max_size=30),
    min_size=1, max_size=25)


@given(docs=words_strategy, parts=st.integers(1, 7))
@_slow
def test_heavy_hitters_exact_under_any_partitioning(spark, docs, parts):
    """The Misra-Gries candidate pass must never cost correctness:
    for ANY partitioning of the corpus, heavy_hitter_terms equals the
    brute-force phi-heavy set computed in Python. counters=8 is tiny,
    so prunes fire constantly — the guarantee, not luck, carries the
    result (counters ≥ 1000/phi keeps the superset property:
    phi=125‰, 8·125 ≥ 1000)."""
    from collections import Counter

    from gmall_flink_2021_spark.operators.textstats import heavy_hitter_terms

    rows = [(i, " ".join(ws), "en", "src0", len(" ".join(ws)))
            for i, ws in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").repartition(parts)
    got = {(r["term"], r["cnt"]) for r in
           heavy_hitter_terms(df, phi_permille=125, counters=8).collect()}
    exact = Counter(w for ws in docs for w in ws)
    total = sum(exact.values())
    want = {(t, c) for t, c in exact.items() if c * 1000 >= 125 * total}
    assert got == want


@given(edits=st.lists(st.tuples(st.integers(0, 49),
                                st.sampled_from(["del", "upd", "ins"])),
                      min_size=0, max_size=30,
                      unique_by=lambda e: e[0]))
@_slow
def test_snapshot_diff_matches_python_reference(spark, edits):
    """snapshot_diff's digest-join classification equals a dict-based
    diff for arbitrary insert/update/delete edit sets."""
    from gmall_flink_2021_spark.operators.analytics import snapshot_diff

    old = {i: f"v{i}" for i in range(50)}
    new = dict(old)
    for k, op in edits:
        if op == "del":
            new.pop(k, None)
        elif op == "upd":
            new[k] = f"u{k}"
        else:
            new[1000 + k] = f"n{k}"
    o = spark.createDataFrame([(k, v) for k, v in old.items()],
                              "pk long, val string")
    n = spark.createDataFrame([(k, v) for k, v in new.items()],
                              "pk long, val string")
    got = {(r["pk"], r["change_type"]) for r in
           snapshot_diff(o, n, "pk", ["val"]).collect()}
    want = set()
    for k in set(old) | set(new):
        if k not in new:
            want.add((k, "deleted"))
        elif k not in old:
            want.add((k, "inserted"))
        elif old[k] != new[k]:
            want.add((k, "updated"))
    assert got == want


def test_similarity_operators_tolerate_zero_vectors(spark):
    """Dirty-embedding hardening: a zero-norm vector must not throw
    ANSI DIVIDE_BY_ZERO mid-scan — its cosine scores become NULL
    (DuckDB's x/0 semantics) and it simply never ranks."""
    from gmall_flink_2021_spark.operators import similarity

    rows = [(i, [float((i + j) % 5) for j in range(64)], i % 2)
            for i in range(8)]
    rows.append((8, [0.0] * 64, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    knn = similarity.knn_bruteforce(emb, n_queries=2, k=3).collect()
    assert knn and all(r.neighbor_id != 8 or r.cos_sim is None
                       for r in knn)
    dups = similarity.embedding_dups_exhaustive(emb, threshold=0.1)
    assert all(8 not in (r.vec_a, r.vec_b) for r in dups.collect())
    cp = similarity.contrastive_pairs(emb, n_anchors=2).collect()
    assert cp
    # "it simply never ranks" must hold literally: NULL cos_sim sorts
    # nulls-LAST (matching the SQL oracle), so the zero-norm vec 8 can
    # never displace a real neighbor from the top-per_kind pairs.
    assert all(r.neighbor_id != 8 for r in cp)


@given(lens=st.lists(st.integers(0, 40), min_size=1, max_size=30))
@_slow
def test_padding_waste_matches_python_reference(spark, lens):
    """padding_waste_audit against a straight-line Python batcher for
    both strategies on arbitrary length distributions."""
    from gmall_flink_2021_spark.operators.textstats import (
        padding_waste_audit)

    B = 8
    rows = [(i, " ".join(["w"] * n) if n else "", "en", "src0", n)
            for i, n in enumerate(lens)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    got = {r["strategy"]: (r["batches"], r["payload_tokens"],
                           r["padded_slots"])
           for r in padding_waste_audit(docs, batch_size=B)[0].collect()}

    def ref(ordered):
        batches, payload, padded = 0, 0, 0
        for i in range(0, len(ordered), B):
            b = ordered[i:i + B]
            batches += 1
            payload += sum(b)
            padded += max(b) * len(b) - sum(b)
        return batches, payload, padded

    arrival = [n for _, n in sorted((i, n) for i, n in enumerate(lens))]
    by_len = [n for n, _ in sorted((n, i) for i, n in enumerate(lens))]
    assert got["arrival_order"] == ref(arrival)
    assert got["length_sorted"] == ref(by_len)


def test_padding_waste_stable_across_recompute_after_release(spark):
    """Round-4 bug class, pinned closed: the audit's global ordinals
    must be identical on EVERY recompute, including after its cache
    is released (the registry wrapper unpersists lazily). The old
    sampled range partitioning could land on different bounds per
    action and collide ordinals; deterministic buckets cannot."""
    from gmall_flink_2021_spark.operators.textstats import (
        padding_waste_audit)

    rows = [(i, " ".join(["w"] * (i * 7 % 29)), "en", "s", 0)
            for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out, oh = padding_waste_audit(docs)
    oh.unpersist()  # force the recompute path on every action
    first = sorted(map(tuple, out.collect()))
    for _ in range(3):
        assert sorted(map(tuple, out.collect())) == first


def test_minhash_jaccard_candidate_mass_is_linear_in_duplicates(spark):
    """The per-band candidate cap: a cluster of m exact duplicates
    must emit O(m·cap·bands) scored pairs — never the uncapped m²/2 —
    while still chaining every cluster member into the pair graph
    (adjacent-successor pairs preserve clustering reachability)."""
    from gmall_flink_2021_spark.operators.dedup import (
        minhash_jaccard_pairs)

    m = 40
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text, "en", "s0", len(text)) for i in range(m)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    scored, sh = minhash_jaccard_pairs(docs)
    pairs = scored.collect()
    sh.unpersist()
    cap, bands = 4, 4
    assert len(pairs) <= m * cap * bands          # linear, not m²/2=780
    # chain connectivity: every doc except the last appears as doc_a
    # with its immediate successor among its pairs
    succ = {(r.doc_a, r.doc_b) for r in pairs}
    for i in range(m - 1):
        assert (i, i + 1) in succ
    # identical docs: every scored pair agrees on all 8 components
    assert all(r.matching_components == 8 and r.est_jaccard == 1.0
               for r in pairs)


def test_hashed_classifier_handles_empty_docs_and_is_bag_based(spark):
    """Classifier hardening: null/empty text scores logit 0 (keep at
    threshold 0, never a dropped row); repeated tokens count per
    OCCURRENCE (bag semantics — doubling a doc's tokens doubles its
    logit)."""
    from gmall_flink_2021_spark.operators.textstats import (
        hashed_classifier_scores)

    docs = spark.createDataFrame(
        [(1, "alpha beta", "en", "s", 10),
         (2, "alpha beta alpha beta", "en", "s", 21),
         (3, None, "en", "s", 0),
         (4, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.doc_id: r for r in hashed_classifier_scores(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3].logit_micro == 0 and got[4].logit_micro == 0
    assert got[3].n_tokens == 0 and got[3].keep_label == 1
    assert got[2].logit_micro == 2 * got[1].logit_micro
    assert got[2].n_tokens == 2 * got[1].n_tokens


def test_chain_banding_yields_identical_components(spark):
    """chain_only banding (m−1 adjacent edges per bucket) must produce
    EXACTLY the components of the full m²/2 pair enumeration — bucket
    co-membership is what connects docs, and a chain preserves it.
    Checked on a corpus with a large duplicate cluster plus real
    near-dup structure."""
    from gmall_flink_2021_spark.operators.dedup import (
        dup_clusters, minhash_band_pairs)
    from gmall_flink_2021_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    extra = spark.createDataFrame(
        [(100000 + i,
          "zebra quokka lorem ipsum dolor sit amet consectetur "
          "adipiscing elit sed do eiusmod tempor", "en", "dup", 90)
         for i in range(25)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    corpus = docs.unionByName(extra)

    def components(pairs_df):
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs_df.select("doc_a", "doc_b").collect():
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = {}
        for n in parent:
            out.setdefault(find(n), set()).add(n)
        return {frozenset(v) for v in out.values()}

    full = components(minhash_band_pairs(corpus)[0])
    chain = components(minhash_band_pairs(corpus, chain_only=True)[0])
    assert full == chain
    # edge economy: the chain graph is strictly smaller on the
    # 25-duplicate cluster (25·24/2=300 pairs → ≤ 24·bands edges)
    n_full = minhash_band_pairs(corpus)[0].count()
    n_chain = minhash_band_pairs(corpus, chain_only=True)[0].count()
    assert n_chain < n_full
    # and dup_clusters (which now rides the chain graph) reports the
    # planted cluster whole
    cl = dup_clusters(corpus).collect()
    planted = [r for r in cl if r.doc_id >= 100000]
    assert len(planted) == 25
    assert len({r.cluster_id for r in planted}) == 1


@given(picks=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)),
                      min_size=2, max_size=24))
@_slow
def test_chain_banding_components_equal_on_random_corpora(spark, picks):
    """Generative form of the chain-equivalence claim: for ANY corpus
    (random mixtures of base texts and small variations, arbitrary
    duplication), chain_only banding yields exactly the components of
    the full pair enumeration."""
    from gmall_flink_2021_spark.operators.dedup import minhash_band_pairs

    bases = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet umber ochre teal",
        "north south east west up down left right front back middle",
    ]
    rows = []
    for i, (b, var) in enumerate(picks):
        text = bases[b] + ("" if var == 0 else f" tail{var}")
        rows.append((i, text, "en", "s", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    def components(pairs_df):
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b2 in pairs_df.select("doc_a", "doc_b").collect():
            parent.setdefault(a, a)
            parent.setdefault(b2, b2)
            ra, rb = find(a), find(b2)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out: dict = {}
        for n in parent:
            out.setdefault(find(n), set()).add(n)
        return {frozenset(v) for v in out.values()}

    full = components(minhash_band_pairs(docs)[0])
    chain = components(minhash_band_pairs(docs, chain_only=True)[0])
    assert full == chain


def test_bpe_driver_and_distributed_paths_agree(spark):
    """The sub-threshold driver-trained path and the distributed
    per-round-persist path must learn byte-identical merges and
    produce identical encode stats (dup_clusters-style hybrid)."""
    from gmall_flink_2021_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(1, "low low lower lowest", "en", "a", 20),
         (2, "new newer newest low", "en", "a", 20),
         (3, "wide wider widest newer", "en", "b", 23)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    m_small, v_small, h_small = T.bpe_learn(docs, n_merges=6)
    m_big, v_big, h_big = T.bpe_learn(docs, n_merges=6,
                                      collect_threshold=0)
    assert len(h_small) == 0        # driver path persists nothing
    assert "learn" in h_big         # distributed path persists vocab
    assert m_small == m_big
    rows_s = sorted(tuple(r) for r in v_small.collect())
    rows_b = sorted(tuple(r) for r in v_big.collect())
    assert rows_s == rows_b
    h_big.unpersist()


def test_bpe_merges_greedy_leftmost_semantics(spark):
    """'aaaa' under merge (a,a): leftmost non-overlapping replace
    yields aa|aa (2 symbols), and the first learned merge must be
    the weighted argmax with (count desc, pair asc) tie-break."""
    from gmall_flink_2021_spark.operators import textstats as T

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa bb", "en", "a", 12)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    m = T.bpe_merges(docs, n_merges=2).collect()
    # pair a;a; appears 3 adjacent positions x 2 occurrences = 6
    assert (m[0]["step"], m[0]["pair"], m[0]["merged"],
            m[0]["merge_ct"]) == (1, "a;a;", "aa;", 6)
    enc = {r["doc_id"]: (r["n_tokens"], r["n_symbols"])
           for r in T.bpe_encode_stats(docs, n_merges=1)[0].collect()}
    # aaaa -> aa|aa (2 symbols), bb stays b|b (2 symbols)
    assert enc[1] == (3, 2 + 2 + 2)


def test_bpe_encode_counts_bounded_by_chars_and_tokens(spark):
    """n_tokens <= n_symbols <= total chars for every doc."""
    from gmall_flink_2021_spark.operators import textstats as T
    from gmall_flink_2021_spark.plans.registry import _t

    (docs,) = _t(spark, "/root/testdata/sf0.001", "documents")
    out, oh = T.bpe_encode_stats(docs)
    bad = out.filter((F.col("n_symbols") < F.col("n_tokens"))).count()
    oh.unpersist()
    assert bad == 0


def test_dsir_weights_favor_target_source(spark):
    """Importance weights must rank the target source (min(source))
    above the raw average: docs drawn from the target distribution
    score a higher mean log-ratio than the corpus at large."""
    from gmall_flink_2021_spark.operators import textstats as T
    from gmall_flink_2021_spark.plans.registry import _t

    (docs,) = _t(spark, "/root/testdata/sf0.001", "documents")
    target = docs.agg(F.min("source")).collect()[0][0]
    w = T.dsir_importance_weights(docs).join(
        docs.select("doc_id", "source"), "doc_id")
    rows = (w.groupBy(F.col("source") == F.lit(target))
            .agg(F.avg(F.col("dsir_weight_micro")
                       / F.col("n_tokens")).alias("m")).collect())
    by = {r[0]: r["m"] for r in rows}
    assert by[True] > by[False]


def test_media_text_alignment_is_exact_and_gated(spark):
    """Alignment scores must be bounded cosines (|micro| <= 1e6),
    keep must equal the sign gate, and the stub towers must never
    emit a zero vector (odd-integer components) — so no NaN/null
    scores exist on any input, including empty text."""
    from gmall_flink_2021_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(0, "low low lower", "en", "a", 13), (1, "", "en", "a", 0),
         (2, None, "en", "b", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    rows = multimodal.media_text_alignment(docs).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["align_micro"] is not None
        assert abs(r["align_micro"]) <= 1_000_000
        assert r["keep"] == (1 if r["align_micro"] >= 0 else 0)


def test_bpe_model_roundtrip_encodes_identically(spark, tmp_path):
    """The shipped artifact: merges saved to parquet, reloaded, and
    replayed over the corpus must encode byte-identically to the
    trainer's own vocabulary (save_codebooks analog for text)."""
    from gmall_flink_2021_spark.operators import textstats as T
    from gmall_flink_2021_spark.plans.registry import _t

    (docs,) = _t(spark, "/root/testdata/sf0.001", "documents")
    merges, vocab, lh = T.bpe_learn(docs)
    art = str(tmp_path / "bpe_model")
    T.save_bpe_model(merges, art, spark)
    reloaded = T.load_bpe_model(art, spark)
    assert reloaded == merges
    got = {tuple(r) for r in T.bpe_apply_merges(docs, reloaded).collect()}
    ref, rh = T.bpe_encode_stats(docs)
    want = {tuple(r) for r in ref.collect()}
    lh.unpersist()
    rh.unpersist()
    assert want and got == want


@given(prices=st.lists(
    st.integers(min_value=1, max_value=10_000_000), min_size=1,
    max_size=60))
@_slow
def test_winsorize_matches_python_reference(spark, prices):
    """winsorized_price_stats against a direct Python reference of
    the discrete-quantile definition (value at rank ceil(p*n/100) of
    the ascending sort), on a single group of random cent prices."""
    import math

    from gmall_flink_2021_spark.operators.analytics import (
        winsorized_price_stats,
    )

    rows = [(i, 1, "O", c / 100.0, None, "3-MEDIUM")
            for i, c in enumerate(prices)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    r = winsorized_price_stats(orders).collect()[0]

    s = sorted(prices)
    n = len(s)
    lo = s[math.ceil(5 * n / 100) - 1]
    hi = s[math.ceil(95 * n / 100) - 1]
    assert (r.n, r.lo_cents, r.hi_cents) == (n, lo, hi)
    assert r.clipped_lo_ct == sum(1 for c in s if c < lo)
    assert r.clipped_hi_ct == sum(1 for c in s if c > hi)
    assert r.winsorized_sum_cents == sum(max(lo, min(hi, c)) for c in s)


def test_perplexity_buckets_properties(spark):
    """Structural invariants of the CCNet tier split on the smoke
    corpus: per-language ranks are a 1..n permutation, bucket sizes
    are balanced within one, every head-bucket key >= every
    middle-bucket key >= every tail-bucket key (ordering by floored
    average log-prob, ties broken by doc_id), and avg_llr_micro is
    the exact floor of sum/n recomputed in Python."""
    from collections import defaultdict

    from gmall_flink_2021_spark.operators.textstats import (
        perplexity_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = perplexity_buckets(docs).collect()
    assert rows

    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
        # exact floor of the average (numerator shifted positive)
        shift = 100_000_000
        assert r.avg_llr_micro == (
            (r.sum_llr_micro + shift * r.n_tokens) // r.n_tokens - shift)

    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        n = len(rs)
        assert sorted(r.ppl_rank for r in rs) == list(range(1, n + 1))
        sizes = defaultdict(int)
        for r in rs:
            sizes[r.ppl_bucket] += 1
            # bucket must match the integer formula on the rank
            want = (3 * (r.ppl_rank - 1)) // n
            assert order[r.ppl_bucket] == want
        if n >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1
        # keys weakly decrease across bucket boundaries
        key = {r.doc_id: r.avg_llr_micro for r in rs}
        for better, worse in (("head", "middle"), ("middle", "tail")):
            b = [key[r.doc_id] for r in rs if r.ppl_bucket == better]
            w = [key[r.doc_id] for r in rs if r.ppl_bucket == worse]
            if b and w:
                assert min(b) >= max(w)


def test_event_transitions_conservation(spark):
    """Flow conservation on the smoke corpus: total transitions equal
    total events minus one per active user (each user's chain has
    n_user − 1 links), and every prev row's permille shares sum to
    1000 within truncation slack (< one unit per cell)."""
    from collections import defaultdict

    from gmall_flink_2021_spark.operators.analytics import (
        event_transitions,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = event_transitions(events).collect()
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r.transitions for r in rows) == n_events - n_users

    per_prev = defaultdict(lambda: [0, 0])
    for r in rows:
        per_prev[r.prev_type][0] += r.row_permille
        per_prev[r.prev_type][1] += 1
    for prev, (s, cells) in per_prev.items():
        assert 1000 - cells < s <= 1000, (prev, s, cells)


def test_referential_integrity_catches_planted_orphans(spark):
    """Plant known integrity damage and assert exact counts: drop a
    parent-key range (orphans), null out some FKs (null_fk_ct), and
    check the resolved permille is the integer formula on those
    numbers — plus a clean relation reports zero damage."""
    from gmall_flink_2021_spark.operators.expectations import (
        referential_integrity_audit,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet")

    damaged = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
         .otherwise(F.col("o_custkey")))
    parents = customer.filter(F.col("c_custkey") % 7 != 0)

    rows = {r.relation: r for r in referential_integrity_audit([
        (damaged, "o_custkey", parents, "c_custkey", "damaged"),
        (orders, "o_custkey", customer, "c_custkey", "clean"),
    ]).collect()}

    n = orders.count()
    nulls = orders.filter(F.col("o_orderkey") % 10 == 0).count()
    orphans = (orders
               .filter(F.col("o_orderkey") % 10 != 0)
               .filter(F.col("o_custkey") % 7 == 0).count())
    d = rows["damaged"]
    assert (d.child_rows, d.null_fk_ct, d.orphan_ct) == (n, nulls,
                                                         orphans)
    assert d.resolved_permille == (1000 * (n - nulls - orphans)) // n
    c = rows["clean"]
    assert (c.null_fk_ct, c.orphan_ct, c.resolved_permille) == (0, 0,
                                                                1000)


def test_rolling_active_users_matches_bruteforce(spark):
    """The contribution-expansion WAU must equal a direct Python
    recomputation (per day, the distinct users active in the
    trailing 7 days) on the smoke corpus, including the trailing
    open-window trim and the integer stickiness ratio."""
    import datetime
    from collections import defaultdict

    from gmall_flink_2021_spark.operators.analytics import (
        rolling_active_users,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pairs = {(r.user_id, r.ts.date()) for r in
             events.select("user_id", "ts").collect()}
    days = sorted({d for _, d in pairs})
    by_day = defaultdict(set)
    for u, d in pairs:
        by_day[d].add(u)
    want = {}
    for d in days:
        win = set()
        for k in range(7):
            win |= by_day.get(d - datetime.timedelta(days=k), set())
        want[d] = (len(by_day[d]), len(win),
                   (1000 * len(by_day[d])) // len(win))
    got = {r.day.date(): (r.day_users, r.rolling_users,
                          r.stickiness_permille)
           for r in rolling_active_users(events).collect()
           if r.day.date() in by_day}
    # every observed day must match; expansion-only days (gaps) are
    # covered by the oracle parity test
    assert {d: got[d] for d in want} == want
    assert len(want) > 0


def test_zorder_prunes_better_than_natural_layout(spark):
    """The point of the Morton layout: for a 2-D probe rectangle,
    min/max pruning over z-order buckets must skip strictly more
    buckets than the same bucket count over the natural (orderkey)
    layout, where neither dimension clusters. Also sanity: bucket
    row counts sum to the table and every envelope contains its
    bucket's rows."""
    from gmall_flink_2021_spark.operators.bucketing import zorder_stats

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    z = zorder_stats(orders).collect()
    assert sum(r.n_rows for r in z) == orders.count()
    z_hits = sum(r.probe_hit for r in z)
    assert 0 < z_hits < len(z)

    # natural layout: same bucket count, keyed by row order
    day = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    n = orders.count()
    stride = (n + 31) // 32
    nat = (orders
           .select(F.col("o_custkey").alias("ck"), day.alias("d"),
                   F.expr(f"(o_orderkey * 32) DIV {4 * n}")
                   .alias("bucket"))
           .groupBy("bucket")
           .agg(F.min("ck").alias("min_ck"), F.max("ck").alias("max_ck"),
                F.min("d").alias("min_day"),
                F.max("d").alias("max_day"))).collect()
    nat_hits = sum(
        1 for r in nat
        if r.min_ck <= 200 and r.max_ck >= 100
        and r.min_day <= 500 and r.max_day >= 400)
    assert z_hits < nat_hits, (z_hits, nat_hits)


def test_gap_fill_daily_dense_and_locf(spark):
    """The filled series must be DENSE (every type × every day in
    the corpus extent exactly once), agree with the raw daily counts
    where data exists, flag gaps, and carry the last observed count
    forward across them (0 before first observation) — checked
    against a direct Python recomputation on a corpus with planted
    holes (every 3rd day of one type removed)."""
    import datetime
    from collections import defaultdict

    from gmall_flink_2021_spark.operators.analytics import (
        gap_fill_daily,
    )

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet")
    holey = events.filter(
        ~((F.col("event_type") == "click")
          & (F.dayofmonth("ts") % 3 == 0)))
    rows = gap_fill_daily(holey).collect()

    raw = defaultdict(int)
    for r in holey.select("event_type",
                          F.to_date("ts").alias("d")).collect():
        raw[(r.event_type, r.d)] += 1
    types = {t for t, _ in raw}
    days = sorted({d for _, d in raw})
    span = [(days[0] + datetime.timedelta(days=i))
            for i in range((days[-1] - days[0]).days + 1)]
    assert len(rows) == len(types) * len(span)
    got = {(r.event_type, r.day.date()):
           (r.n_events, r.is_gap, r.locf_events) for r in rows}
    for t in types:
        last = 0
        for d in span:
            n = raw.get((t, d), 0)
            present = (t, d) in raw
            if present:
                last = n
            assert got[(t, d)] == (n, 0 if present else 1, last), \
                (t, d, got[(t, d)], (n, present, last))


def test_trade_pagerank_matches_python_reference(spark):
    """The distributed rank loop must equal an exact Python replay of
    the same integer recurrence from the same edge list (collect the
    ≤|nations|² edges once, iterate (r·w) DIV wout and
    150000 + (850·inflow) DIV 1000), and sink nodes with no inbound
    trade must sit at exactly the damping floor."""
    from gmall_flink_2021_spark.operators.analytics import (
        trade_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    tabs = [spark.read.parquet(f"{sf}/{t}.parquet")
            for t in ("nation", "customer", "supplier", "orders",
                      "lineitem")]
    out, eh = trade_pagerank(*tabs)
    rows = out.collect()
    edges = [(r.src, r.dst, r.w) for r in eh.edges.collect()]

    nodes = {r.n_name for r in tabs[0].select("n_name").collect()}
    wout = {}
    for s, d, w in edges:
        wout[s] = wout.get(s, 0) + w
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inflow = {}
        for s, d, w in edges:
            inflow[d] = inflow.get(d, 0) + (ranks[s] * w) // wout[s]
        ranks = {n: 150_000 + (850 * inflow.get(n, 0)) // 1000
                 for n in nodes}
    got = {r.node: (r.rank_micro, r.in_edges, r.out_edges)
           for r in rows}
    in_deg = {}
    out_deg = {}
    for s, d, w in edges:
        in_deg[d] = in_deg.get(d, 0) + 1
        out_deg[s] = out_deg.get(s, 0) + 1
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == (ranks[n], in_deg.get(n, 0),
                          out_deg.get(n, 0)), n
        if in_deg.get(n, 0) == 0:
            assert got[n][0] == 150_000


def test_scd2_dim_join_version_boundaries(spark):
    """Planted SCD2 boundaries: a fact shipping before the first
    version is 'pre-order', on/after v1 but before v2 takes v1's
    status, exactly ON v2's effective date (inclusive) and after
    take 'X'."""
    import datetime

    from gmall_flink_2021_spark.operators.analytics import scd2_dim_join

    base = datetime.datetime(2000, 1, 1)
    orders = spark.createDataFrame(
        [(5, 1, "O", 100.0, base, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
    mk = lambda days, ln: (5, 1, 1, ln, 1.0, 100.0, 0.0, 0.0,  # noqa: E731
                           "N", "O",
                           base + datetime.timedelta(days=days))
    lineitem = spark.createDataFrame(
        [mk(-1, 1),    # before v1 -> pre-order
         mk(0, 2),     # on v1 (inclusive) -> 'O'
         mk(364, 3),   # before v2 -> 'O'
         mk(365, 4),   # exactly on v2 -> 'X'
         mk(400, 5)],  # after v2 -> 'X'
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    got = {r.eff_status: r.n_items
           for r in scd2_dim_join(orders, lineitem).collect()}
    assert got == {"pre-order": 1, "O": 2, "X": 2}


def test_session_path_ngrams_matches_python_reference(spark):
    """Paths recomputed directly in Python from the raw events
    (30-minute gap sessionization, ordered trigram shingles, exact
    counts) must contain the operator's top-20 with identical counts
    and deterministic rank ordering."""
    import datetime
    from collections import Counter, defaultdict

    from gmall_flink_2021_spark.operators.analytics import (
        session_path_ngrams,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = sorted(
        [(r.user_id, r.ts, r.event_id, r.event_type)
         for r in events.select("user_id", "ts", "event_id",
                                "event_type").collect()],
        key=lambda x: (x[0], x[1], x[2]))
    gap = datetime.timedelta(minutes=30)
    sessions = defaultdict(list)
    last = {}
    sid = {}
    for u, ts, eid, et in rows:
        if u not in last or ts > last[u] + gap:
            sid[u] = sid.get(u, 0) + 1
        last[u] = ts
        sessions[(u, sid[u])].append(et)
    counts = Counter()
    for types in sessions.values():
        for i in range(len(types) - 2):
            counts[">".join(types[i:i + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.path, r.path_ct) for r in
           session_path_ngrams(events)
           .orderBy("path_rank").collect()]
    assert got == want


def test_linear_attribution_conservation_and_consistency(spark):
    """Attribution invariants on the smoke corpus, against a direct
    Python recomputation: every view before a user's final purchase
    is attributed exactly once (conservation), per-purchase touch
    counts match, a view ON the purchase instant converts to that
    purchase, and the share is the integer split."""
    from collections import Counter

    from gmall_flink_2021_spark.operators.analytics import (
        linear_attribution,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = [(r.user_id, r.ts, r.event_id, r.event_type) for r in
            events.filter(F.col("event_type").isin("view", "purchase"))
                  .collect()]
    # replay the reverse merge in Python: scan each user's timeline
    # DESC by (ts, side, event_id DESC), carrying the nearest
    # following purchase
    by_user = {}
    for u, ts, eid, et in rows:
        by_user.setdefault(u, []).append((ts, 0 if et == "purchase"
                                          else 1, eid))
    want = Counter()
    total_views = 0
    attributed = 0
    for u, evs in by_user.items():
        carry = None
        for ts, side, eid in sorted(
                evs, key=lambda x: (x[0], -x[1], x[2]), reverse=True):
            if side == 0:
                carry = eid
            else:
                total_views += 1
                if carry is not None:
                    want[carry] += 1
                    attributed += 1
    got = {r.purchase_event_id: (r.n_touch, r.touch_share_permille)
           for r in linear_attribution(events).collect()}
    assert sum(n for n, _ in got.values()) == attributed <= total_views
    for pid, (n, share) in got.items():
        assert n == want.get(pid, 0)
        assert share == (1000 // n if n else 0)


def test_rfm_segments_quartile_balance(spark):
    """Each RFM axis must cut customers into four groups balanced
    within one, segment counts must sum to the ordering-customer
    total, and total spend must be conserved across segments."""
    from collections import defaultdict

    from gmall_flink_2021_spark.operators.analytics import rfm_segments

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    segs = rfm_segments(orders).collect()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in segs) == n_cust

    axis = {a: defaultdict(int) for a in "RFM"}
    for r in segs:
        # segment like 'R1F2M4'
        parts = dict(zip(r.segment[::2], r.segment[1::2]))
        for a in "RFM":
            axis[a][int(parts[a])] += r.n_customers
    for a in "RFM":
        sizes = [axis[a].get(q, 0) for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1, (a, sizes)

    import duckdb
    want = duckdb.connect().execute(
        "select cast(floor(sum(cast(o_totalprice as decimal(18,2)))"
        " * 100) as bigint) from read_parquet("
        "'/root/testdata/sf0.01/orders.parquet')").fetchone()[0]
    assert sum(r.segment_spend_cents for r in segs) == want


def test_audit_form_guards_trip_beyond_documented_bounds(spark):
    """The two deliberately-superlinear audit forms must REFUSE
    at-scale inputs in code, not just in docs: each raises a loud
    RuntimeError naming its linear production alternate once the
    input exceeds the documented bound, and runs fine just under it
    (or with the bound explicitly raised)."""
    import pytest

    from gmall_flink_2021_spark.operators import dedup, similarity

    emb = spark.range(12).select(
        F.lit("blk").alias("label"), F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"),
                F.lit(1.0)).alias("embedding"))
    # 12 rows in one block = 66 scorable pairs: the fence bounds the
    # TOTAL pair count (what the join actually scores), not rows
    with pytest.raises(RuntimeError, match="embedding_dups"):
        similarity.embedding_dups_exhaustive(emb, max_scored_pairs=65)
    # under the bound: runs
    assert similarity.embedding_dups_exhaustive(
        emb, threshold=-1.0, max_scored_pairs=66).count() == 66

    docs = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f").alias("text"))
    with pytest.raises(RuntimeError, match="minhash_band_pairs"):
        dedup.ngram_jaccard_pairs(docs, max_docs=5)
    assert dedup.ngram_jaccard_pairs(docs, max_docs=8)[0].count() > 0


def test_cross_source_dup_matrix_seeded(spark):
    """Provenance matrix on a seeded corpus: exact shared
    fingerprints and LSH cross-source candidates both counted per
    unordered source pair, matching the DuckDB oracle through the
    driver-equivalent harness (testdata has no exact cross-source
    dups, so the exact axis is pinned here)."""
    import duckdb

    from gmall_flink_2021_spark.operators import dedup
    from gmall_flink_2021_spark.plans.registry import ORACLES
    from .parity import compare

    rows = [(1, "the same exact text", "crawl", "en", 19),
            (2, "the same exact text", "curated", "en", 19),
            (3, "the same exact text", "wiki", "en", 19),
            (4, "another shared doc", "crawl", "en", 18),
            (5, "another shared doc", "wiki", "en", 18),
            (6, "unique to crawl", "crawl", "en", 15),
            (7, "", "wiki", "en", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, "
              "n_chars long")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "source VARCHAR, lang VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)

    out, oh = dedup.cross_source_dup_matrix(docs)
    assert not compare(out, ORACLES["cross_source_dup_matrix"], con)
    got = sorted(tuple(r) for r in out.collect())
    oh.unpersist()
    # 'the same exact text' spans all three sources (3 pairs);
    # 'another shared doc' spans crawl+wiki (so crawl-wiki has 2)
    assert got == [("crawl", "curated", 1, 1),
                   ("crawl", "wiki", 2, 2),
                   ("curated", "wiki", 1, 1)]


def test_dedup_calibration_and_source_rate_seeded(spark):
    """Threshold-calibration histogram + per-source dup permille on a
    seeded corpus with known structure: three exact copies of one doc
    (pairs at 8/8 matching components; later two marked dup) and
    unrelated singletons (no pairs, no marks)."""
    import duckdb

    from gmall_flink_2021_spark.operators import dedup
    from gmall_flink_2021_spark.plans.registry import ORACLES
    from .parity import compare

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base, "feed_a", "en", len(base)),
            (2, base, "feed_a", "en", len(base)),
            (3, base, "feed_b", "en", len(base)),
            (4, "one totally different document body here", "feed_b",
             "en", 40),
            (5, "and yet another unrelated text entirely", "feed_b",
             "en", 39)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, "
              "n_chars long")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "source VARCHAR, lang VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)

    cal, ch = dedup.dedup_threshold_calibration(docs)
    assert not compare(cal, ORACLES["dedup_threshold_calibration"], con)
    got = {r.matching_components: r.pair_ct for r in cal.collect()}
    ch.unpersist()
    assert got == {8: 3}  # the three copies pair only at 8/8

    rate, rh = dedup.near_dup_rate_by_source(docs)
    assert not compare(rate, ORACLES["near_dup_rate_by_source"], con)
    by_src = {r.source: (r.doc_ct, r.dup_ct, r.dup_permille)
              for r in rate.collect()}
    rh.unpersist()
    # doc 1 is first-seen; doc 2 (feed_a) and doc 3 (feed_b) are dups
    assert by_src == {"feed_a": (2, 1, 500), "feed_b": (3, 1, 333)}


def test_fk_orphans_empty_child_matches_oracle_form(spark):
    """The empty-child hardening must hold on BOTH sides: Spark
    fk_orphans returns a defined (0,0,0,0) row, and the registry's
    oracle arm (same SQL shape) produces the identical row on an
    empty child — the exact case the round-6 coalesce/greatest fix
    targets."""
    import duckdb

    from gmall_flink_2021_spark.operators.expectations import fk_orphans
    from gmall_flink_2021_spark.plans.registry import _ri_rel_sql

    child = spark.createDataFrame([], "fk long, x string")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    row = fk_orphans(child, "fk", parent, "pk", "empty_rel").collect()[0]
    assert tuple(row) == ("empty_rel", 0, 0, 0, 0)

    con = duckdb.connect()
    con.execute("CREATE TABLE c(fk BIGINT, x VARCHAR)")
    con.execute("CREATE TABLE p(pk BIGINT); INSERT INTO p VALUES (1),(2)")
    orow = con.execute(
        _ri_rel_sql("c", "fk", "p", "pk", "empty_rel")).fetchone()
    assert tuple(orow) == ("empty_rel", 0, 0, 0, 0)


# ---------------------------------------------------------------------------
# round 10: genuine BMP/WAV container decode (VERDICT r9 #5)
# ---------------------------------------------------------------------------

def test_bmp_parser_reads_a_real_header():
    """The parser must read width/height from the BITMAPINFOHEADER of
    a byte-literal BMP (not one produced by our own builder): a 2x2
    24-bit bottom-up image, 54-byte header + two 8-byte rows."""
    from gmall_flink_2021_spark.operators.multimodal import _parse_bmp

    bmp = bytes.fromhex(
        # BITMAPFILEHEADER: 'BM', size 70, reserved, offset 54
        "424d46000000" "00000000" "36000000"
        # BITMAPINFOHEADER: size 40, w=2, h=2, planes 1, bpp 24
        "28000000" "02000000" "02000000" "0100" "1800"
        # compression 0, image size 16, 2835 ppm x2, colors 0/0
        "00000000" "10000000" "130b0000" "130b0000"
        "00000000" "00000000"
        # pixel rows (2 px * 3 B + 2 pad) * 2
        "0000ff" "00ff00" "0000"
        "ff0000" "ffffff" "0000")
    assert len(bmp) == 70
    assert _parse_bmp(bmp) == (2, 2, 1)
    # top-down (negative height) variants normalize
    neg = bytearray(bmp)
    neg[22:26] = (0x100000000 - 2).to_bytes(4, "little")
    assert _parse_bmp(bytes(neg)) == (2, 2, 1)
    # non-BMP payloads are refused, not misparsed
    assert _parse_bmp(b"") is None
    assert _parse_bmp(b"BM" + b"\0" * 10) is None
    assert _parse_bmp(b"RIFF" + b"\0" * 60) is None


def test_wav_parser_walks_real_chunks():
    """The parser must honor the RIFF chunk walk: a LIST chunk before
    fmt/data (as real encoders emit) and word-aligned odd-size chunks
    must not derail the sample count = data size / block align."""
    import struct

    from gmall_flink_2021_spark.operators.multimodal import _parse_wav

    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 44100,
                      176400, 4, 16)          # stereo 16-bit: align 4
    info = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\0"  # odd+pad
    data = struct.pack("<4sI", b"data", 20) + b"\0" * 20
    body = info + fmt + data
    wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    assert _parse_wav(wav) == (0, 0, 5)       # 20 bytes / align 4
    assert _parse_wav(b"RIFF\0\0\0\0AVI ") is None
    assert _parse_wav(b"") is None


def test_container_roundtrip_and_decode_dispatch():
    """Builder->parser round trip pins the container geometry the
    oracles mirror, and _decode dispatches on magic: containers parse
    genuinely, raw payloads fall back to the compressed-format stub."""
    from gmall_flink_2021_spark.operators.multimodal import (
        _build_bmp, _build_wav, _decode, _parse_bmp, _parse_wav)

    for b in [0, 1, 2, 3, 19, 20, 95, 96, 97, 200, 4096]:
        payload = bytes(i % 251 for i in range(b))
        bmp = _build_bmp(payload)
        w, h = 1 + b % 96, 1 + b % 20
        rowbytes = ((3 * w + 3) // 4) * 4
        assert len(bmp) == 54 + rowbytes * h
        assert _parse_bmp(bmp) == (w, h, 1)
        assert _decode(bmp, "image") == (w, h, 1)
        wav = _build_wav(payload)
        assert len(wav) == 44 + b + (b % 2)
        assert _parse_wav(wav) == (0, 0, (b + 1) // 2)
        assert _decode(wav, "audio") == (0, 0, (b + 1) // 2)
    # raw (compressed stand-in) payloads keep the deterministic fake
    raw = b"not a container, 29 bytes!!!"
    n = len(raw)
    assert _decode(raw, "video") == (16 + n % 64, 16 + n % 48,
                                     1 + n % 5)
    assert _decode(raw, "image") == (16 + n % 64, 16 + n % 48, 1)


# ---------------------------------------------------------------------------
# round 11: genuine PNG decode (VERDICT r10 #3) + media_type-first
# dispatch / WAV clamping (ADVICE r10)
# ---------------------------------------------------------------------------

def test_png_parser_decodes_a_hand_written_png():
    """The decoder must genuinely inflate + defilter a byte-literal
    PNG NOT produced by our own builder: a 2x2 8-bit RGB image,
    row 0 filter Sub(1), row 1 filter Up(2), IDAT deflate-compressed
    by vanilla zlib (not our stored-block framer).  Pixel bytes are
    chosen so every reconstruction addend is nonzero — a decoder that
    skips defiltering cannot return these pixels."""
    import struct
    import zlib

    from gmall_flink_2021_spark.operators.multimodal import (
        _decode, _parse_png, _png_decode)

    pix_rows = [bytes([10, 20, 30, 40, 50, 60]),
                bytes([15, 27, 39, 51, 63, 75])]
    # forward-filter by hand: row0 Sub (left neighbor at offset -3),
    # row1 Up (previous reconstructed row)
    r0 = bytes([1]) + bytes([10, 20, 30,
                             (40 - 10) & 0xFF,
                             (50 - 20) & 0xFF,
                             (60 - 30) & 0xFF])
    r1 = bytes([2]) + bytes([(15 - 10) & 0xFF, (27 - 20) & 0xFF,
                             (39 - 30) & 0xFF, (51 - 40) & 0xFF,
                             (63 - 50) & 0xFF, (75 - 60) & 0xFF])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)
                              & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(r0 + r1, 9))
           + chunk(b"IEND", b""))
    assert _png_decode(png) == (2, 2, pix_rows[0] + pix_rows[1])
    assert _parse_png(png) == (2, 2, 1)
    assert _decode(png, "image") == (2, 2, 1)
    # refusals: bad magic, corrupt CRC, torn IDAT, geometry mismatch
    assert _parse_png(b"") is None
    assert _parse_png(b"\x89PNG\r\n\x1a\n") is None
    bad = bytearray(png)
    bad[-5] ^= 0xFF
    assert _parse_png(bytes(bad)) is None
    assert _parse_png(png[:-20]) is None
    wrong_h = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(r0 + r1, 9))
               + chunk(b"IEND", b""))
    assert _parse_png(wrong_h) is None


def test_png_builder_roundtrip_pins_oracle_geometry():
    """Builder -> decoder round trip over payload sizes spanning the
    width/height modulus boundaries and multi-block deflate: the
    container size must equal the closed form the oracles mirror
    (63 + nraw + 5*ceil(nraw/65535)), all five filter types must
    reconstruct the exact payload bytes, and vanilla zlib must
    inflate the hand-framed stored stream."""
    import zlib

    from gmall_flink_2021_spark.operators.multimodal import (
        _build_png, _png_decode, _stored_deflate)

    for b in [0, 1, 2, 23, 24, 25, 79, 80, 81, 200, 1919, 4096]:
        payload = bytes((7 * i + 13) % 256 for i in range(b))
        png = _build_png(payload)
        w, h = 1 + b % 80, 1 + b % 24
        nraw = h * (1 + 3 * w)
        assert len(png) == 63 + nraw + 5 * ((nraw + 65534) // 65535)
        dec = _png_decode(png)
        assert dec is not None and dec[:2] == (w, h)
        assert dec[2] == payload[:3 * w * h].ljust(3 * w * h, b"\0")
    for n in [0, 1, 65535, 65536, 131071]:
        d = bytes(i % 7 for i in range(n))
        assert zlib.decompress(_stored_deflate(d)) == d


def test_decode_dispatches_on_media_type_first():
    """ADVICE r10: a video/raw payload whose bytes coincidentally
    start with a container magic must get the stub arithmetic (the
    oracles' branch), not a container parse; and a media_type-
    mismatched container falls back to the stub, never misparses."""
    from gmall_flink_2021_spark.operators.multimodal import (
        _build_bmp, _build_png, _build_wav, _decode)

    bmp, wav, png = (_build_bmp(b"x" * 33), _build_wav(b"x" * 33),
                     _build_png(b"x" * 33))
    for payload in (bmp, wav, png):
        n = len(payload)
        assert _decode(payload, "video") == (16 + n % 64, 16 + n % 48,
                                             1 + n % 5)
    n = len(wav)
    assert _decode(wav, "image") == (16 + n % 64, 16 + n % 48, 1)
    n = len(bmp)
    assert _decode(bmp, "audio") == (0, 0, 1 + n % 100)


def test_wav_parser_clamps_truncated_and_duplicate_data_chunks():
    """ADVICE r10: a truncated data chunk reports only the samples
    actually present; the FIRST data chunk wins when several exist;
    a zero-size data chunk never divides by zero downstream."""
    import struct

    from gmall_flink_2021_spark.operators.multimodal import (
        _build_wav, _parse_wav, sample_frames)

    wav = _build_wav(b"p" * 40)           # 20 samples
    assert _parse_wav(wav) == (0, 0, 20)
    assert _parse_wav(wav[:-10]) == (0, 0, 15)   # 30 bytes present
    dup = wav + struct.pack("<4sI", b"data", 8) + b"\0" * 8
    assert _parse_wav(dup) == (0, 0, 20)  # first chunk wins
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000,
                      16000, 2, 16)
    empty = (struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8, b"WAVE")
             + fmt + struct.pack("<4sI", b"data", 0))
    assert _parse_wav(empty) == (0, 0, 0)
