"""Self-enforcing rotation-staleness invariant (VERDICT r7 #2).

The driver grades the first ``GRADE_WINDOW`` registry entries per
round, so with 151 queries a ≤3-round full rotation is
over-subscribed by construction; the documented ceiling is
``ROTATION_CEILING_ROUNDS`` = 4 (see the registry's rationale
comment). Rounds 4-7 verified the realized staleness by manual
arithmetic over the CORRECTNESS artifacts; these tests make the
ceiling a failing test instead:

 - **arithmetic feasibility**: the registry must FIT the ceiling
   with slack left for contract-change promotions;
 - **realized ceiling**: no live query's newest green CORRECTNESS
   row may be older than the ceiling allows;
 - **predictive**: any query that would breach after one more
   ungraded round must sit inside the NEXT grading window (so the
   upcoming driver run repairs it), and never-graded queries must
   sort first.

No Spark session needed — this reads the committed artifacts only.
"""

from __future__ import annotations

import pytest

from gmall_flink_2021_spark.plans import registry as R


def _staleness():
    st = R._staleness_order(R.QUERIES)
    if st is None:
        pytest.skip("no CORRECTNESS_r*.json artifacts (fresh clone)")
    order, latest, max_round = st
    live = set(R.QUERIES)
    graded = {n: r for n, r in latest.items() if n in live}
    return graded, max_round, live


def test_registry_fits_rotation_ceiling():
    """ceil(len/GRADE_WINDOW) rounds must fit inside the ceiling with
    slack for displacements: a full rotation cycle has
    GRADE_WINDOW * ROTATION_CEILING_ROUNDS slots; whatever exceeds
    len(QUERIES) is the budget for contract-change promotions and
    new queries across the cycle. Require at least 20 slack slots so
    a typical round's promotions (<= ~7 so far) cannot starve stale
    re-grades across a cycle."""
    capacity = R.GRADE_WINDOW * R.ROTATION_CEILING_ROUNDS
    assert len(R.QUERIES) <= capacity - 20, (
        f"registry has {len(R.QUERIES)} queries; a "
        f"{R.ROTATION_CEILING_ROUNDS}-round cycle offers {capacity} "
        f"slots and needs >=20 spare for promotions — retire/merge "
        f"queries or raise the documented ceiling")


def test_no_query_exceeds_staleness_ceiling():
    """Every live query graded at least once must have its newest
    green row within the last ROTATION_CEILING_ROUNDS rounds
    (age = max_round - newest_green <= ceiling - 1)."""
    graded, max_round, _live = _staleness()
    limit = R.ROTATION_CEILING_ROUNDS - 1
    over = {n: max_round - r for n, r in graded.items()
            if max_round - r > limit}
    assert not over, (
        f"queries past the {R.ROTATION_CEILING_ROUNDS}-round rotation "
        f"ceiling (age > {limit} rounds at max_round={max_round}): "
        f"{sorted(over.items(), key=lambda kv: -kv[1])}")


def test_at_risk_queries_are_in_next_window():
    """A query whose newest green row is exactly at the ceiling edge
    (age == ceiling - 1) breaches if the upcoming round skips it, so
    it must occupy one of the first GRADE_WINDOW registry slots. The
    registry order IS the driver's grading order, so this predicts —
    before the driver runs — that the next CORRECTNESS artifact
    repairs every at-risk query."""
    graded, max_round, _live = _staleness()
    window = list(R.QUERIES)[:R.GRADE_WINDOW]
    edge = R.ROTATION_CEILING_ROUNDS - 1
    at_risk = [n for n, r in graded.items() if max_round - r == edge]
    missing = [n for n in at_risk if n not in window]
    assert not missing, (
        f"at-risk queries (newest green r{max_round - edge}) not in "
        f"the next {R.GRADE_WINDOW}-slot grading window: {missing}")


def test_never_graded_queries_sort_first():
    """A query with no CORRECTNESS row at all (new this round) must
    be in the next window — `_staleness_order` sorts latest=0 first,
    so a violation means someone bypassed _finalize ordering."""
    graded, _max_round, live = _staleness()
    window = set(list(R.QUERIES)[:R.GRADE_WINDOW])
    never = [n for n in live if n not in graded]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-graded queries outside the next grading window: "
        f"{missing}")


def test_pending_promotions_are_in_next_window():
    """Round-10 decision (VERDICT r9 #6): the registry stays at 150
    with the FOUR-round ceiling (200 slots = 50 promotion-slack
    slots) rather than folding below 147 — but the slack arithmetic
    must hold in the REALIZED ordering, not just in documentation.
    Any contract-change promotion still pending (its
    _CHANGED_THIS_ROUND round is newer than its newest green row)
    must occupy the next grading window alongside the at-risk
    re-grades; if promotions ever displace an at-risk query out of
    the window, test_at_risk_queries_are_in_next_window fails with
    it, making a starved rotation a failing suite instead of a
    round-N surprise."""
    graded, _max_round, _live = _staleness()
    window = set(list(R.QUERIES)[:R.GRADE_WINDOW])
    pending = [n for n, rnd in R._CHANGED_THIS_ROUND.items()
               if n in R.QUERIES and graded.get(n, -1) < rnd]
    missing = [n for n in pending if n not in window]
    assert not missing, (
        f"pending contract-change promotions outside the next "
        f"{R.GRADE_WINDOW}-slot grading window: {missing}")
