"""Contract tests for __spark_entry__.py — the surface the external driver
actually consumes. No SparkSession needed: these pin the structural
guarantees (inventory completeness, oracle subset, and the verification
ordering that decides which queries land inside the driver's ~50-query
correctness budget each round)."""

import importlib.util
import os

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_inventory_complete_and_oracles_subset():
    mod = _entry_module()
    qs, os_ = mod.queries(), mod.oracle_sql()
    from multiomix_aws_emr_spark.queries import ORACLES, QUERIES

    assert set(qs) == set(QUERIES)
    assert set(os_) == set(ORACLES)
    assert set(os_) <= set(qs)
    # round-5 invariant: the whole declared surface is oracle-checked
    assert set(os_) == set(qs)


def test_stale_priority_cohort_leads_the_ordering():
    """Every query whose code or oracle changed after its newest clean
    driver record must sit inside the driver's ~50-query budget, ahead of
    the LRU tail — otherwise its evidence stays stale another round."""
    mod = _entry_module()
    order = list(mod.queries())
    for qid in mod._STALE_PRIORITY:
        assert qid in order, qid
        assert order.index(qid) < 50, (qid, order.index(qid))
    # priority cohort is a prefix: nothing non-priority interleaves
    assert order[: len(mod._STALE_PRIORITY)] == list(mod._STALE_PRIORITY)


def test_lru_ordering_after_priority_prefix():
    """Past the priority prefix, queries sort by ascending newest-clean
    round (least-recently-verified first)."""
    mod = _entry_module()
    last = mod._last_verified_round()
    order = list(mod.queries())
    tail = order[len(mod._STALE_PRIORITY) :]
    rounds = [last.get(q, 0) for q in tail]
    assert rounds == sorted(rounds)


def test_budget_composition():
    """The driver's 50-qid budget must carry the round's full staleness
    target: every never-verified qid, every pin, and the ENTIRE oldest
    evidence cohort — nothing older than the oldest round represented in
    the budget may be left outside it (the VERDICT r11 task-1 contract,
    generalized per r12 task 2: max staleness advances every round)."""
    mod = _entry_module()
    last = mod._last_verified_round()
    order = list(mod.queries())
    top, rest = order[:50], order[50:]
    pins = set(mod._STALE_PRIORITY)
    # the round's code-newer-than-evidence pins lead the budget
    assert all(q in top for q in mod._STALE_PRIORITY)
    # never-verified (new this round) qids all sit inside the budget
    assert all(last.get(q, 0) != 0 for q in rest)
    # the non-pin budget slots take the stalest available qids: nothing
    # outside the budget is strictly staler than a non-pin inside it.
    # (The r11-r15 whole-cohort form — "the oldest round is cleared
    # whole" — is the pins == [] special case; a pin cohort larger than
    # the leftover slots legitimately splits the oldest round, because
    # code-newer-than-evidence outranks plain age — the r5 convention.)
    if rest:
        oldest_out = min(last.get(q, 0) for q in rest)
        offenders = [
            q for q in top if q not in pins and last.get(q, 0) > oldest_out
        ]
        assert not offenders, (oldest_out, offenders)
