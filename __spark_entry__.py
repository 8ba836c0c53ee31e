"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.1) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared inventory of
SURVEY.md §2.2 implemented in the ``multiomix_aws_emr_spark`` package.
Rows-only queries (no cross-engine hashable oracle) appear in
``queries()`` but not in ``oracle_sql()``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from multiomix_aws_emr_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by region/nation (scan -> 3 joins -> agg ->
    top-k) on /root/testdata/sf0.001."""
    return QUERIES["flagship_revenue_by_region"](spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """Map qid -> newest round with a clean row in CORRECTNESS_r*.json.

    The external gate walks ``queries()`` in dict order under a budget
    (rounds 1 and 2 each covered exactly 50), so ordering is the coverage
    lever: queries never yet driver-verified — or red last time — go
    first, then previously-green ones oldest-verification-first. Reading
    every record (not just the newest — a round-2 bug would have let
    round-1 greens crowd out the never-verified set) keeps this
    self-maintaining across rounds.
    """
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue  # backup copies etc. — never crash the entry module
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for qid, r in rows.items():
            if not isinstance(r, dict):
                continue
            clean_oracle = r.get("rows_match") and r.get("hash_match")
            ran_rows_only = r.get("err") == "no_oracle" and r.get("spark_rows")
            if clean_oracle or ran_rows_only:
                last[qid] = max(last.get(qid, 0), rnd)
    return last


# Queries whose newest driver evidence predates their current code or
# oracle must land inside the driver's ~50-query budget regardless of
# what the LRU sort alone would pick (the r5 convention: code-newer-
# than-evidence is the worst staleness). Round 13 pins exactly this
# round's own edits:
#
# 1. queries/registry.py changed the bound-class machinery for EVERY
#    declared query again (bound view registration + bound_sql) — on
#    every declared path, so a breakage fails all 190 at once (the r9
#    conf-assembly precedent): pins nothing by itself.
# 2. dedup_semantic was rewritten (capped semantic_survivors operator:
#    oversize-cluster re-split + tiled BLAS, r12 verdict task 1) — its
#    r12 evidence predates the new code.
# 3. operators/ingest.py's commit path now routes through the pluggable
#    CommitBackend (commitbackend.py) — pipeline_incremental_ingest is
#    the representative for the store family (stream_incremental_ingest
#    / retract / time-travel / diff share the same commit path and have
#    fresh r12 evidence besides).
# 4. similarity_ivf_incremental swapped its assert for the
#    by-construction centroid_matrix (ADVICE r12).
#
# That is 3 pinned + 2 new qids (embedding_quantize_pq and
# dedup_substring_spans, never-verified, leading the LRU segment
# automatically — the round's additions were capped at 2 precisely so
# the stale cohort still fits); the LRU sort below fills the remaining
# 45 of the driver's 50-qid budget with the ENTIRE 45-qid r9-stale
# cohort (VERDICT r12 task 2 — rollup/cube/grouping-sets/approx,
# window_moving_avg/range_frame, pivot_wide, the multimodal family,
# similarity_ivf/ann_lsh, dedup_embedding_cosine/latest_version,
# sample_hash_mod, the graph family, and the r5-era probe cohort),
# leaving max staleness r10 after r13
# (tests/test_entry_contract.py::test_budget_composition asserts the
# whole-cohort property generically).
_STALE_PRIORITY = [
    # (2) capped SemDeDup rewrite
    "dedup_semantic",
    # (3) CommitBackend commit-path representative for the store family
    "pipeline_incremental_ingest",
    # (4) centroid_matrix by-construction swap
    "similarity_ivf_incremental",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2, ordered for
    driver-budget coverage: the explicit stale-evidence cohort first
    (:data:`_STALE_PRIORITY` — code/oracle newer than its newest clean
    record), then least-recently-verified first (see
    :func:`_last_verified_round`): never-verified qids lead in
    declaration order, then verified ones by ascending round of their
    newest clean record."""
    last = _last_verified_round()
    order = list(QUERIES)
    prio = {q: i for i, q in enumerate(_STALE_PRIORITY) if q in QUERIES}
    ordered = sorted(
        order,
        key=lambda q: (prio.get(q, len(prio)), last.get(q, 0), order.index(q)),
    )
    return {q: QUERIES[q] for q in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return dict(ORACLES)
