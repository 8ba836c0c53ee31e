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
# than-evidence is the worst staleness). Round 16's budget composition
# (VERDICT r15 task 2 executed):
#
# The r15 optimization phase changed the executed plans of ~23 declared
# queries AFTER the r15 budget note was written; only three of them
# (dedup_near_minhash, dedup_minhash_components,
# pipeline_decontaminate_cut) landed in the r15 driver sample. The
# remaining 20 are pinned below so CORRECTNESS_r16 carries driver rows
# for every query whose code is newer than its newest clean record —
# plus any query the r16 optimization round itself touches (appended as
# the round proceeds, so the list is written AFTER the edits it covers,
# not before). The driver-run pytest oracle-parity sweep re-verified
# all 196 at the r15 HEAD, so this is staleness hygiene, not a known
# red. 20 pins + the budget's LRU fill take most of the 47-qid r12
# cohort; the leftover r12 tail is the price of the pin convention and
# leads the r17 budget automatically
# (tests/test_entry_contract.py::test_budget_composition asserts the
# generalized property: pins first, then the stalest non-pins, with no
# staler qid left outside).
_STALE_PRIORITY: list[str] = [
    # r15-changed, no r15 driver row (VERDICT r15 audit items 1-12):
    "ml_kmeans_embeddings",        # persist + random init (+ r16 guard)
    "dedup_semantic",              # keep= assignment rewrite
    "similarity_ivfpq",            # keep= + overlapped exact subtree
    "agg_winsorize_filter",        # single-buffer percentile pair
    "dedup_store_time_travel",     # overlapped staged store writes
    "pipeline_incremental_ingest",
    "dedup_store_version_diff",
    "stream_incremental_ingest",
    "dedup_retract_index",         # minhash distinct=False
    "dedup_incremental_minhash",   # shared-sketch batch filter
    "stream_dedup_watermark",      # minhash distinct=False
    "pipeline_curation",           # minhash distinct=False
    "pipeline_curation_v2",        # minhash distinct=False + fivegram
    "text_decontaminate",          # row-local fivegram build
    "graph_copurchase_pairs",      # session-shared edge list
    "graph_degree_distribution",
    "graph_triangle_count",
    "dedup_substring_spans",       # shared span build
    "pipeline_substring_cut",
    "similarity_ann_lsh",          # session-memoized dim probe
    # r16-changed (this round's optimization edits; evidence refreshed
    # by pinning them into the same budget):
    "stream_watermark_latedrop",   # volume-derived state sizing + tmpfs ckpt
    "stream_stateful_totals",
    "stream_session_window",
    "stream_rollup_upsert",
    "stream_static_join",
    "stream_interval_join_full",
    "stream_interval_join_outer",
    "source_python_stream",        # + poll tightening, sized rollup state
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
