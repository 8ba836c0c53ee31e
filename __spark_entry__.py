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
# than-evidence is the worst staleness). Round 14 pins exactly this
# round's own edits:
#
# 1. queries/registry.py changed bound_sql again (literal/comment
#    stripping before the identifier scan, ADVICE r13) — on every
#    declared path via the registry import, so a breakage fails all
#    195 at once (the r9 conf-assembly precedent): pins nothing by
#    itself.
# 2. operators/ingest.py (latest_manifest protocol error, ADVICE r13)
#    and operators/commitbackend.py (publish tolerates torn read-back,
#    found by the two-process race probe) both changed the store
#    family's commit path — pipeline_incremental_ingest is the family
#    representative (stream_incremental_ingest / retract / time-travel
#    / diff share the path and have fresh r12/r13 evidence besides).
# 3. dedup_substring_spans' body was factored into
#    operators/dedup.substring_spans — code newer than its r13
#    evidence, but NOT pinned: the never-verified pipeline_substring_cut
#    (in-budget below) runs the SAME operator and its oracle recomputes
#    the full span chain (grams, inventory, merge) from raw text, so
#    the factored body gets fresh r14 driver evidence through it; the
#    remaining declaration-only wrapper is three lines, and the
#    parametrized pytest parity sweep re-verifies its own oracle at
#    HEAD regardless. Pinning it too would push the 46-qid stale
#    cohort to 51 entries and leave one r10 qid behind.
# 4. operators/similarity.py gained the wide array<bigint> packing +
#    LUT-literal binding (dd68db7) — every touched/added function
#    (pq_pack_codes_wide, flat_lut_literal, adc_dist2_packed's new
#    kwargs, the packed top-k pair) is consumed only by components and
#    by similarity_ivfpq, itself a never-verified new qid that leads
#    the LRU segment automatically: pins nothing.
# 5. operators/dedup.ngram_contamination is consumed only by
#    decontaminate_ngram, the round's third (and last) new qid —
#    never-verified, leads the LRU segment automatically.
#
# That is 1 pinned + 3 new qids (similarity_ivfpq,
# pipeline_substring_cut, decontaminate_ngram — never-verified, leading
# the LRU segment automatically; the round's additions were capped at 3,
# the VERDICT r13 ceiling, precisely so the stale cohort still fits);
# the LRU sort below fills the remaining
# 46 of the driver's 50-qid budget with the ENTIRE 46-qid r10-stale
# cohort (VERDICT r13 task 1 — cast_types, the filter/join §2.2
# families, flagship_revenue_by_region, the graph family,
# ml_kmeans_embeddings, the multimodal decode family, the omics trio,
# pipeline_curation_v3, project/scan families, ps_pandas_api_groupby,
# quality_expectations, the sampling pair, secure_masked_view,
# similarity_pairwise/topk, the sql pair, the stream interval joins,
# join_range_binned/temporal_dim, dedup_exact/entity_fuzzy,
# agg_collect_sorted/mode_per_group, scan_partitioned_pruned/
# tsv_roundtrip), leaving max staleness r11 after r14
# (tests/test_entry_contract.py::test_budget_composition asserts the
# whole-cohort property generically).
_STALE_PRIORITY = [
    # (2) commit-path representative for the store family
    "pipeline_incremental_ingest",
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
