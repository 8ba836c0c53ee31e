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
# than-evidence is the worst staleness). Round 12 pins exactly this
# round's own edits:
#
# 1. queries/registry.py changed the bound-class machinery for EVERY
#    declared query (derived-frame binding propagation, writer proxies)
#    — on every declared path, so a breakage fails all 181 at once (the
#    r9 conf-assembly precedent): pins nothing by itself.
# 2. plans/sketchcache.py restructured minhash_band_index (build+write
#    moved outside the module lock, sentinel publish) and _put (sentinel
#    -aware eviction) — ONE pin covers both changed paths:
#    dedup_incremental_minhash consumes minhash_band_index directly AND
#    publishes through the changed _put, so it is the representative for
#    the whole sketch-cache family (near_minhash / minhash_components
#    share the _put entry path and stay unpinned; the ten late-r12
#    query additions left exactly 38 budget slots for the 38-qid r8
#    cohort, and tests/test_entry_contract.py::test_r12_budget_composition
#    is the alarm that fires if a pin or addition pushes any of them
#    out).
# 3. streaming/watermark.py + stateful.py moved checkpoint cleanup to
#    the success-only path — pinned representative per runner:
#    stream_watermark_latedrop (watermark runner); the stateful runner's
#    qid (stream_stateful_totals) is already in the r8-stale cohort
#    below.
# 4. The NEW qids pipeline_incremental_ingest (operators/ingest.py),
#    stream_incremental_ingest (streaming/ingest.py), dedup_retract_index
#    (retraction), dedup_store_time_travel (as-of version reads),
#    dedup_store_version_diff (snapshot changelog),
#    similarity_ivf_incremental (persisted-quantizer ANN ingest),
#    join_runtime_bloom + join_dynamic_partition_prune (runtime-filter
#    family), and embedding_quantize_int8 are never-verified and lead
#    the LRU segment automatically.
#
# That is 2 pinned + 10 new qids; the LRU sort below fills the remaining
# 38 of the driver's 50-qid budget with exactly the 38 r8-stale qids
# (VERDICT r11 task 1 — the agg/window/stream/udf/variant/pipeline-text
# cohort), leaving max staleness r9 after r12
# (tests/test_entry_contract.py asserts the 50-budget composition).
_STALE_PRIORITY = [
    # (2) sketch-cache build-path representative (band index + _put)
    "dedup_incremental_minhash",
    # (3) success-only checkpoint-cleanup representative
    "stream_watermark_latedrop",
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
