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
# oracle. They must land inside the driver's ~50-query budget regardless
# of what the LRU sort alone would pick (the r5 convention: code-newer-
# than-evidence is the worst staleness). Every r5 priority entry got its
# clean r5 record, so round 6 lists only the queries round 6 itself
# edited; after them the LRU sort surfaces the 54-query cohort whose
# newest clean record is from r1/r2 (VERDICT r5 task 1) oldest-first —
# pipeline_curation_v2 is both edited and in that cohort.
_STALE_PRIORITY = [
    # r6: BBHA invariant oracle extended with the R34 baseline row, and
    # the runs now evaluate the all-features baseline first
    "fs_bbha_embeddings",
    "fs_bbha_improved",
    # r6: exact dedup regrouped on compact fingerprints (identical
    # results, new plan) and the MinHash banded sketch shared via
    # plans/sketchcache.py
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_minhash_components",
    "pipeline_curation",
    "pipeline_curation_v2",
    # r6: exact-integer order-independent aggregation (the directory-
    # layout sweep caught a summation-order ULP flip at a .xxxx5 mean
    # boundary; code AND oracle rewritten together)
    "udaf_group_stats",
    # r6 (late): bounded streaming runners reworked for scale after the
    # 1000x events probe OOM (durable-sink option, await_bounded true
    # termination, byte-capped micro-batches — commit b40de7f). Fixture
    # behavior is contract-identical (memory sink, per-file triggers),
    # but the code is newer than every prior driver record, so all
    # declared queries routed through streaming/util.py re-verify now:
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_rollup_upsert",
    "stream_static_join",
    "stream_watermark_latedrop",
    "stream_stateful_totals",
    "stream_interval_join_outer",
    "source_python_stream",
]
# With a ~50-query budget this covers the 15 edited queries plus ~36 of
# the 54-member r1/r2 cohort; the residual r2-stale queries (unchanged
# code, green-if-old records) lead the r7 rotation.


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
