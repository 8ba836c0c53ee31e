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
# than-evidence is the worst staleness). The r8 cohort all earned clean
# r08 records, so round 9 pins exactly this round's own edits:
#
# 1. operators/components.py + the new operators/checkpointing.py +
#    the one edited statement in queries/llmdata.py (the fixpoint's
#    lineage cuts now route through truncate_lineage; default behavior
#    localCheckpoint unchanged) — dedup_minhash_components. The llmdata
#    edit is confined to that function's body (nothing else reads
#    one_step), so the pin is function-scoped rather than dragging the
#    ~25 other llmdata-backed qids into one 50-qid budget (the r8
#    session.py precedent for scoping with an argument).
# 2. queries/graphs.py — the pagerank lineage cut routes through
#    truncate_lineage — graph_pagerank.
# 3. streaming/watermark.py — rate_source_smoke's progress-based
#    deadline (test-harness path, but the convention is file-level) —
#    stream_watermark_latedrop, the file's one declared consumer.
# 4. session.py's RUNTIME_CONF now sets the parquet WRITE codec to zstd
#    (tools/codec_probe.py record). Read paths are codec-agnostic, so
#    per-qid staleness applies only to the declared queries that WRITE
#    parquet: the maintenance trio and the python-sink roundtrip.
#
# sized_shuffle_partitions / adaptive_sizing_conf / parquet_bytes are
# additive session APIs off every declared path (tests +
# tests/test_session.py cover them); a conf-assembly breakage fails all
# 177 at once, which the driver run itself detects.
#
# That is 7 qids; the LRU sort below fills the remaining ~43 of the
# driver's budget with the r4-stale windows/analytics cohort (13 qids,
# VERDICT r8 task 1 — all pre-validated at sf0.01 this round) and then
# the oldest r5 evidence, leaving max staleness r5 after r09.
_STALE_PRIORITY = [
    # (1) components/checkpointing/llmdata — r9 fixpoint lineage-cut route
    "dedup_minhash_components",
    # (2) graphs.py — r9 lineage-cut route
    "graph_pagerank",
    # (3) streaming/watermark.py — r9 progress-deadline edit
    "stream_watermark_latedrop",
    # (4) session.py zstd write codec — the declared parquet writers
    "maintenance_compact_files",
    "maintenance_merge_upsert",
    "maintenance_recompress_zstd",
    "sink_python_datasource",
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
