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
# than-evidence is the worst staleness). Round 8 pins exactly the
# code-newer-than-evidence cohort (VERDICT r7 task 2 + this round's own
# edits):
#
# 1. python_udfs.py was edited by r7's hardening commit (NaN guard in
#    _bucket_group_stats executes on every driver fixture) — all five
#    qids that file backs;
# 2. streaming/util.py was edited in r7 (zero-commit sink fallback) AND
#    again in r8 (the fallback now probes via read + PATH_NOT_FOUND
#    catch instead of os.path.exists) — every bounded-streaming qid plus
#    the pydatasource trio that replays through the same runner;
# 3. plans/sketchcache.py was edited in r7 (stopped-session eviction) —
#    the sketch-cache dedup/curation family;
# 4. fs/fitness.py + fs/bbha.py + experiment.py were edited in r8
#    (NEG_INF sentinel for log_likelihood scoring, Efron tie handling in
#    the LL scorer, worst_fitness threading) — both BBHA qids. The
#    declared queries pin the logrank path whose values are untouched,
#    but the convention is file-level.
#
# NOT pinned: session.py's r8 edit (the localcluster probe's extra_conf
# override hook, default None) backs every qid, so file-level pinning
# would demand all 177 in one 50-qid budget. The honest reading: the
# driver path passes no extra_conf (byte-identical RUNTIME_CONF), and a
# session-level breakage is not a per-qid staleness risk — it fails
# every query in the round at once, which the driver run itself
# detects. tests/test_session.py covers the hook both ways.
#
# That is 27 qids; the LRU sort below fills the remaining ~23 of the
# driver's budget with the r4-stale cohort (36 unpinned qids, oldest
# evidence first, declaration order within a round), so after r08 the
# residual r4-stale tail is ~13 and leads the r9 rotation automatically.
_STALE_PRIORITY = [
    # (1) python_udfs.py — r7 edit, r6 evidence
    "udaf_group_stats",
    "udf_binarize_tanh",
    "udf_arrow_vector_norm",
    "udf_cogroup_asof",
    "udtf_python_tokenize",
    # (2) streaming/util.py — r7 + r8 edits
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_interval_join",
    "stream_watermark_latedrop",
    "stream_stateful_totals",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_rollup_upsert",
    "stream_static_join",
    "stream_interval_join_outer",
    "source_python_stream",
    "source_python_datasource",
    "sink_python_datasource",
    # (3) plans/sketchcache.py — r7 edit
    "dedup_near_minhash",
    "dedup_minhash_components",
    "pipeline_curation",
    "pipeline_curation_v2",
    "pipeline_curation_v3",
    "text_decontaminate",
    # (4) fs/* + experiment.py — r8 edits
    "fs_bbha_embeddings",
    "fs_bbha_improved",
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
