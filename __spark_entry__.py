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
# than-evidence is the worst staleness). Round 7 edits NO declared-query
# code (its changes are driver-path-unreachable hardening: a zero-batch
# fallback in streaming/util.bounded_result, a bench-only prewarm
# timeout, sketch-cache eviction for stopped sessions, a NaN assert in
# udaf_group_stats that passes on every driver fixture), so the round-7
# rotation is pure freshness closure: the exact 19-member r2-stale plus
# 31-member r3-stale cohort (VERDICT r6 task 1), oldest evidence first,
# declaration order within a round. After r07 the maximum staleness of
# any of the 177 qids drops to r4. The LRU sort below would produce the
# same 50 on its own; listing them pins the contract explicitly.
_STALE_PRIORITY = [
    # newest clean driver record r2 (19 qids)
    "join_range_binned",
    "join_asof_event",
    "join_temporal_dim",
    "sort_limit_topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "set_except_all",
    "unpivot_long",
    "flagship_revenue_by_region",
    "sql_shipping_priority",
    "sql_returned_items",
    "sql_order_priority",
    "join_salted_skew",
    "join_full_outer",
    "join_null_safe",
    "set_union_by_name_evolution",
    # newest clean driver record r3 (31 qids)
    "similarity_pairwise",
    "similarity_topk",
    "dedup_entity_fuzzy",
    "multimodal_decode",
    "multimodal_resize_decode",
    "multimodal_audio_decode",
    "sample_topk_hash",
    "sql_correlated_scalar",
    "sql_local_supplier_volume",
    "sql_revenue_change",
    "sql_promo_revenue",
    "sql_disjunctive_join_filter",
    "sql_lateral_topk",
    "sql_recursive_chain",
    "join_bucketed_colocated",
    "scalar_string",
    "scalar_date",
    "scalar_array",
    "array_explode",
    "array_aggregate",
    "text_wordcount",
    "text_stats",
    "text_token_count",
    "text_quality_score",
    "text_fingerprint",
    "text_lang_id",
    "udtf_expand",
    "text_token_count_bpe",
    "text_chunk_windows",
    "pipeline_pack_sequences",
    "text_redact_pii",
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
