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
# than-evidence is the worst staleness). Round 15's budget composition
# (VERDICT r14 tasks 1-2, the r14 note's math honored exactly):
#
# 1. ZERO pins. The round's only declared-path edits are (a)
#    text_unigram_rarity's docstring (the single-pass rewrite was
#    MEASURED AND REJECTED — the code shape is byte-identical to its
#    banded r11 form; the rewrite ships as the separate component
#    operators/quality.unigram_rarity, contract-tested against the
#    declared query), and text_unigram_rarity sits inside the r11
#    cohort below anyway, so it gets fresh driver evidence regardless;
#    (b) operators/similarity.py's packed-lane guard (ADVICE r14) —
#    consumed only by components and by similarity_ivfpq's
#    plan-asserted path, whose r14 evidence postdates nothing (the
#    guard raises on inputs the declared query never passes, and
#    tests/test_semantic_dedup.py re-verifies the scoring contract at
#    HEAD); (c) operators/dedup.contamination_spans gained the optional
#    eval_grams parameter (the fixpoint loop's reuse seam; default path
#    byte-equivalent) — its only declared consumer is
#    pipeline_decontaminate_cut, the round's new qid, which
#    driver-verifies the changed path itself.
# 2. ONE new qid: pipeline_decontaminate_cut — the r14 promotion
#    candidate (contamination_spans + cut_spans + residual per-lang
#    stats, the pipeline_substring_cut oracle shape; components tested
#    + 100x-probed in r14, driver-hash-checked for the first time this
#    round). Never-verified, so it leads the LRU segment automatically.
#
# 1 new qid + the ENTIRE 49-qid r11-stale cohort = exactly the 50-qid
# budget (agg_global, the set family incl. union_by_name_evolution and
# the *_all pair, the sql TPC-H block incl. recursive_chain /
# correlated_scalar / lateral_topk, the dedup gram/minhash/simhash
# family, text_wordcount/stats/lang_id/quality_score/fingerprint/
# token_count(_bpe)/chunk_windows/redact_pii/unigram_rarity,
# scalar_string/date/array, array_explode/aggregate, graph_pagerank,
# join_bucketed_colocated/full_outer/null_safe/salted_skew,
# pipeline_pack_sequences, sample_topk_hash, sort_limit_topk,
# source_python_stream, stream_rollup_upsert, udtf_expand,
# unpivot_long), leaving max staleness r12 after r15
# (tests/test_entry_contract.py::test_budget_composition asserts the
# whole-cohort property generically; text_lm_score stays the r16-first
# promotion — no second free slot this round, decision dated in
# SURVEY §7).
_STALE_PRIORITY: list[str] = []


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
