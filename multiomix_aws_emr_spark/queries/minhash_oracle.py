"""DuckDB oracle SQL for the portable MinHash-LSH pipeline.

Recomputes operators/dedup.py's portable path exactly: 3-word shingles
(short-doc rule included), 16 seeded 60-bit min-hashes
(functions/porthash.py), 4 bands of 4 rows with md5-string bucket keys,
and the one-step rep assignment (min doc_id sharing any bucket). Shared by
the `dedup_near_minhash` and `dedup_minhash_components` oracles.
"""

from __future__ import annotations

from multiomix_aws_emr_spark.functions.porthash import phash_pair_sql

_NUM_HASHES = 16
_BANDS = 4
_ROWS_PER_BAND = _NUM_HASHES // _BANDS


def minhash_onestep_ctes(table: str = "documents") -> str:
    """CTE chain ending in ``onestep(doc_id, rep_id)`` — the one-step
    MinHash-LSH cluster assignment, total over the corpus. Signatures use
    the K-M double-hashing family ``h_i = a + i*b`` (one md5 per shingle),
    mirroring operators/dedup.py's portable path exactly."""
    a_sql, b_sql = phash_pair_sql("shingle")
    mins = ", ".join(
        f"MIN(a + {i} * b) AS h{i}" for i in range(_NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws('|', {hs})) AS bucket FROM sig".format(
            b=b,
            hs=", ".join(
                f"h{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
            ),
        )
        for b in range(_BANDS)
    )
    return f"""
t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM {table}
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   FOR i IN range(1, len(w) - 1)]) AS shingle
    FROM t WHERE len(w) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(w, ' ') AS shingle
    FROM t WHERE len(w) BETWEEN 1 AND 2
  )
), pre AS (
  SELECT doc_id, {a_sql} AS a, {b_sql} AS b FROM sh
), sig AS (
  SELECT doc_id, {mins} FROM pre GROUP BY doc_id
), banded AS (
  {band_selects}
), reps AS (
  SELECT band, bucket, MIN(doc_id) AS rep FROM banded GROUP BY band, bucket
), onestep AS (
  SELECT b.doc_id, CAST(MIN(r.rep) AS BIGINT) AS rep_id
  FROM banded b JOIN reps r USING (band, bucket) GROUP BY b.doc_id
)"""


def minhash_onestep_sql() -> str:
    """Full oracle for `dedup_near_minhash`: (doc_id, rep_id)."""
    return f"WITH {minhash_onestep_ctes()} SELECT doc_id, rep_id FROM onestep"


def minhash_incremental_sql(split_mod: int = 4) -> str:
    """Full oracle for `dedup_incremental_minhash`: the NEW batch's rows
    (doc_id % split_mod = 0) of the one-step assignment recomputed over
    old∪new from scratch — the ground truth the incremental index path
    must reproduce without re-reading the old corpus."""
    return (
        f"WITH {minhash_onestep_ctes()} "
        f"SELECT doc_id, rep_id FROM onestep WHERE doc_id % {split_mod} = 0"
    )


def minhash_components_sql() -> str:
    """Full oracle for `dedup_minhash_components`: (doc_id, component).

    Closes the one-step edges to connected components with a recursive
    transitive-closure CTE (tractable at oracle scale — the dup subgraph
    is tiny relative to the corpus), labels each node with the minimum
    reachable doc_id, and stitches singletons back as their own label —
    the exact contract of operators/components.py's min-label fixpoint.
    """
    return f"""
WITH RECURSIVE {minhash_onestep_ctes()},
edges AS (
  SELECT doc_id AS a, rep_id AS b FROM onestep WHERE doc_id <> rep_id
), und AS (
  SELECT a, b FROM edges UNION SELECT b, a FROM edges
), reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
), labels AS (
  SELECT src AS doc_id, LEAST(MIN(dst), src) AS component
  FROM reach GROUP BY src
)
SELECT o.doc_id, CAST(COALESCE(l.component, o.doc_id) AS BIGINT) AS component
FROM onestep o LEFT JOIN labels l USING (doc_id)
"""
