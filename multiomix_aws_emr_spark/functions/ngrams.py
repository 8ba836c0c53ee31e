"""Shared n-gram tokenization: one bigram pipeline, five consumers.

``bigram_rows`` is THE adjacent-whitespace-bigram derivation used by
dedup_ngram_jaccard, dedup_containment, text_repetition_ratio,
text_ngram_topk, and pipeline_curation_v3 — extracted so a change to
bigram semantics (tokenization, punctuation, adjacency) lands in exactly
one place and cannot silently desynchronize the queries from each other
or from their DuckDB oracles.

Shape: posexplode(split) + window lead — plain codegen expressions
throughout (the array-HOF formulation compiles a fresh Janino class per
execution; measured ~1.7s of driver compile per run vs ~0.2s this way,
see dedup_ngram_jaccard's original note). Empty tokens are filtered
AFTER the explode; position gaps don't affect adjacency because the
window orders by the original position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bigram_rows(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, bg) — one row per adjacent token bigram per document."""
    w = Window.partitionBy(id_col).orderBy("pos")
    tok = df.select(
        id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    return (
        tok.select(
            id_col,
            F.lead("tok", 1).over(w).alias("_nxt"),
            F.concat_ws(" ", "tok", F.lead("tok", 1).over(w)).alias("bg"),
        )
        .filter(F.col("_nxt").isNotNull())
        .select(id_col, "bg")
    )
