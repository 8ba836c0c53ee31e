"""Omics-pipeline surface as declared queries (rows-only: the metaheuristic
is iterative + seeded-random, not SQL-expressible; SURVEY.md §2.2 contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load


@query("fs_bbha_embeddings")  # rows-only: iterative seeded metaheuristic
def fs_bbha_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBHA feature selection (the reference's core job,
    `scripts/metaheuristics.py:468-734`) driven end-to-end on harness data:
    samples = embedding vectors, features = their first 16 dims, survival
    time = a deterministic function of 3 'informative' dims. Returns the
    per-(iteration, star) fitness history — the tidy replacement of the
    reference's metrics dict (D6)."""
    from multiomix_aws_emr_spark.fs.bbha import run_bbha

    rows = (
        load(spark, sf_dir, "embeddings")
        # vec_id < 200 == first 200 ids, as a pushed-down scan filter (no
        # global sort); slice the 16 dims server-side so the bounded
        # driver collect moves 16 floats/row, not the full vector
        .filter(F.col("vec_id") < 200)
        .select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
        .collect()
    )
    rows = sorted(rows, key=lambda r: r.vec_id)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    x = pd.DataFrame(
        mat,
        index=[r.vec_id for r in rows],
        columns=[f"dim_{i}" for i in range(16)],
    )
    # Deterministic survival signal carried by dims 0..2.
    time_col = 100.0 + 20.0 * (mat[:, 0] + mat[:, 1] + mat[:, 2])
    event_col = np.ones(len(rows), dtype=bool)

    result = run_bbha(
        spark,
        x,
        time_col,
        event_col,
        n_stars=8,
        n_iterations=2,
        random_state=42,
    )
    return result.history_df(spark).select(
        "iteration",
        "star_id",
        F.round("fitness", 4).alias("fitness"),
        "n_features",
    )
