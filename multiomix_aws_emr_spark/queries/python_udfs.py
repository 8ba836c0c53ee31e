"""The Python-UDF surface: scalar pandas UDF, grouped-map UDAF.

These two queries deliberately route through Python to exercise the Arrow
exchange path the omics pipeline depends on (the fitness evaluation of
SURVEY.md §2.1 R9/R26/R27 is a grouped-map UDF). Everything else in the
engine stays JVM-side; when Python is unavoidable, it is ALWAYS
Arrow-batched (pandas_udf / applyInPandas), never row-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import events_v, with_events_v


def _binarize_tanh_fn(v: pd.Series) -> pd.Series:
    """R17's star-position update rule, derandomized: keep the bit iff
    |tanh(x)| > 0.6 (ref: metaheuristics.py:696-705, threshold default
    :479). NaN/NULL compare False -> 0, matching the SQL CASE's ELSE."""
    arr = v.to_numpy(dtype="float64", na_value=np.nan)
    bits = np.abs(np.tanh(arr / 100.0)) > 0.6
    return pd.Series(bits.astype("int32"))


@query(
    "udf_binarize_tanh",
    # tanh via the stable exp identity — DuckDB 1.0 has no TANH built-in.
    oracle=with_events_v(
        "SELECT event_id, CASE WHEN ABS(1 - 2/(EXP(2*(value/100)) + 1)) > 0.6 "
        "THEN 1 ELSE 0 END AS bit FROM events_v"
    ),
)
def udf_binarize_tanh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized) applying the tanh binarization."""
    ev = events_v(spark, sf_dir)
    binarize = pandas_udf(_binarize_tanh_fn, "int")
    return ev.select("event_id", binarize("value").alias("bit"))


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group n / mean / population std with NumPy — np.std is population
    sigma (ddof=0), the semantics the reference uses for idle-time metrics
    (metaheuristics.py:707-714, R20)."""
    v = pdf["value"].to_numpy(dtype="float64")
    finite = v[~np.isnan(v)]
    mean = float(np.mean(finite)) if finite.size else None
    sd = float(np.std(finite)) if finite.size else None
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "mean_v": [mean],
            "sd_pop": [sd],
        }
    )


@query(
    "udaf_group_stats",
    oracle=with_events_v(
        "SELECT user_id, COUNT(*) AS n, ROUND(AVG(value), 4) AS mean_v, "
        "ROUND(STDDEV_POP(value), 4) AS sd_pop FROM events_v GROUP BY user_id"
    ),
)
def udaf_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas — the execution shape of the
    reference's per-partition fitness evaluation (metaheuristics.py:214-222
    mapPartitions, R9) on the Arrow fast path. Rounding happens JVM-side
    AFTER the UDF (SQL ROUND is half-away-from-zero; Python's round is
    banker's)."""
    ev = events_v(spark, sf_dir).select("user_id", "value")
    raw = ev.groupBy("user_id").applyInPandas(
        _group_stats, schema="user_id bigint, n bigint, mean_v double, sd_pop double"
    )
    return raw.select(
        "user_id",
        "n",
        F.round("mean_v", 4).alias("mean_v"),
        F.round("sd_pop", 4).alias("sd_pop"),
    )
