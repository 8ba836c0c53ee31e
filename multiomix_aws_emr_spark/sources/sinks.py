"""Result sinks: the Spark-native replacements of the reference's outputs.

The reference writes three artifacts per experiment
(`scripts/core.py:249-289`): a metrics JSON of parallel lists (D6), a
`result.json`, and a pickled best estimator (`model.pkl`, R25). Here:

- tidy metrics/result DataFrames go to JSON lines or parquet via
  ``df.write`` (R24) — one row per (iteration, star) replaces the
  dict-of-parallel-lists, so results are themselves queryable;
- partitioned parquet is the at-scale default (partition column prunes
  reads; parquet stats skip row groups);
- model artifacts are pickled to a path and referenced BY PATH from
  result rows — estimators never travel inside DataFrames
  (SURVEY.md §1.2 D4 note).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSON-lines sink (R24: `scripts/core.py:262-263,287-289`)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; pass ``partition_by`` for partition-pruned layouts."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_model_artifact(model: Any, directory: str, name: str = "model.pkl") -> str:
    """Pickle an estimator to ``directory/name`` and return the path
    (R25: `scripts/core.py:265-269`). Store the returned path in result
    rows instead of the object."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    with open(path, "wb") as fh:
        pickle.dump(model, fh)
    return path


def read_model_artifact(path: str) -> Any:
    """Load a pickled estimator previously written by write_model_artifact.

    Only unpickle artifacts this engine wrote itself (pickle executes
    arbitrary code by design — never point this at untrusted files).
    """
    with open(path, "rb") as fh:
        return pickle.load(fh)
