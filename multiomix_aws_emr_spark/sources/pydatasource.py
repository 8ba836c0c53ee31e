"""Custom connector via the Spark 4 Python Data Source API.

The sixth user surface (SQL / DataFrame / pandas-UDF / UDTF / pandas-API
/ custom data source): a DataSource subclass registered by name becomes a
first-class ``spark.read.format(...)`` — with REAL partition planning, so
the read parallelizes like any file source. The reference ingests its
expression matrices through a driver-side pandas read
(``scripts/utils.py:38-63``); this source re-founds that ingest shape as
a distributed connector: the matrix is split into feature-block
partitions, and each partition emits its block as ONE pyarrow
RecordBatch (the Arrow fast path the API supports — no per-row Python
loop crosses the boundary).

The synthetic cell value is closed-form —
``value(s, f) = ((s*31 + f*17) % 1000) / 10.0`` — so a DuckDB oracle can
recompute any aggregate over the matrix exactly: the connector's
partitioning, batch assembly, and option plumbing are all under the
cross-engine hash, not just "returns rows".
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FeatureBlock(InputPartition):
    def __init__(self, f_start: int, f_end: int):
        self.f_start = f_start
        self.f_end = f_end


class _MatrixReader(DataSourceReader):
    def __init__(self, options):
        self.n_samples = int(options.get("n_samples", "100"))
        self.n_features = int(options.get("n_features", "64"))
        self.block = int(options.get("feature_block", "8"))

    def partitions(self):
        return [
            _FeatureBlock(f, min(f + self.block, self.n_features))
            for f in range(0, self.n_features, self.block)
        ]

    def read(self, partition: _FeatureBlock):
        import numpy as np
        import pyarrow as pa

        f = np.arange(partition.f_start, partition.f_end, dtype=np.int64)
        s = np.arange(self.n_samples, dtype=np.int64)
        ff, ss = np.meshgrid(f, s, indexing="ij")
        vals = ((ss * 31 + ff * 17) % 1000) / 10.0
        yield pa.record_batch(
            {
                "sample_id": pa.array(ss.ravel()),
                "feature_id": pa.array(ff.ravel()),
                "value": pa.array(vals.ravel(), type=pa.float64()),
            }
        )


class SyntheticMatrixSource(DataSource):
    """``spark.read.format("omics_matrix")`` — deterministic synthetic
    expression matrix in long form (sample_id, feature_id, value)."""

    @classmethod
    def name(cls) -> str:
        return "omics_matrix"

    def schema(self) -> str:
        return "sample_id bigint, feature_id bigint, value double"

    def reader(self, schema) -> DataSourceReader:
        return _MatrixReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    try:
        spark.dataSource.register(SyntheticMatrixSource)
    except Exception:
        # already registered on this session — re-registration is the only
        # expected failure; reads keep working either way
        pass
