"""Session-scoped reuse of the MinHash-LSH banded sketch sub-plan.

Four declared queries derive from the SAME per-document sketch of the
``documents`` table (``dedup_near_minhash``, ``dedup_minhash_components``,
``pipeline_curation``, ``pipeline_curation_v2``) — before round 6 each
one recompiled and re-executed the full shingle -> signature -> band
pipeline from the parquet scan. Because every banded row is a function
of its document's own text only (operators/dedup.banded_buckets), the
sketch is computed ONCE per (session, corpus, parameters) here,
persisted (memory, spill-to-disk), and restricted per-consumer by
semi-join.

This is the single-process analog of the warehouse-scale pattern: on a
100 TB corpus the sketch is materialized as its own columnar table
(docs x 4 bands of ~20-byte rows — orders of magnitude smaller than
the text it derives from) and reused by every pipeline variant that
deduplicates, rather than re-reading and re-shingling the corpus per
pipeline. Restricting a filtered pipeline by semi-join on the compact
sketch is exact (the rep assignment recomputes over the subset); only
the per-doc sketch rows are shared.

The cache key includes the Spark application id, so entries from a
stopped session are never served to a new one; stale entries are
unreachable and individually tiny (a plan handle, not data — the
persisted blocks die with their session).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

_lock = threading.Lock()
_cache: dict[tuple, DataFrame] = {}


def banded_documents(
    spark: SparkSession,
    sf_dir: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    portable: bool = True,
) -> DataFrame:
    """The persisted (doc_id, band, bucket) sketch of ``documents`` at
    ``sf_dir``, computed at most once per session + parameter set."""
    from multiomix_aws_emr_spark.operators.dedup import banded_buckets
    from multiomix_aws_emr_spark.sources.tables import load

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        num_hashes,
        bands,
        shingle_words,
        portable,
    )
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            return cached
        banded = banded_buckets(
            load(spark, sf_dir, "documents"),
            text_col="text",
            id_col="doc_id",
            num_hashes=num_hashes,
            bands=bands,
            shingle_words=shingle_words,
            portable=portable,
        ).persist()
        _cache[key] = banded
        return banded
