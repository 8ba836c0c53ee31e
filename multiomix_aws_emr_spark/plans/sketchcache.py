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
stopped session are never served to a new one; on every insert,
entries keyed to OTHER application ids are evicted (a multi-session
process — e.g. a test run that builds several sessions — would
otherwise accumulate dead DataFrame/JVM plan handles; the persisted
blocks themselves die with their session either way).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

_lock = threading.Lock()
# values: a DataFrame, (DataFrame, str path) for persisted artifacts, or
# a scalar (embedding_dim's int probe result)
_cache: dict[tuple, object] = {}


def _put(key: tuple, df: DataFrame) -> None:
    """Insert under ``_lock``, evicting entries from other sessions: key[0]
    is always the owning applicationId, so anything keyed differently
    belongs to a stopped (or at least different) session whose plan
    handles this process can no longer use."""
    import threading

    app_id = key[0]
    for k in [k for k in _cache if k[0] != app_id]:
        evicted = _cache.pop(k)
        if isinstance(evicted, threading.Event):
            evicted.set()  # wake any waiter; it re-checks and rebuilds
    _cache[key] = df


def embedding_dim(
    spark: SparkSession,
    sf_dir: str,
    *,
    table: str = "embeddings",
    vec_col: str = "embedding",
) -> int:
    """The vector dimensionality of ``table``'s ``vec_col`` at ``sf_dir``,
    probed from ONE row at most once per session + corpus (r15).

    ANN operators need dim on the DRIVER to size hyperplane/codebook
    literals; each uncached probe is a 1-row job (~0.2-0.5 s warm at
    sf0.1) that re-runs on every query build. The column is rectangular
    by fixture contract (the wide_agg guard in operators/similarity.py
    documents the same invariant), so one row decides it."""
    from multiomix_aws_emr_spark.sources.tables import load

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "embdim",
        table,
        vec_col,
    )
    with _lock:
        cached = _cache.get(key)
    if isinstance(cached, int):
        return cached
    # probe outside _lock: it is a (small) Spark job, and the module lock
    # must never be held across jobs (see minhash_band_index). A benign
    # duplicate probe on a race costs one extra 1-row job.
    row = load(spark, sf_dir, table).select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer vector dim: {table}.{vec_col} at {sf_dir} "
            "has no non-null first row"
        )
    dim = len(row[0])
    with _lock:
        _put(key, dim)
    return dim


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
        _put(key, banded)
        return banded


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted co-purchase edge list ``(p1 < p2, n_orders)`` of the
    lineitem table at ``sf_dir``, computed at most once per session.

    Three declared graph queries (``graph_copurchase_pairs``,
    ``graph_degree_distribution``, ``graph_triangle_count``) derive from
    this SAME edge list — before r15 each re-ran the basket build
    (collect_set per order + double explode + pair aggregate, two full
    exchanges of the fact rows) from the parquet scan, and the triangle
    query's three-way self-join re-derived it once per broadcast hop.
    The warehouse-scale analog: the edge list is a materialized graph
    table (~1.2M 24-byte rows at sf0.1 — far smaller than the fact table
    it derives from), built once and consumed by every graph analytic,
    exactly like the banded sketch above. Consumers filter/threshold the
    cached frame; results are bit-identical to rebuilding per query
    (the edge list is a pure function of lineitem)."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.sources.tables import load

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "copurchase_edges",
    )
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            return cached
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        baskets = li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("parts")
        )
        pairs = (
            baskets.select(F.explode("parts").alias("p1"), "parts")
            .select("p1", F.explode("parts").alias("p2"))
            .filter(F.col("p1") < F.col("p2"))
        )
        edges = (
            pairs.groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .persist()
        )
        _put(key, edges)
        return edges


def copurchase_strong_edges(
    spark: SparkSession, sf_dir: str, *, threshold: int = 2
) -> DataFrame:
    """The thresholded (``n_orders >= threshold``) slice of
    :func:`copurchase_edges`, persisted separately: ~3.6k of the 1.2M
    edge rows at sf0.1. ``graph_degree_distribution`` scans it twice
    (both union branches) and ``graph_triangle_count`` three times (all
    self-join hops) — each scan of the small persisted slice reads 3.6k
    rows instead of filtering the full 1.2M-row edge cache again."""
    from pyspark.sql import functions as F

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "copurchase_strong",
        threshold,
    )
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            return cached
    # build outside the lock: copurchase_edges takes _lock itself
    base = copurchase_edges(spark, sf_dir)
    # coalesce(1): ~3.6k rows across 32 cache partitions would otherwise
    # hand every downstream stage 32 near-empty tasks — pure scheduling
    # overhead at any scale (guide §2.2: fewer, larger map tasks). One
    # partition holds the whole slice comfortably; consumers' shuffles
    # stay AQE-coalesced.
    strong = (
        base.filter(F.col("n_orders") >= threshold)
        .select("p1", "p2")
        .coalesce(1)
        .persist()
    )
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            strong.unpersist()
            return cached
        _put(key, strong)
    return strong


def substring_spans_cached(
    spark: SparkSession, sf_dir: str, *, k: int = 5
) -> DataFrame:
    """The persisted ExactSubstr duplicate-span table of ``documents`` —
    ``(doc_id, span_start, span_end, n_grams)`` per maximal cross-document
    duplicated word span (operators/dedup.substring_spans), computed at
    most once per session + corpus (r15).

    Two declared queries consume the IDENTICAL operator output:
    ``dedup_substring_spans`` (the detection half — emits the spans frame
    itself) and ``pipeline_substring_cut`` (the cut half — feeds the same
    spans into ``cut_spans``). Before r15 each re-ran the whole gram
    explode -> dup-gram inventory agg -> semi-join -> interval-merge
    pipeline from the parquet scan. The spans table is tiny next to the
    corpus it derives from (one row per duplicated span, bounded by hits,
    not grams), which is exactly the warehouse-scale shape: ExactSubstr
    span detection is materialized once per corpus snapshot and both the
    audit surface and the cut pipeline read the materialization."""
    from multiomix_aws_emr_spark.operators.dedup import substring_spans
    from multiomix_aws_emr_spark.sources.tables import load

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "substrspans",
        k,
    )
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            return cached
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        spans = substring_spans(
            d, id_col="doc_id", text_col="text", k=k
        ).persist()
        _put(key, spans)
        return spans


def minhash_band_index(
    spark: SparkSession, sf_dir: str, *, split_mod: int = 4
) -> tuple[DataFrame, str]:
    """The PERSISTED MinHash band index of the historical corpus slice —
    ``(band, bucket, rep)`` parquet, written once per session + corpus and
    read back for every consumer. Returns ``(df, path)``.

    The historical slice is ``doc_id % split_mod != 0`` (the fixture
    stand-in for "everything ingested before this batch"; the complement
    is the new batch). Building the index reads and shingles the OLD
    slice exactly once — afterwards ``dedup_incremental_minhash`` plans
    touch only this parquet plus the new batch, never the old text again
    (asserted by tests/test_incremental_dedup.py). On a real rolling
    corpus this table lives in the warehouse, bucketed on (band, bucket),
    and each ingest run upserts into it via
    ``operators.dedup.upsert_band_index`` (the maintenance_merge_upsert
    write pattern).
    """
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.operators.dedup import band_index

    import threading

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "bandindex",
        split_mod,
    )
    # Double-checked publish with a per-key building sentinel (ADVICE
    # r11): the index parquet WRITE is a full Spark job over the
    # historical slice, so it must run OUTSIDE ``_lock`` — holding the
    # module lock for its duration would block every other sketch-cache
    # consumer (banded_documents, fivegram_hashes) behind one build.
    with _lock:
        cached = _cache.get(key)
        if isinstance(cached, threading.Event):
            ev, builder = cached, False
        elif cached is not None:
            return cached
        else:
            ev, builder = threading.Event(), True
            _cache[key] = ev
    if not builder:
        ev.wait()
        with _lock:
            cached = _cache.get(key)
        if isinstance(cached, tuple):
            return cached
        # the builder failed and cleared the sentinel: try building
        return minhash_band_index(spark, sf_dir, split_mod=split_mod)
    try:
        # Derive the historical slice's banded rows from the
        # SESSION-SHARED full-corpus sketch (above) rather than
        # re-shingling the slice: a banded row is a function of its
        # document's own text only, so the slice's sketch is exactly a
        # filter of the corpus sketch. Six declared queries now share one
        # shingle->signature->band pass. (banded_documents takes _lock
        # itself briefly — fine: this thread holds no lock here.)
        banded = banded_documents(spark, sf_dir, portable=True)
        idx = band_index(
            banded.filter(F.col("doc_id") % split_mod != 0), id_col="doc_id"
        )
        path = index_scratch_dir(spark, "minhash_band_index")
        idx.write.mode("overwrite").parquet(path)
        entry = (spark.read.parquet(path), path)
    except BaseException:
        with _lock:
            if _cache.get(key) is ev:
                del _cache[key]
        ev.set()  # wake waiters so they can retry (or fail) themselves
        raise
    with _lock:
        _put(key, entry)
    ev.set()
    return entry


def ivf_centroid_index(
    spark: SparkSession, sf_dir: str, *, n_lists: int = 8, split_mod: int = 4
) -> tuple[DataFrame, str]:
    """The PERSISTED coarse-quantizer index of the historical embeddings
    slice — ``(list_id, cent array<double>)`` parquet, ``n_lists`` tiny
    rows, written once per session + corpus and read back by every
    incremental assignment. Returns ``(df, path)``.

    The similarity-surface analog of ``minhash_band_index``: the
    historical slice (``vec_id % split_mod != 0``) is read exactly once
    to train the quantizer
    (operators/similarity.hash_group_centroids — deterministic so the
    oracle can recompute it; production swaps in ``kmeans_centroids``
    with the identical downstream shape); afterwards every new embedding
    batch quantizes against THIS parquet without touching historical
    vectors. Same double-checked sentinel as the band index (the parquet
    write is a Spark job and must not hold the module lock)."""
    import threading

    from pyspark.sql import functions as F

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "ivfcentroids",
        n_lists,
        split_mod,
    )
    with _lock:
        cached = _cache.get(key)
        if isinstance(cached, threading.Event):
            ev, builder = cached, False
        elif cached is not None:
            return cached
        else:
            ev, builder = threading.Event(), True
            _cache[key] = ev
    if not builder:
        ev.wait()
        with _lock:
            cached = _cache.get(key)
        if isinstance(cached, tuple):
            return cached
        return ivf_centroid_index(
            spark, sf_dir, n_lists=n_lists, split_mod=split_mod
        )
    try:
        from multiomix_aws_emr_spark.operators.similarity import (
            hash_group_centroids,
        )
        from multiomix_aws_emr_spark.sources.tables import load

        hist = load(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % split_mod != 0
        )
        # group on (vec_id >> 2) % n_lists — ORTHOGONAL to the % split_mod
        # train/ingest split, so every list trains on history rows (plain
        # vec_id % 8 would leave lists {0,4} empty: those residues are
        # exactly the held-out batch)
        cents = hash_group_centroids(
            hist,
            id_col="vec_id",
            vec_col="embedding",
            n_lists=n_lists,
            group_expr=F.pmod(F.shiftright(F.col("vec_id"), 2), F.lit(n_lists)),
        )
        path = index_scratch_dir(spark, "ivf_centroid_index")
        cents.write.mode("overwrite").parquet(path)
        entry = (spark.read.parquet(path), path)
    except BaseException:
        with _lock:
            if _cache.get(key) is ev:
                del _cache[key]
        ev.set()
        raise
    with _lock:
        _put(key, entry)
    ev.set()
    return entry


def two_batch_store(spark: SparkSession, sf_dir: str) -> str:
    """The session-shared TWO-BATCH transactional dedup store: the corpus
    ingested as version 1 (= the ``doc_id % 4 != 0`` history slice) then
    version 2 (= the incoming complement) through
    ``operators/ingest.ingest_batch``, built AT MOST ONCE per
    (session, corpus). Returns the store root.

    Two declared queries are pure committed-state readers of it:
    ``pipeline_incremental_ingest`` (the incoming batch's assignments)
    and ``dedup_store_time_travel`` (the index as of v1). Sharing the
    build is semantically free — the store's commit protocol is
    replay-idempotent, so "ingest if absent, else read the committed
    rows" is exactly ``ingest_batch``'s own contract — and it halves the
    staged writes the ingest family costs per suite run. Both batch
    sketches are filtered slices of the session-shared corpus sketch
    (subset-invariant per-doc rows), so no extra shingle pass either.

    Same double-checked sentinel as ``minhash_band_index``: the build is
    several Spark jobs (staged parquet writes) and must not hold the
    module lock."""
    import threading

    from pyspark.sql import functions as F

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        "twobatchstore",
    )
    with _lock:
        cached = _cache.get(key)
        if isinstance(cached, threading.Event):
            ev, builder = cached, False
        elif cached is not None:
            return cached
        else:
            ev, builder = threading.Event(), True
            _cache[key] = ev
    if not builder:
        ev.wait()
        with _lock:
            cached = _cache.get(key)
        if isinstance(cached, str):
            return cached
        return two_batch_store(spark, sf_dir)
    try:
        from multiomix_aws_emr_spark.operators.ingest import ingest_batch
        from multiomix_aws_emr_spark.session import shared_scratch_dir
        from multiomix_aws_emr_spark.sources.tables import load

        root = shared_scratch_dir(
            spark,
            "dedup_store_shared",
            env_var="SPARK_GRAFT_DEDUP_STORE_DIR",
            what="transactional dedup store (POSIX-shared path)",
        )
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        sketch = banded_documents(spark, sf_dir, portable=True)
        for batch_id, pred in (
            ("history", F.col("doc_id") % 4 != 0),
            ("incoming", F.col("doc_id") % 4 == 0),
        ):
            ingest_batch(
                spark,
                root,
                docs.filter(pred),
                batch_id=batch_id,
                banded=sketch.filter(pred),
            )
    except BaseException:
        with _lock:
            if _cache.get(key) is ev:
                del _cache[key]
        ev.set()
        raise
    with _lock:
        _put(key, root)
    ev.set()
    return root


def index_scratch_dir(spark: SparkSession, prefix: str) -> str:
    """A parquet-index location every node of the session's topology can
    REACH AND WRITE: index part files are written by EXECUTORS and read
    back by the driver's next plan, so a driver-local temp path silently
    loses partitions on a multi-node master — the same mislocation class
    ``streaming.util.stream_checkpoint_dir`` guards state stores against
    (both delegate to ``session.shared_scratch_dir``). Durable root env:
    ``SPARK_GRAFT_INDEX_DIR``.

    Lifecycle (the stream_checkpoint_dir analog, ADVICE r11): the index
    parquet must OUTLIVE the build call — the session's cached plans read
    it for the rest of the session — so unlike a bounded stream's
    checkpoint there is no delete-on-success point; it dies with the
    scratch. Local-master runs land in a driver tempdir (the OS tmp
    sweeper's to expire); a durable ``SPARK_GRAFT_INDEX_DIR`` root
    accumulates one small dir per (session, corpus) and its owner should
    attach a TTL/janitor policy to the prefix, exactly like the
    streaming-checkpoint root. Long-lived CROSS-SESSION indexes belong in
    the transactional dedup store instead (operators/ingest.py — versioned
    + manifest-committed, with ``sweep_orphans`` as the janitor)."""
    from multiomix_aws_emr_spark.session import shared_scratch_dir

    return shared_scratch_dir(
        spark,
        prefix,
        env_var="SPARK_GRAFT_INDEX_DIR",
        what="persisted-index parquet",
    )


def fivegram_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (doc_id, s) 5-gram-hash table of ``documents`` —
    the decontamination probe index shared by ``text_decontaminate`` and
    ``pipeline_curation_v2`` (identical xxhash64-of-concat expression in
    both), computed and persisted at most once per session + corpus.
    Like the banded sketch, each row is a function of its own document
    only, so consumers restrict by filter/semi-join exactly."""
    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.sources.tables import load, scan_parallel

    key = (spark.sparkContext.applicationId, os.path.realpath(sf_dir), "5gram")
    with _lock:
        cached = _cache.get(key)
        if cached is not None:
            return cached
        d = scan_parallel(load(spark, sf_dir, "documents"))
        # Row-local build (r15): the gram hash is a pure function of one
        # document, so the whole (doc_id, s) set is computable as a
        # projection — per-doc hashes via ``transform(sequence) -> slice``
        # over the filtered word array, per-doc dedup via array_distinct,
        # one explode. The previous shape (repartition by doc_id ->
        # posexplode -> 4x lead window -> dropDuplicates) paid one full
        # exchange of the corpus plus a per-partition sort for the same
        # rows; this one computes and dedups grams inside the scan stage
        # (guide §2.4 — the only exchange left is scan_parallel's
        # conditional small-fixture spread, a no-op at production input
        # widths). Hash equivalence: xxhash64(concat_ws(' ', tok, lead1..4))
        # == xxhash64(array_join(slice(w, i, 5), ' ')) — identical string,
        # identical seed. Docs with < 5 non-empty words emit nothing in
        # both shapes (lead4 null there / size guard here).
        w = F.filter(F.split("text", " "), lambda x: x != "")
        sh = (
            d.select("doc_id", w.alias("w"))
            .filter(F.size("w") >= 5)
            .select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size("w") - 4),
                            lambda i: F.xxhash64(
                                F.array_join(F.slice("w", i, 5), " ")
                            ),
                        )
                    )
                ).alias("s"),
            )
            .persist()
        )
        _put(key, sh)
        return sh
