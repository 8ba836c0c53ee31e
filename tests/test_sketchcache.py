"""plans/sketchcache: session-scoped reuse of shared sub-plans.

Correctness of the CONSUMERS is covered by the oracle-parity suite
(dedup_near_minhash, dedup_minhash_components, pipeline_curation,
pipeline_curation_v2, text_decontaminate); this file pins the cache
contract itself: memoization per (session, corpus, params), persistence,
and exact equivalence of subset-restriction vs direct computation.
"""

from pyspark.sql import functions as F

from multiomix_aws_emr_spark.plans.sketchcache import (
    banded_documents,
    fivegram_hashes,
)


def test_banded_documents_memoized_and_persisted(spark, sf_dir):
    a = banded_documents(spark, sf_dir, portable=True)
    b = banded_documents(spark, sf_dir, portable=True)
    assert a is b  # one sketch per (session, corpus, params)
    assert a.storageLevel.useMemory
    # different params -> different cache entry
    c = banded_documents(spark, sf_dir, portable=True, bands=2, num_hashes=16)
    assert c is not a


def test_subset_restriction_equals_direct_computation(spark, sf_dir):
    """Semi-joining the corpus sketch to a doc subset must equal running
    the full pipeline on the subset — the per-document property that
    makes the sketch shareable."""
    from multiomix_aws_emr_spark.operators.dedup import (
        banded_buckets,
        lsh_cluster_assign,
    )
    from multiomix_aws_emr_spark.sources.tables import load

    d = load(spark, sf_dir, "documents")
    subset = d.filter(F.col("doc_id") % 3 == 0)

    direct = lsh_cluster_assign(
        banded_buckets(subset, text_col="text", id_col="doc_id", portable=True),
        id_col="doc_id",
    )
    shared = lsh_cluster_assign(
        banded_documents(spark, sf_dir, portable=True).join(
            subset.select("doc_id"), "doc_id", "left_semi"
        ),
        id_col="doc_id",
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, shared.collect())
    )


def test_fivegram_hashes_memoized_and_distinct(spark, sf_dir):
    a = fivegram_hashes(spark, sf_dir)
    assert fivegram_hashes(spark, sf_dir) is a
    assert a.storageLevel.useMemory
    assert a.columns == ["doc_id", "s"]
    # distinct per (doc_id, s) by construction
    assert a.count() == a.dropDuplicates(["doc_id", "s"]).count()


def test_put_evicts_other_sessions_entries():
    """Entries keyed to a different applicationId are evicted on insert,
    so a multi-session process never accumulates dead plan handles."""
    from multiomix_aws_emr_spark.plans import sketchcache as sc

    with sc._lock:
        saved = dict(sc._cache)
        sc._cache.clear()
        try:
            sc._put(("app-old", "corpus", 1), "df_old")
            sc._put(("app-old", "corpus", 2), "df_old2")
            sc._put(("app-new", "corpus", 1), "df_new")
            assert set(sc._cache) == {("app-new", "corpus", 1)}
            sc._put(("app-new", "corpus", 2), "df_new2")
            assert len(sc._cache) == 2
        finally:
            sc._cache.clear()
            sc._cache.update(saved)


def test_band_index_concurrent_callers_share_one_build(spark, sf_dir):
    """ADVICE r11: the index parquet write runs OUTSIDE the module lock
    (a per-key building sentinel), so concurrent consumers neither block
    each other's unrelated cache hits nor double-build: N threads racing
    minhash_band_index get the SAME persisted path, and another
    sketch-cache consumer (banded_documents) completes while the build
    is in flight."""
    import threading

    from multiomix_aws_emr_spark.plans import sketchcache as sc
    from multiomix_aws_emr_spark.plans.sketchcache import (
        banded_documents,
        minhash_band_index,
    )

    # evict any committed entry for this key so the race actually builds
    key_tail = ("bandindex", 7)
    with sc._lock:
        for k in [k for k in sc._cache if k[2:] == key_tail]:
            del sc._cache[k]

    paths, others, errs = [], [], []

    def _build():
        try:
            _, p = minhash_band_index(spark, sf_dir, split_mod=7)
            paths.append(p)
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    def _other_consumer():
        try:
            others.append(banded_documents(spark, sf_dir).count())
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=_build) for _ in range(3)] + [
        threading.Thread(target=_other_consumer)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert len(set(paths)) == 1 and len(paths) == 3
    assert others and others[0] > 0


def test_two_batch_store_shared_and_single_build(spark, sf_dir):
    """The ingest-family readers share ONE committed store per session:
    concurrent callers get the same root (single build via the sentinel),
    and both declared consumers read that one store — the incoming
    assignments and the as-of-v1 index come from the same manifest
    chain."""
    import threading

    from multiomix_aws_emr_spark.operators.ingest import latest_manifest
    from multiomix_aws_emr_spark.plans import sketchcache as sc
    from multiomix_aws_emr_spark.plans.sketchcache import two_batch_store

    with sc._lock:
        for k in [k for k in sc._cache if k[-1] == "twobatchstore"]:
            del sc._cache[k]

    roots, errs = [], []

    def _build():
        try:
            roots.append(two_batch_store(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=_build) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert len(set(roots)) == 1 and len(roots) == 3
    ver, m = latest_manifest(roots[0])
    assert ver == 2 and set(m["batches"]) == {"history", "incoming"}
    # repeat call is a pure cache hit
    assert two_batch_store(spark, sf_dir) == roots[0]


def test_copurchase_edges_memoized_and_exact(spark, sf_dir):
    """The shared co-purchase edge cache (r15): memoized per session,
    persisted, and bit-identical to deriving the edge list directly from
    lineitem; the thresholded slice equals filtering the full cache and
    is single-partition (scheduling-overhead guard for its tiny size)."""
    from multiomix_aws_emr_spark.plans.sketchcache import (
        copurchase_edges,
        copurchase_strong_edges,
    )
    from multiomix_aws_emr_spark.sources.tables import load

    a = copurchase_edges(spark, sf_dir)
    b = copurchase_edges(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    direct = (
        baskets.select(F.explode("parts").alias("p1"), "parts")
        .select("p1", F.explode("parts").alias("p2"))
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, direct.collect())
    )

    strong = copurchase_strong_edges(spark, sf_dir)
    assert strong is copurchase_strong_edges(spark, sf_dir)
    assert strong.rdd.getNumPartitions() == 1
    expect = sorted(
        map(
            tuple,
            a.filter(F.col("n_orders") >= 2).select("p1", "p2").collect(),
        )
    )
    assert sorted(map(tuple, strong.collect())) == expect


def test_embedding_dim_probed_once_and_correct(spark, sf_dir):
    """The dim probe returns the real vector dimensionality and memoizes
    per (session, corpus, table, col) — the second call must be a pure
    dict hit (r15: ann query builds stop re-running the 1-row job)."""
    from multiomix_aws_emr_spark.plans import sketchcache
    from multiomix_aws_emr_spark.plans.sketchcache import embedding_dim
    from multiomix_aws_emr_spark.sources.tables import load

    d1 = embedding_dim(spark, sf_dir)
    expected = len(
        load(spark, sf_dir, "embeddings").select("embedding").first()[0]
    )
    assert d1 == expected
    key = next(
        k for k in sketchcache._cache if len(k) > 2 and k[2] == "embdim"
    )
    sketchcache._cache[key] = d1 + 1000  # detectable sentinel
    try:
        assert embedding_dim(spark, sf_dir) == d1 + 1000  # cache hit
    finally:
        sketchcache._cache[key] = d1
