"""Incremental cross-run MinHash dedup (VERDICT r10 task 4): a new ingest
batch is assigned against the PERSISTED band index — the old corpus is
never re-read — and the index upsert equals a from-scratch rebuild."""

import pytest
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.dedup import (
    band_index,
    banded_buckets,
    incremental_assign,
    lsh_cluster_assign,
    upsert_band_index,
)
from multiomix_aws_emr_spark.plans.sketchcache import minhash_band_index
from multiomix_aws_emr_spark.queries import QUERIES
from multiomix_aws_emr_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text")


def _full_banded(docs):
    return banded_buckets(
        docs, text_col="text", id_col="doc_id", portable=True
    )


def test_incremental_matches_full_recompute(spark, docs):
    """The index path must emit, for the new batch, exactly what a
    from-scratch one-step assignment over old∪new emits."""
    full = lsh_cluster_assign(_full_banded(docs), id_col="doc_id")
    expected = {
        (r.doc_id, r.rep_id)
        for r in full.filter(F.col("doc_id") % 4 == 0).collect()
    }
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    idx = band_index(_full_banded(old), id_col="doc_id")
    got = incremental_assign(
        _full_banded(new), idx, id_col="doc_id"
    ).collect()
    assert {(r.doc_id, r.rep_id) for r in got} == expected
    assert len(got) == len(expected)  # total over the batch, one row each


def test_old_corpus_read_only_via_index(spark, sf_dir):
    """The declared query's physical plan never re-shingles history: it
    reads history as the band-index parquet and the batch slice from the
    session-shared corpus sketch (r15) — the only documents.parquet
    references allowed are inside the cached sketch's own printed
    lineage, never a fresh scan in the query tree itself."""
    _idx, idx_path = minhash_band_index(spark, sf_dir, split_mod=4)
    df = QUERIES["dedup_incremental_minhash"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    first_cached = plan.find("InMemoryRelation")
    fresh_scans = plan[: first_cached if first_cached >= 0 else len(plan)]
    assert "documents.parquet" not in fresh_scans, plan
    assert idx_path.strip("/").split("/")[-1] in plan, plan
    assert df.count() > 0


def test_index_build_cached_per_session(spark, sf_dir):
    a = minhash_band_index(spark, sf_dir, split_mod=4)
    b = minhash_band_index(spark, sf_dir, split_mod=4)
    assert a[1] == b[1]  # same persisted path, no rebuild


def test_upsert_equals_rebuild_and_is_idempotent(spark, docs):
    """Min-merge maintenance: upserting the new batch into the old index
    yields the full-corpus index; re-upserting the same batch is a
    no-op (retry safety)."""
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    idx_old = band_index(_full_banded(old), id_col="doc_id")
    new_banded = _full_banded(new)
    merged = upsert_band_index(idx_old, new_banded, id_col="doc_id")
    rebuilt = band_index(_full_banded(docs), id_col="doc_id")
    as_set = lambda df: {  # noqa: E731
        (r.band, r.bucket, r.rep) for r in df.collect()
    }
    merged_set = as_set(merged)
    assert merged_set == as_set(rebuilt)
    again = upsert_band_index(merged, new_banded, id_col="doc_id")
    assert as_set(again) == merged_set


def test_bucketed_index_joins_colocated(spark, docs):
    """The warehouse-scale claim in incremental_assign's docstring, made
    real: with the index stored as a table bucketed+sorted on
    (band, bucket), the ingest join reads it in place — the index-side
    subtree of the SortMergeJoin has NO Exchange (and no Sort: sortBy
    pre-sorted the buckets); only the small batch side realigns to the
    bucket count. Broadcast is disabled to force the SMJ the real
    (non-broadcastable) corpus-scale index would take."""
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    idx = band_index(_full_banded(old), id_col="doc_id")
    spark.sql("DROP TABLE IF EXISTS idx_bkt_test")
    idx.write.bucketBy(8, "band", "bucket").sortBy("band", "bucket").mode(
        "overwrite"
    ).saveAsTable("idx_bkt_test")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assign = incremental_assign(
            _full_banded(new), spark.table("idx_bkt_test"), id_col="doc_id"
        )
        plan = assign._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # the index scan is the join's RIGHT subtree, printed after every
        # batch-side (left, ':'-prefixed) line — so every Exchange in the
        # tree must precede it: nothing shuffles the index
        tail_after_last_exchange = plan[plan.rindex("Exchange"):]
        assert "Bucketed: true" in tail_after_last_exchange
        got = {(r.doc_id, r.rep_id) for r in assign.collect()}
        plain = incremental_assign(_full_banded(new), idx, id_col="doc_id")
        assert got == {(r.doc_id, r.rep_id) for r in plain.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS idx_bkt_test")


def test_rolling_ingest_four_batches(spark, docs):
    """The rolling-corpus lifecycle end-to-end: start from an empty
    index, ingest the corpus as four sequential batches (assign against
    the index-so-far, then upsert the batch in), and assert the FINAL
    index equals a from-scratch build over everything. Also pins the
    order-sensitivity contract: a doc's assignment reflects only what
    was ingested up to its own batch, so earlier batches may assign a
    doc to itself even though a later dup arrives — the index upsert
    (min-merge) is what carries the corpus-wide truth forward."""
    schema = "band INT, bucket STRING, rep BIGINT"
    index = spark.createDataFrame([], schema)
    seen_assignments = {}
    for b in range(4):
        batch = docs.filter(F.col("doc_id") % 4 == b)
        nb = _full_banded(batch)
        for r in incremental_assign(nb, index, id_col="doc_id").collect():
            seen_assignments[r.doc_id] = r.rep_id
        index = upsert_band_index(index, nb, id_col="doc_id")
    rebuilt = band_index(_full_banded(docs), id_col="doc_id")
    final = {(r.band, r.bucket, r.rep) for r in index.collect()}
    assert final == {(r.band, r.bucket, r.rep) for r in rebuilt.collect()}
    # every doc got assigned exactly once, and each rep precedes-or-is
    # its doc in ingest order (a rep is always already-ingested)
    n_docs = docs.count()
    assert len(seen_assignments) == n_docs
    for doc_id, rep in seen_assignments.items():
        assert rep == doc_id or (rep % 4) <= (doc_id % 4)


def test_index_scratch_dir_master_aware(spark, monkeypatch):
    """Index parquet provisioning mirrors the streaming-checkpoint
    posture: env root wins (unique URI subdir), local masters get a temp
    dir, non-local masters without a root refuse loudly (index part
    files are executor-written)."""
    import os

    from multiomix_aws_emr_spark.plans.sketchcache import index_scratch_dir

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", "s3a://bucket/indexes/")
    a = index_scratch_dir(spark, "ix")
    b = index_scratch_dir(spark, "ix")
    assert a.startswith("s3a://bucket/indexes/ix_") and a != b

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DIR")
    d = index_scratch_dir(spark, "ix")
    assert os.path.isdir(d)

    class _SC:
        master = "k8s://https://fleet:6443"

    class _S:
        sparkContext = _SC()

    with pytest.raises(RuntimeError, match="SPARK_GRAFT_INDEX_DIR"):
        index_scratch_dir(_S(), "ix")


def test_empty_batch_yields_empty_assignment(spark, docs):
    old_idx = band_index(_full_banded(docs), id_col="doc_id")
    empty = docs.filter(F.lit(False))
    got = incremental_assign(
        _full_banded(empty), old_idx, id_col="doc_id"
    )
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["doc_id", "rep_id"]


def test_bucketed_membership_retraction_shuffle_free(spark, docs):
    """The retraction cost-model claim (SURVEY r12), made real: with the
    MEMBERSHIP table stored bucketed+sorted on (band, bucket) and the
    retract-id set tiny (broadcast), the rep re-election plan moves NO
    membership rows across the cluster — the only shuffle-shaped
    operators are broadcast exchanges of the id set and the touched
    bucket list. Every groupBy lands on the bucketed distribution."""
    from multiomix_aws_emr_spark.operators.dedup import (
        retract_from_band_index,
    )

    banded = _full_banded(docs)
    idx = band_index(banded, id_col="doc_id")
    spark.sql("DROP TABLE IF EXISTS member_bkt_test")
    spark.sql("DROP TABLE IF EXISTS idx_bkt_retract_test")
    banded.select("band", "bucket", "doc_id").write.bucketBy(
        8, "band", "bucket"
    ).sortBy("band", "bucket").mode("overwrite").saveAsTable("member_bkt_test")
    idx.write.bucketBy(8, "band", "bucket").sortBy("band", "bucket").mode(
        "overwrite"
    ).saveAsTable("idx_bkt_retract_test")
    membership = spark.table("member_bkt_test")
    # retract ids arrive as external input in production — materialize
    # them so the plan under test is the retraction alone
    victim_ids = [r.rep for r in idx.limit(5).collect()]
    victims = spark.createDataFrame([(v,) for v in victim_ids], "doc_id BIGINT")
    # Pin bucketed scans on: at FIXTURE sizes the auto-bucketed-scan
    # heuristic drops the bucketed read as not worth its task layout
    # (the exchange it avoids is tiny here, huge at corpus scale) — the
    # same pin-the-real-shape move as the sibling test's broadcast
    # threshold.
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_auto = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try:
        new_idx, new_membership = retract_from_band_index(
            spark.table("idx_bkt_retract_test"),
            membership,
            victims,
            id_col="doc_id",
        )
        plan = new_idx._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # correctness alongside the plan shape
        surviving = docs.join(victims, "doc_id", "left_anti")
        expect = band_index(_full_banded(surviving), id_col="doc_id")
        assert {(r.band, r.bucket, r.rep) for r in new_idx.collect()} == {
            (r.band, r.bucket, r.rep) for r in expect.collect()
        }
    finally:
        spark.conf.set(auto, old_auto)
        spark.sql("DROP TABLE IF EXISTS member_bkt_test")
        spark.sql("DROP TABLE IF EXISTS idx_bkt_retract_test")


def test_skew_safe_assign_matches_window_path(spark, docs):
    """The groupBy-based skew-safe assign (for materialized sketches with
    task-memory-exceeding hot buckets) emits exactly what the default
    window-min path emits."""
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    idx = band_index(_full_banded(old), id_col="doc_id")
    nb = _full_banded(new)
    default = {
        (r.doc_id, r.rep_id)
        for r in incremental_assign(nb, idx, id_col="doc_id").collect()
    }
    safe = {
        (r.doc_id, r.rep_id)
        for r in incremental_assign(
            nb, idx, id_col="doc_id", skew_safe=True
        ).collect()
    }
    assert safe == default and len(safe) == new.count()


def test_ivf_incremental_map_only_and_correct(spark, sf_dir):
    """The similarity twin of the incremental-dedup plan shape: the
    declared query's physical plan scans embeddings ONCE (the new batch),
    contains NO shuffle (map-only quantization — centroids ride the UDF
    closure), and its assignment matches a NumPy recomputation from the
    persisted centroids."""
    import numpy as np

    from multiomix_aws_emr_spark.plans.sketchcache import ivf_centroid_index
    from multiomix_aws_emr_spark.sources.tables import load

    df = QUERIES["similarity_ivf_incremental"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("embeddings.parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan

    cents_df, path = ivf_centroid_index(spark, sf_dir)
    rows = sorted(cents_df.collect(), key=lambda r: r.list_id)
    assert [r.list_id for r in rows] == list(range(8))  # all lists trained
    cmat = np.array([r.cent for r in rows], dtype=np.float64)
    got = {r.vec_id: (r.list_id, r.dist2) for r in df.collect()}
    batch = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings")
        .filter("vec_id % 4 = 0")
        .collect()
    }
    assert set(got) == set(batch)
    for vid, v in batch.items():
        d2 = ((v[None, :] - cmat) ** 2).sum(axis=1)
        best = int(d2.argmin())
        assert got[vid][0] == best
        assert abs(got[vid][1] - round(float(d2[best]), 6)) < 1e-9

    # session-cached: second call returns the same persisted path
    assert ivf_centroid_index(spark, sf_dir)[1] == path


def test_kmeans_quantizer_swap_in_identical_contract(spark, sf_dir, tmp_path):
    """VERDICT r12 task 5: the 'production swaps in kmeans_centroids'
    claim, test-backed. Train the MLlib spherical k-means quantizer on
    the SAME history slice the declared query's hash-group quantizer
    uses, persist it in the same (list_id, cent) parquet shape, and run
    the SAME assign_to_centroids batch pass. The downstream contract
    must be identical: schema, map-only plan (single scan, zero
    Exchange, Arrow UDF), and argmin-by-squared-L2 semantics (verified
    against a NumPy recomputation from the persisted kmeans centers —
    the assignment VALUES legitimately differ from the hash-group
    quantizer's, the CONTRACT must not)."""
    import numpy as np

    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        centroid_matrix,
        kmeans_centroids,
    )

    hist = (
        load(spark, sf_dir, "embeddings")
        .filter("vec_id % 4 != 0")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    cmat_trained = kmeans_centroids(hist, "emb", 8, seed=42)

    # persist + read back through the same parquet shape the session
    # cache uses — the production path trains once and reuses the file
    path = str(tmp_path / "kmeans_centroids")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cmat_trained)],
        "list_id int, cent array<double>",
    ).write.parquet(path)
    cmat = centroid_matrix(spark.read.parquet(path).collect())
    assert cmat.shape == cmat_trained.shape
    assert np.allclose(np.sort(cmat, axis=0), np.sort(cmat_trained, axis=0))

    batch = load(spark, sf_dir, "embeddings").filter("vec_id % 4 = 0")
    df = assign_to_centroids(batch, cmat, id_col="vec_id", vec_col="embedding")

    # identical schema to the declared hash-group-quantizer query
    declared = QUERIES["similarity_ivf_incremental"](spark, sf_dir)
    assert df.schema == declared.schema

    # identical plan shape: one scan, zero Exchange, Arrow-batched UDF
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("embeddings.parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan

    # identical argmin semantics against the trained centers
    got = {r.vec_id: (r.list_id, r.dist2) for r in df.collect()}
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in batch.collect()
    }
    assert set(got) == set(vecs)
    for vid, v in vecs.items():
        d2 = ((v[None, :] - cmat) ** 2).sum(axis=1)
        best = int(d2.argmin())
        assert got[vid][0] == best
        assert abs(got[vid][1] - round(float(d2[best]), 6)) < 1e-9
