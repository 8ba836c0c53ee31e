"""Similarity search + near-dup detection over the embeddings/documents
tables (north-star surface; ref analog: the Euclidean event-horizon test,
`scripts/metaheuristics.py:683-694`, R16).

Scale design: the oracle-checked queries below restrict the query side
(vec_id < 10 / vec_id = 0) so the brute-force plan is a broadcast of the
tiny query side against a single pass over the corpus — O(corpus) with no
shuffle. The all-pairs problem at 100 TB is NEVER a cross join: see
operators/similarity.py (LSH bucketing) and operators/dedup.py
(MinHash-LSH) for the banded paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.functions.vector import cosine, l2_norm, to_double_array
from multiomix_aws_emr_spark.queries.registry import fact_bytes, query
from multiomix_aws_emr_spark.sources.tables import load, scan_parallel

_PAIRWISE_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), n AS (
  SELECT vec_id, emb,
         SQRT(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM e
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       -- +0 canonicalizes -0.0 (Spark's round yields +0.0, DuckDB's -0.0)
       ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 5) + 0 AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE a.vec_id < 10
"""


@query("similarity_pairwise", oracle=_PAIRWISE_ORACLE)
def similarity_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity: 10 query vectors x corpus, a < b. The query side
    is broadcast; norms are computed once per side before the join."""
    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    withn = e.select("vec_id", "emb", l2_norm("emb").alias("nrm"))
    a = withn.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("id_a"),
        F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = withn.select(
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dotp = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        b.join(F.broadcast(a), F.col("id_a") < F.col("id_b"), "inner")
        .select(
            "id_a",
            "id_b",
            F.round(dotp / (F.col("nrm_a") * F.col("nrm_b")), 5).alias("cos_sim"),
        )
    )


_TOPK_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), n AS (
  SELECT vec_id, emb,
         SQRT(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM e
), sims AS (
  SELECT b.vec_id AS id_b,
         ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) + 0 AS cos_sim
  FROM n a JOIN n b ON b.vec_id <> 0
  WHERE a.vec_id = 0
)
SELECT id_b, cos_sim FROM (
  SELECT id_b, cos_sim,
         ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id_b) AS rn
  FROM sims) t
WHERE rn <= 5
"""


@query("similarity_topk", oracle=_TOPK_ORACLE)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k neighbors of one query vector: broadcast the query,
    one corpus pass, TakeOrderedAndProject for the top-5 (no global sort)."""
    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("emb_q"), l2_norm("emb").alias("nrm_q")
    )
    corpus = e.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("id_b"), "emb", l2_norm("emb").alias("nrm_b")
    )
    dotp = F.aggregate(
        F.zip_with("emb", "emb_q", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = corpus.crossJoin(F.broadcast(q)).select(
        "id_b", F.round(dotp / (F.col("nrm_b") * F.col("nrm_q")), 6).alias("cos_sim")
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("id_b").asc()).limit(5).select(
        "id_b", "cos_sim"
    )


def _minhash_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import minhash_onestep_sql

    return minhash_onestep_sql()


@query(
    "dedup_near_minhash",
    oracle=_minhash_oracle(),
    # Rule-2 sizing hint: the widest exchange is the shingle->signature
    # aggregation, whose rows replicate each token into ~shingle_words
    # shingles (fanout 3). At every measured volume (incl. the 1000x docs
    # synth, 444 MB) the estimate floors to the session baseline — which
    # is also the MEASURED optimum (r8: raising this shape's count cost
    # 1.2x; its post-sketch-cache exchanges carry small per-partition
    # state). The hint only engages at true corpus volume (TB-scale
    # text), where the shingle exchange must be split to fit task memory.
    sizing_hint=fact_bytes("documents", fanout=3.0),
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup clustering over documents (north star).

    Output: (doc_id, rep_id) — every doc mapped to the smallest doc_id it
    shares an LSH band-bucket with (itself when unique), so the result is
    total over the corpus. See operators/dedup.py for the implementation.
    Uses the portable 60-bit signature hash so the DuckDB oracle
    (queries/minhash_oracle.py) recomputes the exact signatures, band
    buckets, and rep assignment — full hash-checked parity for an LSH
    sketch pipeline. ``portable=False`` gives the same plan on xxhash64.

    The banded sketch comes from the session-scoped cache
    (plans/sketchcache.py): four declared queries share this exact
    sub-plan, and it is computed once per session + corpus.
    """
    from multiomix_aws_emr_spark.operators.dedup import lsh_cluster_assign
    from multiomix_aws_emr_spark.plans.sketchcache import banded_documents

    banded = banded_documents(spark, sf_dir, portable=True)
    return lsh_cluster_assign(banded, id_col="doc_id")


def _minhash_incremental_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_incremental_sql,
    )

    return minhash_incremental_sql(split_mod=4)


@query("dedup_incremental_minhash", oracle=_minhash_incremental_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run near-dedup: assign a NEW ingest batch against the
    PERSISTED MinHash band index, never re-shingling the historical
    corpus — the operator a rolling 100 TB corpus runs on every ingest.

    Fixture framing: "history" is ``doc_id % 4 != 0`` and the new batch
    is the complement. The history slice exists only as its parquet band
    index (plans/sketchcache.minhash_band_index — (band, bucket, rep),
    one ~25-byte row per occupied bucket, built once per session); the
    incremental plan reads THAT plus the new batch: batch shingle ->
    signature -> bands, index semi-restricted to the batch's buckets,
    bucket-reps merged, one equi-join back
    (operators/dedup.incremental_assign). Output (doc_id, rep_id) is
    bit-identical to recomputing the one-step assignment over old∪new —
    the DuckDB oracle does exactly that recomputation from raw text, so
    the parity check proves the index path loses nothing. After assign,
    ``operators.dedup.upsert_band_index`` merges the batch into the
    index (min-merge: idempotent, retry-safe) — the
    maintenance_merge_upsert write pattern; equivalence to a from-scratch
    rebuild is asserted in tests/test_incremental_dedup.py.

    The batch's banded rows come from the session-shared corpus sketch
    (plans/sketchcache.banded_documents) restricted to the batch slice —
    per-doc sketches are subset-invariant, so the filtered rows are
    bit-identical to re-shingling the batch (r15; the same reuse
    ``pipeline_incremental_ingest`` already rides through its
    precomputed-sketch hook). The production analog: the ingest pipeline
    materializes the batch sketch once and every consumer (assign, index
    upsert, membership) reads the materialization instead of re-running
    shingle->signature->band per consumer.
    """
    from multiomix_aws_emr_spark.operators.dedup import incremental_assign
    from multiomix_aws_emr_spark.plans.sketchcache import (
        banded_documents,
        minhash_band_index,
    )

    index, _path = minhash_band_index(spark, sf_dir, split_mod=4)
    new_banded = banded_documents(spark, sf_dir, portable=True).filter(
        F.col("doc_id") % 4 == 0
    )
    return incremental_assign(new_banded, index, id_col="doc_id")


@query(
    "pipeline_incremental_ingest",
    oracle=_minhash_incremental_oracle(),
    # Same widest exchange as dedup_near_minhash (the shingle->signature
    # aggregation inside each ingest's sketch build — the store's writes
    # run EAGERLY inside the query call, under the conf this hint sets);
    # same fanout, same fixture-floor behavior.
    sizing_hint=fact_bytes("documents", fanout=3.0),
)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSACTIONAL rolling-ingest pipeline end-to-end (VERDICT r11
    task 3): a fresh dedup store ingests the corpus as two batches through
    ``operators/ingest.ingest_batch`` — each ingest stages the batch
    sketch, the rep assignments, and the upserted index + membership
    versions, then COMMITS them as one atomic manifest publish (the
    sink_python_datasource two-phase pattern); a crash anywhere leaves
    the previous committed version readable and a re-run converges
    (kill-probed in tests/test_ingest_txn.py). Emits the second batch's
    committed ``(doc_id, rep_id)`` assignments, which must be
    bit-identical to the non-transactional index path — the oracle is
    the same from-raw-text recomputation ``dedup_incremental_minhash``
    is checked against, so the transaction machinery is proven to change
    durability, not results. Both batch sketches are FILTERED SLICES of
    the session-shared corpus sketch (per-doc sketches are
    subset-invariant — the seventh consumer of the one
    shingle->signature->band pass), passed through ``ingest_batch``'s
    precomputed-sketch hook; the transaction still stages each slice to
    parquet. The store itself is session-shared with
    ``dedup_store_time_travel`` (plans/sketchcache.two_batch_store) —
    "ingest if absent, else read the committed rows" IS ``ingest_batch``'s
    replay contract, so sharing the build changes cost, not semantics."""
    from multiomix_aws_emr_spark.operators.ingest import read_assignments
    from multiomix_aws_emr_spark.plans.sketchcache import two_batch_store

    root = two_batch_store(spark, sf_dir)
    return read_assignments(spark, root, "incoming")


def _minhash_retract_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_onestep_ctes,
    )

    return (
        f"WITH {minhash_onestep_ctes()} "
        "SELECT band, bucket, CAST(MIN(doc_id) AS BIGINT) AS rep "
        "FROM banded WHERE doc_id % 16 <> 1 GROUP BY band, bucket"
    )


@query("dedup_retract_index", oracle=_minhash_retract_oracle())
def dedup_retract_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten over the persisted dedup index: delete the
    ``doc_id % 16 == 1`` documents (the fixture stand-in for a deletion/
    recrawl request — some ARE bucket reps) and emit the retracted
    ``(band, bucket, rep)`` index. The compact index alone cannot forget
    (rep = bucket min; min-merge is insert-only), so the operator
    re-elects reps for the TOUCHED buckets from the surviving MEMBERSHIP
    rows and drops emptied buckets — touching only membership rows of
    affected buckets, never the corpus text
    (operators/dedup.retract_from_band_index; broadcast victim set;
    plan-asserted shuffle-free over bucketed tables in
    tests/test_incremental_dedup.py). The oracle recomputes the index
    over the surviving corpus from raw text, so parity proves retraction
    equals a from-scratch rebuild. Membership and index both derive from
    the session-shared corpus sketch here (subset-invariant per-doc
    rows)."""
    from multiomix_aws_emr_spark.operators.dedup import (
        band_index,
        retract_from_band_index,
    )
    from multiomix_aws_emr_spark.plans.sketchcache import banded_documents

    sketch = banded_documents(spark, sf_dir, portable=True)
    membership = sketch.select("band", "bucket", "doc_id")
    index = band_index(sketch, id_col="doc_id")
    victims = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 16 == 1)
        .select("doc_id")
    )
    new_index, _membership = retract_from_band_index(
        index, membership, victims, id_col="doc_id"
    )
    return new_index


@query(
    "stream_incremental_ingest",
    oracle=_minhash_oracle(),
    # The per-micro-batch sketch build is the same shingle exchange; the
    # hint sizes the session conf the foreachBatch ingests run under —
    # they execute as ordinary batch jobs, and the runner deliberately
    # applies no state-partition override (stateless passthrough stream).
    sizing_hint=fact_bytes("documents", fanout=3.0),
)
def stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS transactional dedup ingest: documents arrive as a
    bounded file STREAM and every micro-batch commits one atomic
    ``ingest_batch`` through ``foreachBatch``, keyed by the streaming
    batch id (streaming/ingest.py). Exactly-once composes from the
    offset log (replays carry the same batch id) + the store's
    replay-idempotent commit — the same two-halves argument as
    ``stream_rollup_upsert``, with crash-restart and late-arrival
    continuation kill-tested in tests/test_ingest_txn.py. Emits every
    committed ``(doc_id, rep_id)`` assignment; the fixture's single-file
    layout streams as one micro-batch against an empty index, so the
    result equals the one-step corpus assignment — the same oracle as
    ``dedup_near_minhash``, which pins that streaming arrival changes
    durability and pacing, not results."""
    from multiomix_aws_emr_spark.session import shared_scratch_dir
    from multiomix_aws_emr_spark.streaming.ingest import run_stream_ingest
    from multiomix_aws_emr_spark.streaming.util import static_and_stream

    root = shared_scratch_dir(
        spark,
        "dedup_store_stream",
        env_var="SPARK_GRAFT_DEDUP_STORE_DIR",
        what="transactional dedup store (POSIX-shared path)",
    )
    _static, stream, _n_state = static_and_stream(
        spark, sf_dir, "documents.parquet"
    )
    return run_stream_ingest(
        spark, root, stream, id_col="doc_id", text_col="text", portable=True
    )


def _minhash_version_diff_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_onestep_ctes,
    )

    return (
        f"WITH {minhash_onestep_ctes()}, "
        "old_idx AS (SELECT band, bucket, CAST(MIN(doc_id) AS BIGINT) AS rep "
        "FROM banded WHERE doc_id % 4 <> 0 GROUP BY band, bucket), "
        "new_idx AS (SELECT band, bucket, CAST(MIN(doc_id) AS BIGINT) AS rep "
        "FROM banded GROUP BY band, bucket) "
        "SELECT COALESCE(o.band, n.band) AS band, "
        "COALESCE(o.bucket, n.bucket) AS bucket, "
        "o.rep AS rep_from, n.rep AS rep_to, "
        "CASE WHEN o.rep IS NULL THEN 'added' "
        "WHEN n.rep IS NULL THEN 'removed' "
        "ELSE 'rep_changed' END AS change "
        "FROM old_idx o FULL OUTER JOIN new_idx n "
        "ON o.band = n.band AND o.bucket = n.bucket "
        "WHERE o.rep IS NULL OR n.rep IS NULL OR o.rep <> n.rep"
    )


@query(
    "dedup_store_version_diff",
    oracle=_minhash_version_diff_oracle(),
    # First store consumer in a session pays the shared two-batch build,
    # whose widest exchange is the shingle aggregation — same hint as the
    # rest of the ingest family so build sizing is order-independent.
    sizing_hint=fact_bytes("documents", fanout=3.0),
)
def dedup_store_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff over the store's version chain: which dedup decisions
    did the incoming ingest flip — one ``(band, bucket, rep_from, rep_to,
    change)`` row per bucket the v1→v2 transition ``added`` or whose rep
    it ``rep_changed`` (``removed`` appears only across retraction
    versions). The audit primitive of a versioned store: incident review
    ("why did these docs merge yesterday"), change-data capture for
    downstream consumers of dedup decisions, and regression checks after
    a recrawl all read this diff instead of replaying ingests. Cost is a
    full-outer join of two compact bucket tables
    (``operators/ingest.diff_versions``) — no corpus text, shuffle-light
    under the store's bucketed layout; the oracle recomputes both
    snapshots' indexes from raw text and diffs them in SQL."""
    from multiomix_aws_emr_spark.operators.ingest import diff_versions
    from multiomix_aws_emr_spark.plans.sketchcache import two_batch_store

    root = two_batch_store(spark, sf_dir)
    return diff_versions(spark, root, 1, 2)


def _minhash_history_index_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_onestep_ctes,
    )

    return (
        f"WITH {minhash_onestep_ctes()} "
        "SELECT band, bucket, CAST(MIN(doc_id) AS BIGINT) AS rep "
        "FROM banded WHERE doc_id % 4 <> 0 GROUP BY band, bucket"
    )


@query(
    "dedup_store_time_travel",
    oracle=_minhash_history_index_oracle(),
    # Same widest exchange as pipeline_incremental_ingest (the two
    # ingests' staging writes run eagerly inside the call).
    sizing_hint=fact_bytes("documents", fanout=3.0),
)
def dedup_store_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reads over the dedup store's version chain (time travel):
    ingest the corpus as two committed versions (v1 = history slice,
    v2 = the incoming batch) and read the index AS OF v1 — the emitted
    ``(band, bucket, rep)`` rows must be exactly the band index over the
    history slice alone, bit-identical to what a reader saw before v2
    committed (the oracle recomputes that index from the history slice's
    raw text). Snapshot isolation falls out of the store's immutability
    protocol for free: every version's index/membership dirs are
    writer-unique and never rewritten, and the append-only manifest chain
    (``operators/ingest.manifest_at``) names them forever — so an audit,
    a reproducible-training run, or a what-changed diff pins a version
    number instead of racing the ingest pipeline, exactly Delta/Iceberg
    snapshot semantics. How much history keeps its DATA is the vacuum's
    retention window (``sweep_orphans(retain_versions=K)``): inside the
    window time travel is a manifest lookup + one parquet scan; past it
    the read fails loudly, never silently serving a newer snapshot
    (tests/test_ingest_txn.py::test_time_travel_reads_and_vacuum_retention).
    The store is session-shared with ``pipeline_incremental_ingest``
    (plans/sketchcache.two_batch_store): snapshot reads never conflict
    with other readers of the same committed chain, which is the point
    of the immutability protocol."""
    from multiomix_aws_emr_spark.operators.ingest import read_index
    from multiomix_aws_emr_spark.plans.sketchcache import two_batch_store

    root = two_batch_store(spark, sf_dir)
    return read_index(spark, root, version=1)


_IVF_INCREMENTAL_ORACLE = """
WITH hist AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id % 4 <> 0
), dims AS (
  SELECT (vec_id // 4) % 8 AS list_id,
         generate_subscripts(emb, 1) AS pos,
         UNNEST(emb) AS val
  FROM hist
), cent_dims AS (
  SELECT list_id, pos, AVG(val) AS m FROM dims GROUP BY 1, 2
), cents AS (
  SELECT list_id, list(m ORDER BY pos) AS cent FROM cent_dims GROUP BY list_id
), newv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id % 4 = 0
), dists AS (
  SELECT n.vec_id, c.list_id,
         list_sum(list_transform(list_zip(n.emb, c.cent),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
  FROM newv n CROSS JOIN cents c
)
SELECT vec_id, CAST(list_id AS INTEGER) AS list_id, ROUND(d2, 6) + 0 AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d2, list_id) AS rn FROM dists)
WHERE rn = 1
"""


@query("similarity_ivf_incremental", oracle=_IVF_INCREMENTAL_ORACLE)
def similarity_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN ingest: quantize a NEW embedding batch against the
    PERSISTED coarse-quantizer index without touching historical vectors —
    the similarity-surface twin of ``dedup_incremental_minhash``. The
    quantizer (8 centroids over the ``vec_id % 4 != 0`` history slice)
    lives as a tiny parquet built once per session
    (plans/sketchcache.ivf_centroid_index); the incoming batch
    (``vec_id % 4 == 0``) runs ONE map-only pass — the centroid matrix
    rides an Arrow-vectorized pandas UDF closure (BLAS matmul per batch,
    ``operators/similarity.assign_to_centroids``), so there is no join,
    no shuffle, and no history read (plan-asserted: one scan, zero
    Exchange, in tests/test_incremental_dedup.py). Emits
    ``(vec_id, list_id, dist2)`` —
    nearest list by squared L2 with lower-id tie-break. At 100 TB this
    is how every new embedding shard lands in its inverted list; the
    deterministic hash-group quantizer keeps the oracle exact
    (recomputing every centroid coordinate from raw floats), and
    production swaps in ``kmeans_centroids`` with the identical
    downstream shape."""
    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        centroid_matrix,
    )
    from multiomix_aws_emr_spark.plans.sketchcache import ivf_centroid_index

    cents_df, _path = ivf_centroid_index(spark, sf_dir)
    # row position == list_id by construction (ValueError on a gap —
    # never a stripped assert silently misaligning argmin row positions)
    cmat = centroid_matrix(cents_df.collect())
    batch = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    return assign_to_centroids(
        batch, cmat, id_col="vec_id", vec_col="embedding"
    )


_SEMANTIC_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), dims AS (
  SELECT vec_id % 8 AS list_id,
         generate_subscripts(emb, 1) AS pos,
         UNNEST(emb) AS val
  FROM e
), cent_dims AS (
  SELECT list_id, pos, AVG(val) AS m FROM dims GROUP BY 1, 2
), cents AS (
  SELECT list_id, list(m ORDER BY pos) AS cent FROM cent_dims GROUP BY list_id
), dists AS (
  SELECT v.vec_id, c.list_id,
         list_sum(list_transform(list_zip(v.emb, c.cent),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2
  FROM e v CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, list_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY d2, list_id) AS rn FROM dists)
  WHERE rn = 1
), m AS (
  SELECT a.vec_id, a.list_id, e.emb,
         SQRT(list_sum(list_transform(e.emb, x -> x * x))) AS nrm
  FROM assigned a JOIN e USING (vec_id)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 5) >= 0.35
)
SELECT vec_id, CAST(list_id AS INTEGER) AS list_id
FROM assigned WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


@query("dedup_semantic", oracle=_SEMANTIC_ORACLE)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then remove
    near-duplicates ONLY within each cluster — the quadratic pairwise
    step is CLUSTER-BOUNDED, which is the whole scale argument (with
    k ∝ sqrt(N) clusters the pair work is ~N·(N/k) instead of N², and
    each cluster's pairs shuffle-join on its own key). Emits the
    surviving ``(vec_id, list_id)``: a vector is dropped iff a
    lower-id member of ITS cluster matches at cosine >= 0.35 (the
    fixture's near-orthogonal corpus; production uses ~0.95 like the
    paper).

    Pipeline: deterministic hash-group quantizer over the FULL corpus
    (the same oracle-exact stand-in ``similarity_ivf`` uses — production
    swaps in ``kmeans_centroids``, identical downstream shape) ->
    map-only argmin assignment (Arrow pandas UDF, centroid matrix in the
    closure, no shuffle) -> the CAPPED within-cluster prune
    (``operators/similarity.semantic_survivors``): a groupBy +
    applyInPandas where each cluster's pairwise cosine block is tiled
    BLAS bounded at ``max_cluster x tile`` doubles, and a cluster over
    the cap is deterministically re-split on a secondary hash first —
    so one boilerplate mega-cluster can never hand a single task an
    m x m matrix (the r12 verdict's skew finding; fixture clusters are
    far below the cap, so the capped form is bit-identical to the
    uncapped rule and the oracle is unchanged). A join-based twin
    (self-join on list_id + anti-join) was measured 10x slower at
    sf0.1: per-pair ``zip_with``/``aggregate`` cosines run in the
    interpreted HOF path, while the matmul stays in BLAS. The oracle
    recomputes every centroid coordinate, every assignment, and every
    within-cluster pair from raw floats; cosines round to 5 decimals on
    both engines before the threshold compare (the family's
    float-parity convention)."""
    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        centroid_matrix,
        hash_group_centroids,
        semantic_survivors,
    )

    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    cents = hash_group_centroids(
        e, id_col="vec_id", vec_col="emb", n_lists=8
    )
    cmat = centroid_matrix(cents.collect())
    # emb rides the assignment Project in the JVM (keep=, r15) — the
    # former join-back of (vec_id, list_id) onto e cost two exchanges
    # and a second evaluation of the e subtree for identical rows
    m = assign_to_centroids(
        e, cmat, id_col="vec_id", vec_col="emb", keep=["emb"]
    ).select("vec_id", "list_id", "emb")
    return semantic_survivors(
        m, id_col="vec_id", vec_col="emb", threshold=0.35
    ).select("vec_id", F.col("list_id").cast("int").alias("list_id"))


_ANN_ORACLE_TMPL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), n AS (
  SELECT vec_id, emb,
         SQRT(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM e
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS id_b,
         ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) + 0 AS cos_sim
  FROM n a JOIN n b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN ({ids})
)
SELECT query_id, id_b, cos_sim, CAST(rn AS INTEGER) AS rn, TRUE AS recall_ok
FROM (
  SELECT query_id, id_b, cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, id_b) AS rn
  FROM sims) t
WHERE rn <= {k}
"""


@query("similarity_ann_lsh", oracle=_ANN_ORACLE_TMPL.format(ids="0", k=5))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH bucketing: candidates only
    within matching sign-buckets, exact cosine re-rank inside buckets.
    The 100 TB scale path for similarity_topk (accuracy tested against
    brute force in tests/test_operators.py).

    Oracle-checked via the exact+bound pattern (the agg_approx_quantiles
    precedent): the emitted rows are the EXACT brute-force top-k — which
    the DuckDB twin recomputes verbatim, pinning the cosine math and
    tie-break order — plus a ``recall_ok`` boolean asserting the LSH
    tier reached recall@5 >= 0.6 against that ground truth (seeded
    hyperplanes make the approximate side deterministic; measured 0.8 at
    every fixture SF). A broken bucketing flips the boolean and breaks
    the hash. Config note: the fixture embeddings are ISOTROPIC — no
    planted neighbor structure, top-5 cosines ~0.3 — the worst case for
    LSH, so this query probes generously (4 planes, hamming<=2); corpora
    with real cluster structure run deeper signatures with fewer probes.
    Production ships ann_lsh_topk alone; the exact twin here is the
    verification harness."""
    from multiomix_aws_emr_spark.operators.similarity import (
        ann_lsh_topk,
        exact_topk,
        exact_with_recall_ok,
    )
    from multiomix_aws_emr_spark.plans.sketchcache import embedding_dim

    e = scan_parallel(load(spark, sf_dir, "embeddings"))
    approx = ann_lsh_topk(
        e,
        id_col="vec_id",
        vec_col="embedding",
        query_ids=[0],
        k=5,
        n_planes=4,
        probe_hamming=2,
        # session-cached 1-row probe (plans/sketchcache.embedding_dim,
        # r15) — without it every build of this query re-ran the probe
        # job that ann_lsh_topk's dim=None fallback performs
        dim=embedding_dim(spark, sf_dir),
    )
    exact = exact_topk(e, id_col="vec_id", vec_col="embedding", query_ids=[0], k=5)
    return exact_with_recall_ok(approx, exact, 5, floor=0.6)


_FUZZY_ORACLE = """
WITH b AS (
  SELECT c_custkey, c_name, substr(c_name, 1, 15) AS blk FROM customer
)
SELECT a.c_custkey AS id_a, bb.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, bb.c_name) AS INTEGER) AS dist
FROM b a JOIN b bb ON a.blk = bb.blk AND a.c_custkey < bb.c_custkey
WHERE levenshtein(a.c_name, bb.c_name) <= 1
"""


@query("dedup_entity_fuzzy", oracle=_FUZZY_ORACLE)
def dedup_entity_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy matching, with DELETION-
    NEIGHBORHOOD candidate generation: for equal-length strings,
    levenshtein <= 1 is exactly hamming <= 1, so a matching pair must
    agree on (any) 2 of the 3 free character positions after the shared
    15-char block prefix. Three tight equi-joins — key = (block, two
    fixed positions) — generate candidates, union + dedup, and one
    levenshtein call per surviving candidate verifies. Versus the naive
    within-block pairing this cuts candidates from O(block^2) to near
    the true match count (measured 42s -> ~2s at sf0.1 on the same
    result), and every join stays hash-partitionable. The oracle states
    the simple quadratic contract; parity proves the neighborhood
    rewrite loses nothing."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.substring("c_name", 1, 15).alias("blk"),
        F.substring("c_name", 16, 1).alias("p1"),
        F.substring("c_name", 17, 1).alias("p2"),
        F.substring("c_name", 18, 1).alias("p3"),
    )
    keysets = [("p1", "p2"), ("p1", "p3"), ("p2", "p3")]
    cand = None
    for k1, k2 in keysets:
        a = c.select(
            F.col("c_custkey").alias("id_a"),
            F.col("c_name").alias("name_a"),
            F.col("blk").alias("jb"),
            F.col(k1).alias("j1"),
            F.col(k2).alias("j2"),
        )
        b = c.select(
            F.col("c_custkey").alias("id_b"),
            F.col("c_name").alias("name_b"),
            F.col("blk").alias("jb"),
            F.col(k1).alias("j1"),
            F.col(k2).alias("j2"),
        )
        j = a.join(b, ["jb", "j1", "j2"]).filter(F.col("id_a") < F.col("id_b"))
        p = j.select("id_a", "id_b", "name_a", "name_b")
        cand = p if cand is None else cand.unionByName(p)
    uniq = cand.dropDuplicates(["id_a", "id_b"])
    dist = F.levenshtein("name_a", "name_b")
    return uniq.select("id_a", "id_b", dist.cast("int").alias("dist")).filter(
        F.col("dist") <= 1
    )


_CONTAINMENT_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS ws
  FROM t WHERE len(w) >= 2
)
SELECT id_a, id_b, containment FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(len(list_intersect(a.ws, b.ws)) /
               CAST(len(a.ws) AS DOUBLE), 5) AS containment
  FROM s a JOIN s b ON a.doc_id <> b.doc_id
  WHERE a.doc_id < 20
) WHERE containment >= 0.8
"""


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: |A ∩ B| / |A| >= 0.8 for query docs
    A (doc_id < 20) against the whole corpus — catches SUBSET duplicates
    (a doc quoted or wrapped inside a larger one) that symmetric Jaccard
    misses: a 100-shingle doc fully contained in a 10,000-shingle page
    has Jaccard ~0.01 but containment 1.0. The asymmetric measure is the
    published boilerplate/quote-inclusion dedup signal MinHash cannot
    estimate directly (it sketches the union, not |A|).

    Scale shape: identical to dedup_ngram_jaccard — inverted shingle
    index, tiny query side BROADCAST so the corpus never shuffles for the
    probe, pairs with zero shared shingles never materialize, and the
    denominator |A| rides the broadcast rows (no second corpus pass)."""
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.functions.ngrams import bigram_rows

    d = load(spark, sf_dir, "documents")
    n_parts = max(
        spark.sparkContext.defaultParallelism, d.rdd.getNumPartitions()
    )
    big = bigram_rows(d.repartition(n_parts, "doc_id"))
    sh = big.select("doc_id", F.xxhash64("bg").alias("s")).dropDuplicates(
        ["doc_id", "s"]
    )
    shn = sh.select(
        "doc_id",
        "s",
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    a = shn.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("id_a"), "s", F.col("n_sh").alias("n_a")
    )
    b = shn.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
    shared = (
        b.join(
            F.broadcast(a),
            (a.s == F.col("s_b")) & (F.col("id_a") != F.col("id_b")),
        )
        .groupBy("id_a", "id_b", "n_a")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    c = F.round(F.col("shared") / F.col("n_a").cast("double"), 5)
    return shared.select("id_a", "id_b", c.alias("containment")).filter(
        F.col("containment") >= 0.8
    )
