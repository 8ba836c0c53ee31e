"""LLM training-data pipeline queries: n-gram Jaccard dedup, SimHash,
multimodal binary plumbing (north-star surface beyond SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import fact_bytes, query
from multiomix_aws_emr_spark.sources.tables import load, scan_parallel

_NGRAM_JACCARD_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS ws
  FROM t WHERE len(w) >= 2
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(len(list_intersect(a.ws, b.ws)) /
               CAST(len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))
                    AS DOUBLE), 5) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE a.doc_id < 20
) WHERE jaccard >= 0.5
"""


@query(
    "dedup_ngram_jaccard",
    oracle=_NGRAM_JACCARD_ORACLE,
    # Rule-2 hint, MEASURED fan-out (tools/fanout_probe.py at sf0.1): the
    # widest exchange is the doc_id repartition carrying the full text
    # ahead of the bigram explode — 1.43x the documents parquet bytes
    # (shuffle-lz4 vs parquet-zstd units, same proxy contract as
    # fact_bytes). 1.5 rounds up. Fixture SFs floor to baseline.
    sizing_hint=fact_bytes("documents", fanout=1.5),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-shingle Jaccard near-dup pairs (query side doc_id < 20,
    threshold 0.5).

    Scale shape: candidates come from an inverted shingle index (explode +
    equi-join on the shingle, count shared), NOT a cross join — pairs with
    zero shared shingles never materialize. jaccard = shared /
    (|A| + |B| - shared) from the per-doc distinct-shingle counts.
    """
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.functions.ngrams import bigram_rows

    d = load(spark, sf_dir, "documents")
    # Shingles via the shared bigram pipeline (functions/ngrams.py — one
    # place owns tokenization + adjacency for all five bigram consumers).
    # One shuffle clustered on doc_id serves tokenization parallelism,
    # shingle dedup (hash(doc_id) co-locates the (doc_id, shingle) agg),
    # and the per-doc shingle count (window over doc_id); the explicit
    # count stops AQE coalescing a bare repartition(key) to 1 partition
    # on small inputs.
    n_parts = max(
        spark.sparkContext.defaultParallelism, d.rdd.getNumPartitions()
    )
    big = bigram_rows(d.repartition(n_parts, "doc_id"))
    # 64-bit shingle hashes: compact join/dedup keys, collision odds
    # negligible at corpus scale.
    sh = big.select("doc_id", F.xxhash64("bg").alias("s")).dropDuplicates(
        ["doc_id", "s"]
    )
    shn = sh.select(
        "doc_id", "s", F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh")
    )
    # BROADCAST the tiny query side so the corpus side never shuffles for
    # the join — the inverted-index probe is a map-side hash join at any
    # corpus size.
    a = shn.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("id_a"), "s", F.col("n_sh").alias("n_a")
    )
    b = shn.select(
        F.col("doc_id").alias("id_b"),
        F.col("s").alias("s_b"),
        F.col("n_sh").alias("n_b"),
    )
    shared = (
        b.join(
            F.broadcast(a),
            (a.s == F.col("s_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    j = F.round(
        F.col("shared")
        / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
        5,
    )
    return shared.select("id_a", "id_b", j.alias("jaccard")).filter(
        F.col("jaccard") >= 0.5
    )


def _simhash60_oracle() -> str:
    """DuckDB SQL recomputing the portable 60-bit SimHash bit-for-bit:
    per-token md5-derived hash (functions/porthash.py), 60 per-bit vote
    sums, strict-majority fingerprint assembly, 4x15-bit band split."""
    from multiomix_aws_emr_spark.functions.porthash import phash60_sql

    votes = ", ".join(f"SUM((h >> {b}) & 1) AS c{b}" for b in range(60))
    fp = " + ".join(
        f"CASE WHEN 2*c{b} > n THEN {1 << b} ELSE 0 END" for b in range(60)
    )
    return f"""
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, {phash60_sql('tok')} AS h FROM t
), v AS (
  SELECT doc_id, COUNT(*) AS n, {votes} FROM h GROUP BY doc_id
), fp AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
)
SELECT doc_id, simhash, band,
       CAST((simhash >> (band * 15)) & 32767 AS BIGINT) AS bucket
FROM fp, unnest([0, 1, 2, 3]) AS u(band)
"""


@query(
    "dedup_simhash",
    oracle=_simhash60_oracle(),
    # Rule-2 hint, MEASURED fan-out (tools/fanout_probe.py at sf0.1): the
    # widest exchange is the per-token-hash -> 60-vote-sums partial
    # aggregate clustered on doc_id — 1.43x the documents parquet bytes
    # (the vote partials are wider than the text they summarize). 1.5
    # rounds up; fixture SFs floor to baseline.
    sizing_hint=fact_bytes("documents", fanout=1.5),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 60-bit SimHash fingerprint per document + its 4 LSH band
    buckets — all JVM-side (see operators/simhash.py). Total over the
    corpus; the DuckDB oracle recomputes every fingerprint bit-for-bit
    (votes + majority rule), so this is hash-checked, not rows-only.
    Production corpora that don't need cross-engine parity flip
    ``portable=False`` for the cheaper xxhash64 at the identical plan
    shape."""
    from multiomix_aws_emr_spark.operators.simhash import simhash, simhash_bands

    d = scan_parallel(load(spark, sf_dir, "documents"))
    sig = simhash(d, id_col="doc_id", text_col="text", portable=True)
    # carry the fingerprint through the band explode: one pipeline, no
    # self-join (the signature aggregate would otherwise run twice)
    return simhash_bands(
        sig, id_col="doc_id", carry=("simhash",), bits=60
    ).select("doc_id", "simhash", "band", "bucket")


@query(
    "multimodal_meta",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "'text/plain' AS mime FROM documents"
    ),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary payload column (multimodal plumbing):
    payload byte length must agree with DuckDB's octet_length(encode())."""
    from multiomix_aws_emr_spark.operators.multimodal import attach_binary_payload

    d = load(spark, sf_dir, "documents")
    media = attach_binary_payload(d, id_col="doc_id", text_col="text")
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
    )


_FEATURES_ORACLE = r"""
SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(length(regexp_replace(text, '[^\x60-\x6f]', '', 'g')) AS BIGINT)
         AS bucket6
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (16-bucket byte histogram of ``byte >> 4``; real codecs plug into
    operators/multimodal.decode_media).

    Oracle-checked: bucket 6 counts payload bytes in 0x60-0x6F, and in
    UTF-8 those byte values occur ONLY as the ASCII code points 0x60-0x6F
    (continuation bytes are 0x80+, lead bytes 0xC2+), so the DuckDB twin
    can recompute it as a character-class count over the text — exact for
    any UTF-8 content, not just ASCII fixtures."""
    from multiomix_aws_emr_spark.operators.multimodal import (
        attach_binary_payload,
        byte_histogram_features,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = attach_binary_payload(d, id_col="doc_id", text_col="text")
    feats = byte_histogram_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.element_at("features", 7).alias("bucket6")
    )


_QUANT_INT8_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), s AS (
  SELECT vec_id, emb,
         GREATEST(ABS(list_aggregate(emb, 'min')),
                  ABS(list_aggregate(emb, 'max'))) / 127.0 AS scale
  FROM e
)
SELECT vec_id, ROUND(scale, 7) AS q_scale,
       array_to_string(
         CASE WHEN scale > 0
              THEN list_transform(emb,
                                  x -> CAST(CAST(ROUND(x / scale) AS TINYINT)
                                            AS VARCHAR))
              ELSE list_transform(emb, x -> '0')
         END, ',') AS q
FROM s
"""


@query("embedding_quantize_int8", oracle=_QUANT_INT8_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    standard ANN-corpus compression step (FAISS SQ8): per-vector scale =
    max|x| / 127, elements rounded to [-127, 127] tinyints. 4x smaller
    than float32 at ~equal recall for IVF shortlists; at 100 TB the byte
    saving IS scan bandwidth and cache footprint for the similarity tier
    (similarity_ivf / ann_lsh rerank against the full-precision column
    only inside the shortlist).

    Scale shape: map-only — array_min/array_max/transform are per-row
    built-ins (whole-stage codegen, zero Python), no exchange anywhere;
    the plan is a parquet scan + project regardless of corpus size.
    Parity note: elements promote to double BEFORE the divide on both
    engines (the established float-parity pattern), and both round
    half-away-from-zero."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    amax = F.greatest(
        F.abs(F.array_min("emb")), F.abs(F.array_max("emb"))
    )
    s = e.select("vec_id", "emb", (amax / F.lit(127.0)).alias("scale"))
    quant = F.transform(
        "emb", lambda x: F.round(x / F.col("scale")).cast("tinyint")
    )
    zeros = F.transform("emb", lambda x: F.lit(0).cast("tinyint"))
    # the int8 array ships serialized (the oracle harness hashes scalar
    # cells); a production sink would keep the array<tinyint> column
    q = F.when(F.col("scale") > 0, quant).otherwise(zeros)
    return s.select(
        "vec_id",
        F.round("scale", 7).alias("q_scale"),
        F.array_join(
            F.transform(q, lambda x: x.cast("string")), ","
        ).alias("q"),
    )


_QUANT_PQ_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), u AS (
  SELECT vec_id, generate_subscripts(emb, 1) AS pos, UNNEST(emb) AS val
  FROM e
), c AS (
  SELECT vec_id % 16 AS k, pos, AVG(val) AS m FROM u GROUP BY 1, 2
), d AS (
  SELECT u.vec_id, (u.pos - 1) // 8 AS sub, c.k,
         SUM((u.val - c.m) * (u.val - c.m)) AS d2
  FROM u JOIN c ON u.pos = c.pos
  GROUP BY 1, 2, 3
), best AS (
  SELECT vec_id, sub, k
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d2, k) AS rn FROM d)
  WHERE rn = 1
)
SELECT vec_id, STRING_AGG(CAST(k AS VARCHAR), ',' ORDER BY sub) AS codes
FROM best GROUP BY vec_id
"""


@query("embedding_quantize_pq", oracle=_QUANT_PQ_ORACLE)
def embedding_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization of the embedding column (Jégou et al. 2011
    — the FAISS IVF-PQ compression path, the step beyond
    ``embedding_quantize_int8``): 8 subspaces of 8 dims, 16-row
    codebook per subspace, each vector encoded as 8 code indices —
    32 information bits per vector vs 256 float32 bytes (the full 32x
    is realized by ``pq_pack_codes``' bigint form; the string emitted
    here is the oracle-hashable surface, ~14x). The codebook
    is the deterministic hash-group quantizer (``vec_id % 16`` groups,
    oracle-exact; production trains k-means per subspace with the
    identical downstream shape — the ``centroid_matrix`` contract),
    sliced per subspace from ONE full-dim training pass.

    Scale shape: training is one explode + (group, dim)-key aggregate
    (map-side combinable, 16 x 64 rows after shuffle); encoding is
    MAP-ONLY — the (8, 16, 8) codebook rides the Arrow UDF closure,
    per-subspace BLAS distance matmuls, no join, no shuffle, no
    exchange at any corpus size (plan-asserted in
    tests/test_operators.py). The oracle recomputes every codebook
    coordinate, every subspace distance, and every argmin from raw
    floats; distances order un-rounded with ties to the lower code on
    both engines."""
    from multiomix_aws_emr_spark.operators.similarity import (
        centroid_matrix,
        hash_group_centroids,
        pq_encode,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cents = hash_group_centroids(e, id_col="vec_id", vec_col="emb", n_lists=16)
    cmat = centroid_matrix(cents.collect())
    return pq_encode(e, cmat, id_col="vec_id", vec_col="emb", n_sub=8)


_EMB_COS_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), n AS (
  SELECT vec_id, emb,
         SQRT(list_sum(list_transform(emb, x -> x * x))) AS nrm
  FROM e
)
SELECT id_a, id_b, cos_r FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 5) + 0 AS cos_r
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 100
) WHERE cos_r >= 0.35
"""


@query("dedup_embedding_cosine", oracle=_EMB_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: query side vec_id < 100 broadcast
    against one corpus pass, keep pairs with cosine >= 0.35 (the fixture's
    embeddings are near-orthogonal random vectors; a production corpus
    would use ~0.95).

    Scale shape: identical to similarity_pairwise — broadcast-restricted
    exact scoring. The unrestricted all-pairs form goes through the LSH
    bucketing in operators/similarity.py (similarity_ivf / ann_lsh), never
    a cross join.
    """
    from multiomix_aws_emr_spark.functions.vector import l2_norm, to_double_array

    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    withn = e.select("vec_id", "emb", l2_norm("emb").alias("nrm"))
    a = withn.filter(F.col("vec_id") < 100).select(
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
            F.round(dotp / (F.col("nrm_a") * F.col("nrm_b")), 5).alias("cos_r"),
        )
        .filter(F.col("cos_r") >= 0.35)
    )


def _ivf_oracle() -> str:
    # shared by similarity_ivf and similarity_ivfpq: both declare the
    # same exact-twin + recall-floor contract over queries {0, 1}, k=5,
    # so the oracle is one function, not a drifting copy
    from multiomix_aws_emr_spark.queries.similarity import _ANN_ORACLE_TMPL

    return _ANN_ORACLE_TMPL.format(ids="0, 1", k=5)


@query("similarity_ivf", oracle=_ivf_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: Voronoi-cell partition of the corpus under
    fitted spherical-k-means centroids, probe the n_probe nearest cells
    per query (operators/similarity.ivf_topk). The second ANN tier beside
    random-hyperplane LSH; recall vs brute force (and vs the untrained
    sample quantizer) is unit-tested.

    Oracle-checked via the exact+bound pattern (see similarity_ann_lsh):
    emitted rows are the exact brute-force top-5 for queries {0, 1} —
    recomputed verbatim by the DuckDB twin — plus a per-query
    ``recall_ok`` boolean asserting the IVF tier reached recall@5 >= 0.6
    against that ground truth. The declared contract uses the
    DETERMINISTIC ``sample`` quantizer (the n_centroids lowest-id
    vectors): MLlib k-means|| initialization samples per-PARTITION, so a
    trained quantizer is a function of the table's file layout, not just
    its rows — a 4-part directory copy of the same data fitted different
    centroids and flipped recall_ok (round-5 directory-layout parity
    sweep), and on isotropic fixtures the miss persists even probing 7 of
    8 cells, because a neighbor's cell rank under the QUERY is only
    weakly tied to where the neighbor itself is assigned. The sample
    quantizer passes the floor at every fixture SF, file layout, and
    10x/100x synthetic corpus (measured). The trained-quantizer path
    stays unit-tested (tests/test_operators.py compares kmeans vs sample
    recall); production ships ivf_topk with PRECOMPUTED centroids — train
    once offline, pass the array — and the exact twin is the verification
    harness. MLlib k-means itself is exercised by ml_kmeans_embeddings."""
    from multiomix_aws_emr_spark.operators.similarity import (
        exact_topk,
        exact_with_recall_ok,
        ivf_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    approx = ivf_topk(
        e,
        id_col="vec_id",
        vec_col="embedding",
        query_ids=[0, 1],
        k=5,
        n_centroids=8,
        n_probe=5,
        centroids="sample",
    )
    exact = exact_topk(
        e, id_col="vec_id", vec_col="embedding", query_ids=[0, 1], k=5
    )
    return exact_with_recall_ok(approx, exact, 5, floor=0.6)


@query("similarity_ivfpq", oracle=_ivf_oracle())
def similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FAISS-style IVF-PQ search promoted to a declared
    query (VERDICT r13 task 2): coarse quantize -> RESIDUAL product
    quantization (Jégou et al. 2011 §IV — codes describe
    ``x - coarse_centroid[cell]``, task 5's recall win wired in) ->
    probe the 6 nearest of 8 cells (an ``isin`` predicate that reaches
    PartitionFilters on a cell-partitioned codes table — plan-asserted
    in tests/test_semantic_dedup.py) -> ADC-score the probed codes with
    per-cell LUTs -> exact-cosine REFINE of the 192-row ADC shortlist
    (the FAISS IVFPQR shape: full-precision vectors are read only for
    the shortlist) -> top-5 per query.

    Oracle-checked via the family's exact+bound pattern
    (``similarity_ivf`` precedent): emitted rows are the exact
    brute-force top-5 for queries {0, 1} — recomputed verbatim by the
    DuckDB twin — plus a per-query ``recall_ok`` boolean asserting the
    IVF-PQ tier reached recall@5 >= 0.6 against that ground truth.
    Determinism: the coarse quantizer is the ``sample`` stand-in (8
    lowest-id vectors — the layout-stability rationale recorded on
    similarity_ivf), the PQ codebook is the hash-group quantizer over
    residuals (16 codebook rows x 16 subspaces of 4 dims), and every
    tie breaks to the lower id — measured recall 1.0 for both queries
    at sf0.001/0.01/0.1 (floor 0.6 is the contract, the headroom is
    deliberate: the isotropic fixture is PQ's worst case). Production
    swaps trained quantizers (``kmeans_centroids`` + per-subspace
    k-means) with the identical downstream shape, stores the codes
    table partitioned by cell and packed to int64
    (``pq_pack_codes``), and reuses this composition verbatim."""
    import numpy as np

    from multiomix_aws_emr_spark.operators.similarity import (
        assign_to_centroids,
        centroid_matrix,
        exact_topk,
        exact_with_recall_ok,
        hash_group_centroids,
        ivfpq_topk,
        pq_encode_residual,
    )

    from multiomix_aws_emr_spark.operators.checkpointing import (
        truncate_lineage,
    )

    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # ground-truth subtree OVERLAPPED with the PQ chain (r15, guide
    # §2.6): the exact full-corpus top-5 depends only on `e`, not on any
    # quantizer artifact, so its eager materialization runs on a driver
    # thread while the coarse-assign -> residual -> codebook -> encode
    # chain builds — the suite wall pays max(exact, chain), not the sum
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    _pool = ThreadPoolExecutor(max_workers=1)
    f_exact = _pool.submit(
        inheritable_thread_target(spark)(
            lambda: truncate_lineage(
                exact_topk(
                    e, id_col="vec_id", vec_col="emb", query_ids=[0, 1], k=5
                )
            )
        )
    )
    # deterministic sample coarse quantizer: the 8 lowest-id vectors
    # (one bounded collect — the query vectors 0/1 ride along when they
    # are among the 8 lowest, which every fixture satisfies)
    cent_rows = sorted(
        e.orderBy("vec_id").limit(8).collect(), key=lambda r: r.vec_id
    )
    cmat = np.array([r.emb for r in cent_rows], dtype=np.float64)
    qvecs = {r.vec_id: r.emb for r in cent_rows if r.vec_id in (0, 1)}
    for qid in (0, 1):
        if qid not in qvecs:  # sparse id domain: one extra bounded read
            qvecs[qid] = (
                e.filter(F.col("vec_id") == qid).collect()[0].emb
            )
    # emb rides the assignment Project via keep= (r15) — the former
    # join-back of (vec_id, list_id) onto e re-shuffled both sides by
    # vec_id and re-evaluated the e subtree for rows the Project
    # already held
    assigned = assign_to_centroids(
        e, cmat, id_col="vec_id", vec_col="emb", keep=["emb"]
    ).select("vec_id", "emb", "list_id")
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in cmat[i]]) for i in range(len(cmat))],
        "list_id int, cent array<double>",
    )
    # materialize the residual frame ONCE: the codebook-training collect,
    # the encode, and both per-query shortlist subtrees all reuse it —
    # without the cut, the final union's plan recomputes the assign UDF +
    # two joins per query side (measured 16 s -> 4 s at sf0.001). Only
    # (vec_id, list_id, res) is checkpointed: emb is re-derivable from
    # the scan and neither training nor encode needs it once res exists,
    # so the materialization is half the bytes (r14)
    res = truncate_lineage(
        assigned.join(F.broadcast(cdf), "list_id").select(
            "vec_id",
            "list_id",
            F.zip_with("emb", "cent", lambda x, y: x - y).alias("res"),
        )
    )
    pmat = centroid_matrix(
        hash_group_centroids(
            res, id_col="vec_id", vec_col="res", n_lists=16
        ).collect()
    )
    # encode from the PRE-SUBTRACTED residuals: a zero coarse matrix
    # makes pq_encode_residual's internal `x - coarse[cell]` the
    # identity, so the codes are bit-identical to encoding emb against
    # cmat — without re-reading emb into the checkpoint
    # NOTE (r14 negative result, BASELINE.md): swapping this fixture
    # composition onto the packed-codegen scorer (pq_pack_codes_wide +
    # ivfpq_topk_packed) was ~1.5 s SLOWER at sf0.1 — at 100k rows the
    # extra Janino classes (pack projection + two 16-term shift/mask
    # scorers) cost more than the Arrow boundary they remove; the packed
    # form's 2.2x-3.6x win starts at corpus scans (2M/20M probes). The
    # declared fixture query keeps the Arrow ADC; production scans use
    # the packed components.
    encoded = truncate_lineage(
        pq_encode_residual(
            res,
            np.zeros_like(cmat),
            pmat,
            id_col="vec_id",
            vec_col="res",
            cell_col="list_id",
            n_sub=16,
        )
    )
    from multiomix_aws_emr_spark.functions.vector import dot, l2_norm

    tops = []
    for qid in (0, 1):
        short = ivfpq_topk(
            encoded.filter(F.col("vec_id") != qid),
            cmat,
            pmat,
            qvecs[qid],
            id_col="vec_id",
            n_sub=16,
            k=192,
            n_probe=6,
            residual=True,
        ).select("vec_id")
        # exact-cosine refine of the shortlist: the query vector is a
        # LITERAL array (no one-row crossJoin, no window — the recall
        # join consumes only (query_id, id_b), so the refine just has
        # to RANK deterministically: cosine desc, id asc, TakeOrdered)
        qlit = F.array(*[F.lit(float(x)) for x in qvecs[qid]])
        refined = (
            e.join(short, "vec_id", "left_semi")
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col("vec_id").alias("id_b"),
                (
                    dot(F.col("emb"), qlit)
                    / (l2_norm("emb") * l2_norm(qlit))
                ).alias("_cos"),
            )
            .orderBy(F.col("_cos").desc(), F.col("id_b").asc())
            .limit(5)
        )
        tops.append(refined.select("query_id", "id_b"))
    # both sides are <= 10-row frames whose SUBTREES are expensive (two
    # ADC+refine chains / a full-corpus exact scan), and
    # exact_with_recall_ok references exact three times (hits semi-join,
    # denominator, output spine) and approx twice — cutting lineage here
    # evaluates each side ONCE (measured 4.4 s -> ~2.5 s for the final
    # stage at sf0.1; r14)
    approx = truncate_lineage(tops[0].unionByName(tops[1]))
    exact = f_exact.result()
    _pool.shutdown()
    return exact_with_recall_ok(approx, exact, 5, floor=0.6)


@query(
    "multimodal_resize",
    oracle=(
        "SELECT doc_id, LEAST(octet_length(encode(text)), 256) AS n_bytes_resized "
        "FROM documents"
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-shaped binary transform (decode -> resample -> re-encode
    stand-in) over Arrow-batched mapInPandas; the emitted size must agree
    with the SQL-computable contract (min(n_bytes, 256))."""
    from multiomix_aws_emr_spark.operators.multimodal import (
        attach_binary_payload,
        resize_media,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = attach_binary_payload(d, id_col="doc_id", text_col="text")
    return resize_media(media).select("doc_id", "n_bytes_resized")


_DECODE_ORACLE = """
SELECT d.doc_id,
       CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(SUM(CASE WHEN t.i % 3 = 0 THEN (d.doc_id * 31 + t.i) % 256 ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN t.i % 3 = 1 THEN (d.doc_id * 31 + t.i) % 256 ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN t.i % 3 = 2 THEN (d.doc_id * 31 + t.i) % 256 ELSE 0 END) AS BIGINT) AS sum_b
FROM documents d, range(0, 192) t(i)
GROUP BY d.doc_id
"""


@query("multimodal_decode", oracle=_DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE image decode through the codec registry: a deterministic
    8x8 PPM is rendered per document (pixel i of doc d = (d*31+i) % 256,
    operators/multimodal.synthesize_ppm_media), then
    ``decode_image_stats`` registry-decodes the P6 payload and emits
    per-channel pixel sums. The DuckDB oracle recomputes the same sums
    from the closed-form pixel values — so a decode bug (header parse,
    channel order, row layout) breaks the hash, not just a unit test."""
    from multiomix_aws_emr_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_ppm_media,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = synthesize_ppm_media(d, id_col="doc_id")
    return decode_image_stats(media)


_RESIZE_DECODE_ORACLE = """
SELECT d.doc_id,
       CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
       CAST(SUM((d.doc_id * 31 + ((t.i // 4) * 2 * 8 + (t.i % 4) * 2) * 3 + 0) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((d.doc_id * 31 + ((t.i // 4) * 2 * 8 + (t.i % 4) * 2) * 3 + 1) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((d.doc_id * 31 + ((t.i // 4) * 2 * 8 + (t.i % 4) * 2) * 3 + 2) % 256) AS BIGINT) AS sum_b
FROM documents d, range(0, 16) t(i)
GROUP BY d.doc_id
"""


@query("multimodal_resize_decode", oracle=_RESIZE_DECODE_ORACLE)
def multimodal_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end genuine media pipeline: render 8x8 PPM -> registry
    decode -> nearest-neighbor resample to 4x4 -> re-encode -> decode
    AGAIN -> per-channel sums. NN resize picks source pixel (2r, 2c), so
    output pixel (r, c, ch) of doc d is (d*31 + ((2r)*8 + 2c)*3 + ch) %
    256 — which is exactly what the oracle sums. Round-trips the encoder,
    the decoder, and the resampler through one cross-engine hash."""
    from multiomix_aws_emr_spark.operators.codecs import MIME_PPM
    from multiomix_aws_emr_spark.operators.multimodal import (
        decode_image_stats,
        resize_media,
        synthesize_ppm_media,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = synthesize_ppm_media(d, id_col="doc_id")
    resized = resize_media(media)
    meta = F.struct(
        F.octet_length("payload_resized").alias("n_bytes"),
        F.lit(MIME_PPM).alias("mime"),
        F.lit("ppm-p6").alias("codec"),
    )
    small = resized.select(
        "doc_id",
        F.col("payload_resized").alias("payload"),
        meta.alias("meta"),
    )
    return decode_image_stats(small)


_AUDIO_ORACLE = """
SELECT doc_id,
       CAST(256 AS INTEGER) AS n_samples,
       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
       CAST(MAX(s) AS BIGINT) AS max_amp,
       CAST(SUM(CASE WHEN i > 0 AND ((s >= 0) <> (sp >= 0)) THEN 1 ELSE 0 END)
            AS INTEGER) AS zero_crossings
FROM (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 17 + t.i * 7) % 2048) - 1024 AS s,
         ((d.doc_id * 17 + (t.i - 1) * 7) % 2048) - 1024 AS sp
  FROM documents d, range(0, 256) t(i)
)
GROUP BY doc_id
"""


@query("multimodal_audio_decode", oracle=_AUDIO_ORACLE)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE audio decode (second media modality): a deterministic
    256-sample mono PCM-16 WAV is rendered per document (sample i of doc
    d = ((d*17 + i*7) %% 2048) - 1024, operators/audio.py, stdlib
    ``wave``), then decoded for real — RIFF header parse and all — and
    reduced to integer features (sum|amp|, max, zero crossings). The
    DuckDB oracle recomputes the features from the closed-form samples,
    so encoder, decoder, and feature pass are all cross-engine hashed."""
    from multiomix_aws_emr_spark.operators.audio import (
        audio_decode_stats,
        synthesize_wav_media,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = synthesize_wav_media(d, id_col="doc_id")
    return audio_decode_stats(media)


_FRAMESAMPLE_ORACLE = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       CAST(CASE WHEN n < 64 THEN n ELSE 64 END AS INTEGER) AS n_frame_bytes
FROM (
  SELECT d.doc_id, octet_length(encode(d.text)) AS n,
         unnest(range(0, GREATEST(1, octet_length(encode(d.text)) // 64)))
           AS i
  FROM documents d
)
WHERE i % 4 = 0
"""


@query("multimodal_framesample", oracle=_FRAMESAMPLE_ORACLE)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each payload expands to every 4th
    64-byte 'frame' row (operators/multimodal.sample_frames). Returns
    (doc_id, frame_idx, n_frame_bytes).

    Oracle-checked closed form: a payload of n bytes has
    ``greatest(1, n // 64)`` frames; sampled indices are the multiples of
    the stride below that; every frame is exactly 64 bytes except the
    single short frame of an under-64-byte payload (the 1->N expansion,
    frame boundaries, and tail handling all hash cross-engine)."""
    from multiomix_aws_emr_spark.operators.multimodal import (
        attach_binary_payload,
        sample_frames,
    )

    d = scan_parallel(load(spark, sf_dir, "documents"))
    media = attach_binary_payload(d, id_col="doc_id", text_col="text")
    frames = sample_frames(media, stride=4)
    return frames.select(
        "doc_id", "frame_idx", F.octet_length("frame").alias("n_frame_bytes")
    )


def _minhash_components_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_components_sql,
    )

    return minhash_components_sql()


@query("dedup_minhash_components", oracle=_minhash_components_oracle())
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transitive near-dup clusters: MinHash-LSH one-step edges
    (operators/dedup.py) closed to connected components by min-label
    propagation (operators/components.py). Output (doc_id, component) is
    total over the corpus; component ids are the minimum doc_id of each
    cluster. The portable signature hash lets the DuckDB oracle recompute
    the identical edges and close them with a recursive transitive-closure
    CTE — the iterative fixpoint is hash-checked end to end."""
    from multiomix_aws_emr_spark.operators.checkpointing import truncate_lineage
    from multiomix_aws_emr_spark.operators.components import connected_components
    from multiomix_aws_emr_spark.operators.dedup import lsh_cluster_assign
    from multiomix_aws_emr_spark.plans.sketchcache import banded_documents

    # Materialize the sketch output once: it feeds BOTH the fixpoint and
    # the final stitch join, and is (doc, rep) pairs — small relative to
    # the corpus text it derives from. The banded sketch itself comes
    # from the session-scoped shared cache (plans/sketchcache.py).
    # truncate_lineage follows SPARK_GRAFT_RELIABLE_CHECKPOINT: on
    # preemptible fleet nodes the default localCheckpoint is
    # unrecoverable under executor loss (measured — BASELINE.md r9).
    # eager=False: the fixpoint's first convergence probe materializes
    # the cut in the same job (r15 — no dedicated materialization job);
    # edges_materialized tells CC to keep its symmetrized edge view lazy
    # over this checkpoint instead of checkpointing again.
    one_step = truncate_lineage(
        lsh_cluster_assign(
            banded_documents(spark, sf_dir, portable=True), id_col="doc_id"
        ),
        eager=False,
    )
    # The fixpoint only concerns docs in non-trivial clusters; most of a
    # real corpus is singletons (doc_id == rep_id), which would bloat every
    # propagation round. Run CC on the dup subgraph only, then stitch
    # singletons back with their identity label.
    dup_edges = one_step.filter(F.col("doc_id") != F.col("rep_id"))
    cc = connected_components(
        dup_edges, src="doc_id", dst="rep_id", edges_materialized=True
    )
    return one_step.join(
        cc, one_step.doc_id == cc.node, "left"
    ).select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


def _curation_oracle() -> str:
    """Full-pipeline oracle: every stage (filters, exact dedup, portable
    MinHash-LSH rep selection, stats) restated in DuckDB SQL — the
    composed plan is hash-checked end to end, not rows-only."""
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_onestep_ctes,
    )

    return f"""
WITH base AS (
  SELECT * FROM documents
  WHERE lang IN ('en', 'es', 'de') AND n_chars >= 100
), keeper AS (
  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY text
), exact AS (
  SELECT b.* FROM base b JOIN keeper k USING (doc_id)
), {minhash_onestep_ctes(table="exact")},
keep_reps AS (
  SELECT doc_id FROM onestep WHERE doc_id = rep_id
), curated AS (
  SELECT e.* FROM exact e JOIN keep_reps USING (doc_id)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars
FROM curated GROUP BY lang ORDER BY lang
"""


@query("pipeline_curation", oracle=_curation_oracle())
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation flow as ONE composed Spark plan:

    language filter -> quality threshold -> exact dedup -> MinHash near-dup
    representative filter -> per-language corpus stats with provenance
    counts. Every stage is a declared operator elsewhere in this package;
    composing them exercises what a corpus pipeline actually ships, and the
    whole thing stays a single Catalyst plan (filters push into the scan;
    the only shuffles are the two dedup aggregates and the final stats
    groupBy). The portable signature hash makes the whole composition
    DuckDB-recomputable, so the end-to-end pipeline is hash-checked.
    """
    from multiomix_aws_emr_spark.functions.fingerprint import (
        text_fingerprint_cols,
    )
    from multiomix_aws_emr_spark.operators.dedup import lsh_cluster_assign
    from multiomix_aws_emr_spark.plans.sketchcache import banded_documents

    d = load(spark, sf_dir, "documents")
    base = d.filter(F.col("lang").isin("en", "es", "de")).filter(
        F.col("n_chars") >= 100
    )
    # exact dedup: keep the minimum doc_id per identical text — grouped
    # on the ~20-byte fingerprint key (functions/fingerprint.py), NOT the
    # raw text, so this shuffle carries ids + hashes, never document
    # bodies; identical result to GROUP BY text (the declared oracle)
    keeper = base.groupBy(*text_fingerprint_cols("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = base.join(keeper.select("doc_id"), "doc_id", "left_semi")
    # near-dup: keep only cluster representatives (doc == its rep). The
    # banded sketch is per-doc, so restricting the SHARED corpus sketch
    # (plans/sketchcache.py) by semi-join is exactly the sketch of
    # ``exact``; rep assignment then runs over the subset.
    banded = banded_documents(spark, sf_dir, portable=True).join(
        exact.select("doc_id"), "doc_id", "left_semi"
    )
    reps = lsh_cluster_assign(banded, id_col="doc_id").filter(
        F.col("doc_id") == F.col("rep_id")
    )
    curated = exact.join(reps.select("doc_id"), "doc_id", "left_semi")
    return (
        curated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "sample_hash_mod",
    oracle=(
        "SELECT doc_id, lang FROM documents "
        "WHERE (doc_id * 2654435761) % 4294967296 < 1288490189 "
        "ORDER BY doc_id"
    ),
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~30% sample via Knuth's multiplicative hash
    (``(id * 2654435761) mod 2^32``) — the reproducible alternative to
    Bernoulli ``sampleBy``: the same row set on every engine, every run,
    any partitioning, which is what a training-data pipeline needs for
    auditable corpus subsets. Pure narrow filter: pushes to the scan, no
    shuffle. At petabyte scale (ids beyond ~2^31, where the product would
    overflow int64) swap the multiplier for ``xxhash64(doc_id) % 2^32`` —
    identical plan shape; this form is kept because it is expressible in
    portable ANSI SQL for the oracle."""
    d = load(spark, sf_dir, "documents")
    keep = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) < F.lit(
        1288490189
    )
    return d.filter(keep).select("doc_id", "lang").orderBy("doc_id")


_STRAT_FRACS = {"en": 0.5, "es": 1.0, "de": 1.0, "fr": 0.25}


def _strat_oracle() -> str:
    from multiomix_aws_emr_spark.functions.porthash import phash60_sql

    h = phash60_sql("CAST(doc_id AS VARCHAR)", seed=42)
    cases = " ".join(
        f"WHEN '{lang}' THEN {frac}" for lang, frac in _STRAT_FRACS.items()
    )
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled FROM documents
WHERE {h} < (CASE lang {cases} ELSE 0 END) * 1152921504606846976
GROUP BY lang ORDER BY lang
"""


@query("sample_stratified", oracle=_strat_oracle())
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by language with per-stratum rates — the
    mixture-rebalancing step of training-data pipelines — implemented as
    DETERMINISTIC hash sampling (keep iff the seeded portable hash of the
    id falls below rate * 2^60) rather than ``sampleBy``'s RNG: the same
    row set on every engine, every run, any partitioning — auditable
    corpus subsets, and a cross-engine oracle. Pure narrow filter, no
    shuffle before the count. Emits per-language sampled counts."""
    d = load(spark, sf_dir, "documents")
    from multiomix_aws_emr_spark.functions.porthash import phash60

    rate = None
    for lang, frac in _STRAT_FRACS.items():
        case = F.when(F.col("lang") == lang, F.lit(frac))
        rate = case if rate is None else rate.when(F.col("lang") == lang, F.lit(frac))
    rate = rate.otherwise(F.lit(0.0))
    keep = phash60(F.col("doc_id").cast("string"), seed=42) < rate * F.lit(
        1 << 60
    )
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


_DECONTAMINATE_ORACLE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4]
                        FOR i IN range(1, len(w) - 3)]) AS ws
  FROM t WHERE len(w) >= 5
), ev AS (
  SELECT doc_id AS eval_doc, u.sh
  FROM s, UNNEST(ws) AS u(sh) WHERE doc_id % 97 = 0
), corpus AS (
  SELECT doc_id, u.sh
  FROM s, UNNEST(ws) AS u(sh) WHERE doc_id % 97 <> 0
)
SELECT c.doc_id,
       CAST(COUNT(DISTINCT c.sh) AS BIGINT) AS n_shared,
       MIN(e.eval_doc) AS first_eval_doc
FROM corpus c JOIN ev e ON c.sh = e.sh
GROUP BY c.doc_id
"""


@query("text_decontaminate", oracle=_DECONTAMINATE_ORACLE)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any 5-gram
    with the held-out eval set (doc_id % 97 == 0 stands in for the
    benchmark suite) — the hygiene pass every pre-training pipeline runs
    so eval answers don't leak into training data. Distinct from
    within-corpus near-dup (dedup_ngram_jaccard): the join is corpus x
    EVAL shingles, and the eval side is tiny by construction, so it
    BROADCASTS — the corpus is scanned once and never shuffled for the
    probe, at any corpus size. Output: contaminated doc, how many
    distinct 5-grams leaked, and the first eval doc hit.

    This is the HASHED-shingle, hits-only variant (it reuses the
    session-shared 5-gram-hash sketch, emits only leaked docs, and
    tracks which eval doc leaked). Its r14 sibling
    ``decontaminate_ngram`` (queries/textops.py) is the raw-gram SCORED
    decision surface — every training doc with occurrence-based
    hit_ratio, supporting both GPT-3's any-collision and PaLM's >=70%
    rules, with the dirty-window surgical cut available as
    ``operators/dedup.contamination_spans`` + ``cut_spans``."""
    from multiomix_aws_emr_spark.plans.sketchcache import fivegram_hashes

    # shared per-doc 5-gram-hash index (plans/sketchcache.py) — also
    # consumed by pipeline_curation_v2's decontamination stage
    sh = fivegram_hashes(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_doc"), "s"
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared"),
            F.min("eval_doc").alias("first_eval_doc"),
        )
    )


_IMPORTANCE_ORACLE = """
SELECT doc_id, lang,
       ROUND(LEAST(n_chars / 1000.0, 1.0), 6) AS keep_prob
FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
      < LEAST(n_chars / 1000.0, 1.0)
"""


@query("sample_importance_weighted", oracle=_IMPORTANCE_ORACLE)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic downsampling: each document keeps
    with probability proportional to a quality proxy (here length,
    capped at 1) — the importance-sampling pass real curation pipelines
    use to up-weight high-quality text without a separate RNG state.
    Keep iff u(doc_id) < w(doc), where u is the Knuth multiplicative
    hash mapped to [0, 1): same row set on every engine, every run, any
    partitioning — an auditable corpus subset. Both u (an integer over
    2^32, exact in binary) and w compare exactly across engines. Pure
    narrow filter: no shuffle; at scale the filter sits on the scan."""
    d = load(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    return d.filter(u < w).select(
        "doc_id", "lang", F.round(w, 6).alias("keep_prob")
    )


def _curation_v2_oracle() -> str:
    from multiomix_aws_emr_spark.queries.minhash_oracle import (
        minhash_onestep_ctes,
    )

    return f"""
WITH base AS (
  SELECT * FROM documents
  WHERE lang IN ('en', 'es', 'de') AND n_chars >= 100
), keeper AS (
  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY text
), exact AS (
  SELECT b.* FROM base b JOIN keeper k USING (doc_id)
), {minhash_onestep_ctes(table="exact")},
keep_reps AS (
  SELECT doc_id FROM onestep WHERE doc_id = rep_id
), curated AS (
  SELECT e.* FROM exact e JOIN keep_reps USING (doc_id)
), tok5 AS (
  SELECT doc_id,
         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                        w[i+3] || ' ' || w[i+4]
                        FOR i IN range(1, len(w) - 3)]) AS ws
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents)
  WHERE len(w) >= 5
), ev_sh AS (
  SELECT u.sh FROM tok5, UNNEST(ws) AS u(sh) WHERE doc_id % 97 = 0
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM tok5 t, UNNEST(t.ws) AS u(sh)
  WHERE t.doc_id % 97 <> 0 AND u.sh IN (SELECT sh FROM ev_sh)
), clean AS (
  SELECT * FROM curated
  WHERE doc_id % 97 <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), sampled AS (
  SELECT * FROM clean
  WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
        < LEAST(n_chars / 1000.0, 1.0)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(SUM(LEAST(n_chars / 1000.0, 1.0)), 4) AS expected_mass
FROM sampled GROUP BY lang ORDER BY lang
"""


@query("pipeline_curation_v2", oracle=_curation_v2_oracle())
def pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation flow as one composed Catalyst plan — the v1
    pipeline (language/quality filter -> exact dedup -> MinHash-LSH
    representative selection) extended with the two hygiene stages a
    production corpus adds before training: benchmark DECONTAMINATION
    (drop the eval partition and every doc sharing a 5-gram with it —
    the eval shingle set broadcasts into a left-anti probe) and
    IMPORTANCE SAMPLING (quality-proportional deterministic keep). Six
    stages, one plan: the narrow filters push to the scan, the dedup
    stages shuffle on their own keys, decontamination is a broadcast
    anti join, sampling is a map-side expression — end-to-end
    hash-checked against DuckDB restating every stage."""
    from multiomix_aws_emr_spark.functions.fingerprint import (
        text_fingerprint_cols,
    )
    from multiomix_aws_emr_spark.operators.dedup import lsh_cluster_assign
    from multiomix_aws_emr_spark.plans.sketchcache import (
        banded_documents,
        fivegram_hashes,
    )

    d = load(spark, sf_dir, "documents")
    base = d.filter(F.col("lang").isin("en", "es", "de")).filter(
        F.col("n_chars") >= 100
    )
    # cheap-key exact dedup: fingerprint group keys, not document bodies
    # (functions/fingerprint.py) — identical result to GROUP BY text
    keeper = base.groupBy(*text_fingerprint_cols("text")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = base.join(keeper.select("doc_id"), "doc_id", "left_semi")
    # near-dup reps over the shared per-doc sketch, restricted to the
    # exact-dedup survivors (plans/sketchcache.py — same sub-plan as
    # dedup_near_minhash / pipeline_curation, computed once per session)
    banded = banded_documents(spark, sf_dir, portable=True).join(
        exact.select("doc_id"), "doc_id", "left_semi"
    )
    reps = lsh_cluster_assign(banded, id_col="doc_id").filter(
        F.col("doc_id") == F.col("rep_id")
    )
    curated = exact.join(reps.select("doc_id"), "doc_id", "left_semi")

    # 5-gram decontamination over the full corpus (eval side needs all
    # docs), probing the shared per-doc 5-gram index
    # (plans/sketchcache.py — same sub-plan as text_decontaminate)
    gram = fivegram_hashes(spark, sf_dir)
    ev_sh = gram.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    contaminated = (
        gram.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev_sh), "s")
        .select("doc_id")
        .distinct()
    )
    clean = curated.filter(F.col("doc_id") % 97 != 0).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )

    wgt = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    sampled = clean.filter(u < wgt)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.sum(wgt), 4).alias("expected_mass"),
        )
        .orderBy("lang")
    )


_N_SHARDS = 8


def _shuffle_shards_oracle() -> str:
    from multiomix_aws_emr_spark.functions.porthash import phash60_sql

    h = phash60_sql("CAST(doc_id AS VARCHAR)", seed=7)
    return f"""
WITH h AS (SELECT doc_id, {h} AS hh FROM documents)
SELECT doc_id, CAST(hh % {_N_SHARDS} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hh % {_N_SHARDS}
            ORDER BY hh, doc_id) AS INTEGER) AS pos
FROM h
"""


@query("pipeline_shuffle_shards", oracle=_shuffle_shards_oracle())
def pipeline_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards — the data-order
    step of a pretraining pipeline. Each doc gets a portable seeded hash;
    shard = hash mod N, position = rank of the hash within the shard. The
    result is a reproducible pseudo-random permutation (same on every
    engine, every run, any partitioning — auditable epochs, resumable
    from any shard/offset) with no RNG state anywhere.

    Scale shape: the hash is a narrow projection fused into the scan; the
    only shuffle is the partitionBy(shard) exchange — exactly the exchange
    a sharded training-set WRITE needs anyway (repartition by shard +
    sortWithinPartitions(hash) feeds the writer in final order), so
    ordering costs nothing extra at 100 TB. Within-shard rank is a local
    sort per shard, never a global sort."""
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.functions.porthash import phash60

    d = load(spark, sf_dir, "documents").select(
        "doc_id", phash60(F.col("doc_id").cast("string"), seed=7).alias("_h")
    )
    shard = (F.col("_h") % _N_SHARDS).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    return (
        d.select("doc_id", "_h", shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


def mixture_rates(d, weights):
    """(lang, n, rate) availability-constrained mixture rates: feasible
    total t = min(n_d / w_d), rate_d = min(1, w_d * t / n_d). Shared by
    pipeline_domain_mix and pipeline_curation_v3 so the two can never
    silently desynchronize; the tiny rates frame is meant to be broadcast
    back onto the corpus by the caller."""
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    avail = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", wmap[F.col("lang")])
        .filter(F.col("w").isNotNull() & (F.col("w") > 0))
    )
    feas = avail.agg(F.min(F.col("n") / F.col("w")).alias("t"))
    return avail.crossJoin(F.broadcast(feas)).select(
        "lang",
        "n",
        F.least(F.lit(1.0), F.col("w") * F.col("t") / F.col("n")).alias("rate"),
    )


def mixture_rates_ctes(src: str, weights) -> str:
    """DuckDB CTE block (avail/feas/rates) computing the same rates over
    ``src`` — the oracle twin of :func:`mixture_rates`."""
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in weights.items())
    return f"""avail AS (
  SELECT lang, CASE lang {cases} ELSE 0 END AS w, COUNT(*) AS n
  FROM {src} GROUP BY lang
), feas AS (SELECT MIN(n / w) AS t FROM avail WHERE w > 0),
rates AS (
  SELECT lang, n, LEAST(1.0, w * t / n) AS rate FROM avail, feas WHERE w > 0
)"""


_MIX_WEIGHTS = {"en": 0.4, "zh": 0.2, "fr": 0.2, "de": 0.1, "es": 0.1}


def _domain_mix_oracle() -> str:
    from multiomix_aws_emr_spark.functions.porthash import phash60_sql

    h = phash60_sql("CAST(doc_id AS VARCHAR)", seed=13)
    return f"""
WITH {mixture_rates_ctes("documents", _MIX_WEIGHTS)}
SELECT d.lang, CAST(MIN(r.n) AS BIGINT) AS n_avail,
       ROUND(MIN(r.rate), 6) AS rate_r,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {h} < r.rate * 1152921504606846976
GROUP BY d.lang ORDER BY d.lang
"""


@query("pipeline_domain_mix", oracle=_domain_mix_oracle())
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability-constrained domain-mixture sampling: hit target corpus
    weights per domain (here ``lang``) at the largest total the data
    supports. Feasible total t = min(n_d / w_d); per-domain rate =
    min(1, w_d * t / n_d); selection is the deterministic portable-hash
    filter (no RNG — reproducible and cross-engine checkable). This is the
    mixture step of pretraining recipes (fixed domain proportions under
    per-domain availability), one level above sample_stratified's
    hand-given rates: the rates here are COMPUTED from the corpus.

    Scale shape: domain stats are one tiny hash agg (|domains| rows); the
    feasible-total reduction and rate computation stay on that tiny frame;
    rates broadcast back onto the corpus; the keep decision is a narrow
    per-row filter fused into the scan. One full-corpus shuffle total (the
    final per-domain count), nothing proportional to corpus size moves."""
    from multiomix_aws_emr_spark.functions.porthash import phash60

    d = load(spark, sf_dir, "documents")
    rates = mixture_rates(d, _MIX_WEIGHTS)
    keep = phash60(F.col("doc_id").cast("string"), seed=13) < F.col(
        "rate"
    ) * F.lit(1152921504606846976)
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(keep)
        .groupBy("lang")
        .agg(
            F.min("n").alias("n_avail"),
            F.round(F.min("rate"), 6).alias("rate_r"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .orderBy("lang")
    )


def _curation_v3_oracle() -> str:
    from multiomix_aws_emr_spark.functions.porthash import phash60_sql

    keep_h = phash60_sql("CAST(doc_id AS VARCHAR)", seed=13)
    shard_h = phash60_sql("CAST(doc_id AS VARCHAR)", seed=7)
    rates_ctes = mixture_rates_ctes("kept_q", _MIX_WEIGHTS)
    return f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), rep AS (
  SELECT doc_id,
         1.0 - len(list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]))
             / CAST(len(w) - 1 AS DOUBLE) AS rep_ratio
  FROM tok WHERE len(w) >= 2
), kept_q AS (
  SELECT d.doc_id, d.lang FROM documents d JOIN rep USING (doc_id)
  WHERE rep.rep_ratio <= 0.3 AND d.n_chars >= 50
), {rates_ctes}, sel AS (
  SELECT k.doc_id, k.lang FROM kept_q k JOIN rates r ON k.lang = r.lang
  WHERE {keep_h} < r.rate * 1152921504606846976
), sharded AS (
  SELECT doc_id, lang, {shard_h} AS hh FROM sel
), pos AS (
  SELECT lang, CAST(hh % {_N_SHARDS} AS INTEGER) AS shard,
         ROW_NUMBER() OVER (PARTITION BY hh % {_N_SHARDS}
                            ORDER BY hh, doc_id) AS p
  FROM sharded
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p) AS BIGINT) AS pos_checksum,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM pos GROUP BY shard ORDER BY shard
"""


@query(
    "pipeline_curation_v3",
    oracle=_curation_v3_oracle(),
    # Rule-2 sizing hint: the mixture/sampling exchanges shuffle the full
    # documents corpus (bodies included, for the shard write). Floors to
    # the baseline at fixture scale; sizes hands-free at probe volume.
    sizing_hint=fact_bytes("documents"),
)
def pipeline_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 curation flagship: intra-doc quality rule -> computed
    domain mixture -> deterministic sampling -> training-shard layout, ONE
    Catalyst plan end to end.

    1. quality: drop docs with duplicate-bigram ratio > 0.3 or < 50 chars
       (the Gopher-style repetition rule, computed relationally);
    2. mixture: availability-constrained per-language rates from the
       SURVIVORS (t = min(n_d/w_d), rate = min(1, w_d*t/n_d));
    3. selection: seeded portable-hash keep-filter (auditable, RNG-free);
    4. layout: seeded hash shard + within-shard rank.

    Output is one row per shard with a RANK-INTEGRITY checksum: sum of
    within-shard positions must equal n(n+1)/2, and the oracle recomputes
    it independently — a duplicated, dropped, or misordered rank anywhere
    in the composition breaks the cross-engine hash.

    Scale shape: the bigram pass is one shuffle on doc_id; mixture stats
    are a tiny agg broadcast back; selection is a narrow filter; the only
    other full shuffle is the partitionBy(shard) exchange the sharded
    WRITE needs anyway. Nothing driver-side, nothing quadratic."""
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.functions.ngrams import bigram_rows
    from multiomix_aws_emr_spark.functions.porthash import phash60

    d = load(spark, sf_dir, "documents")
    rep = bigram_rows(d).groupBy("doc_id").agg(
        (
            F.lit(1.0)
            - F.countDistinct("bg") / F.count(F.lit(1)).cast("double")
        ).alias("rep_ratio")
    )
    kept_q = (
        d.join(rep, "doc_id")
        .filter((F.col("rep_ratio") <= 0.3) & (F.col("n_chars") >= 50))
        .select("doc_id", "lang")
    )
    rates = mixture_rates(kept_q, _MIX_WEIGHTS).select("lang", "rate")
    sel = (
        kept_q.join(F.broadcast(rates), "lang")
        .filter(
            phash60(F.col("doc_id").cast("string"), seed=13)
            < F.col("rate") * F.lit(1152921504606846976)
        )
        .select("doc_id", "lang")
    )
    sharded = sel.select(
        "doc_id", "lang", phash60(F.col("doc_id").cast("string"), seed=7).alias("hh")
    )
    shard = (F.col("hh") % _N_SHARDS).cast("int")
    ws = Window.partitionBy("shard").orderBy("hh", "doc_id")
    pos = (
        sharded.select("doc_id", "lang", "hh", shard.alias("shard"))
        .withColumn("p", F.row_number().over(ws))
    )
    return (
        pos.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("p").alias("pos_checksum"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("shard")
    )
