"""LLM training-data pipeline queries: n-gram Jaccard dedup, SimHash,
multimodal binary plumbing (north-star surface beyond SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load

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


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-shingle Jaccard near-dup pairs (query side doc_id < 20,
    threshold 0.5).

    Scale shape: candidates come from an inverted shingle index (explode +
    equi-join on the shingle, count shared), NOT a cross join — pairs with
    zero shared shingles never materialize. jaccard = shared /
    (|A| + |B| - shared) from the per-doc distinct-shingle counts.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    sh = (
        d.withColumn("_t", toks)
        .filter(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.concat_ws(" ", F.slice("_t", i, 2)),
                )
            ).alias("ws"),
        )
    )
    sized = sh.select("doc_id", "ws", F.size("ws").alias("n_sh"))
    a = sized.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("id_a"),
        F.explode("ws").alias("s"),
        F.col("n_sh").alias("n_a"),
    )
    b = sized.select(
        F.col("doc_id").alias("id_b"),
        F.explode("ws").alias("s"),
        F.col("n_sh").alias("n_b"),
    )
    shared = (
        a.join(b, (a.s == b.s) & (F.col("id_a") < F.col("id_b")))
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


@query("dedup_simhash")  # rows-only: xxhash64 has no DuckDB twin
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document + its 4 LSH band buckets —
    all JVM-side (see operators/simhash.py). Total over the corpus."""
    from multiomix_aws_emr_spark.operators.simhash import simhash, simhash_bands

    d = load(spark, sf_dir, "documents")
    sig = simhash(d, id_col="doc_id", text_col="text")
    bands = simhash_bands(sig, id_col="doc_id")
    return sig.join(bands, "doc_id").select("doc_id", "simhash", "band", "bucket")


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


@query("multimodal_features")  # rows-only: fake extractor, no SQL twin
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (byte histogram stand-in; real codecs plug into
    operators/multimodal.decode_media)."""
    from multiomix_aws_emr_spark.operators.multimodal import (
        attach_binary_payload,
        byte_histogram_features,
    )

    d = load(spark, sf_dir, "documents")
    media = attach_binary_payload(d, id_col="doc_id", text_col="text")
    feats = byte_histogram_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.element_at("features", 7).alias("bucket6")
    )
