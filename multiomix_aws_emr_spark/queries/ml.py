"""MLlib interop: distributed model fitting over the engine's tables.

The reference's compute job fits scikit models inside worker tasks
(`scripts/main.py:61-197`) — per-candidate, driver-orchestrated. The
Spark-native counterpart for corpus-level models is MLlib: estimators
whose fit IS a distributed Spark job (k-means||, tree ensembles, ALS),
consuming DataFrame columns directly. One query exercises the seam:
array<float> embeddings -> MLlib vectors -> seeded k-means -> cluster
assignments, reduced to per-cluster stats.

Rows-only by necessity: MLlib has no DuckDB twin, and k-means cluster
IDENTITIES are init-dependent; the invariants (total rows preserved,
cluster count, determinism under a fixed seed on fixed data) are
unit-tested in tests/test_operators.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load, scan_parallel


@query("ml_kmeans_embeddings")  # rows-only: model fit has no SQL twin
def ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-means|| over the embeddings table via MLlib: fit is a
    sequence of distributed aggregate jobs (no data to the driver beyond
    k centroids), transform is a map-side UDF. Output is per-cluster
    size + mean L2 norm — stable schema regardless of which ids land in
    which cluster."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = scan_parallel(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(k=8, seed=42, maxIter=10).fit(e)
    assigned = model.transform(e)
    from multiomix_aws_emr_spark.functions.vector import l2_norm

    # Quality self-report (the ANN recall pattern): per-cluster mean
    # squared distance to the fitted centroid — a broken fit or a
    # mis-assigned transform shows up as dispersion, not just a
    # plausible row count. Centroids are k tiny rows, broadcast back.
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "prediction int, cent array<double>",
    )
    sqd = F.aggregate(
        F.zip_with(
            vector_to_array("features"), "cent", lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        assigned.join(F.broadcast(cents), "prediction")
        .select(
            "prediction",
            l2_norm(vector_to_array("features")).alias("nrm"),
            sqd.alias("sqd"),
        )
        .groupBy("prediction")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.avg("sqd"), 4).alias("mean_sq_dist"),
        )
    )
