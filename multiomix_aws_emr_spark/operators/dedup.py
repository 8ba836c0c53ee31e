"""Near-duplicate detection: MinHash + LSH banding, fully in JVM expressions.

The classic pipeline (Broder '97 resemblance sketches; banding analysis in
Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3):

  word shingles -> K seeded min-hashes -> B bands of R rows ->
  band-bucket join -> candidate clusters

Everything is built-ins (``xxhash64`` is Spark's JVM 64-bit hash; seeding
is done by prefixing the hash input with the hash index), so the sketch
computation stays inside whole-stage codegen, and the only shuffles are
the two hash aggregations — both on compact integer keys. No cross join
at any point: candidate generation is a groupBy on (band, bucket), which
is the property that makes this the 100 TB dedup path.

Output is one step of cluster merging (doc -> min doc_id sharing any
bucket), not full transitive closure; iterate to a fixpoint for full
connected components (documented trade-off — at corpus scale one banding
pass is the standard candidate generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(text_col, shingle_words: int = 3):
    """Distinct word n-gram shingles of a text column (JVM array HOFs).

    Documents shorter than ``shingle_words`` contribute their full token
    string as a single shingle.
    """
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - shingle_words + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, shingle_words)),
    )
    return F.array_distinct(
        F.when(n >= shingle_words, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, h0..h{K-1}) MinHash signature table.

    One explode + one hash aggregate; the shuffle key is the doc id.
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_words)).alias("_sh")
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("_sh"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_clusters(
    df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
) -> DataFrame:
    """Near-dup cluster assignment: (id, rep_id), total over the corpus.

    rep_id = smallest id sharing any LSH band bucket (itself when unique).
    With K=16, B=4 (R=4 rows/band) the candidate threshold sits near
    Jaccard ~ (1/B)^(1/R) ~ 0.5.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands

    sig = minhash_signatures(
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        shingle_words=shingle_words,
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")

    reps = banded.groupBy("band", "bucket").agg(F.min(id_col).alias("_rep"))
    return (
        banded.join(reps, ["band", "bucket"])
        .groupBy(id_col)
        .agg(F.min("_rep").alias("rep_id"))
    )
