"""SimHash document fingerprints, computed entirely in JVM expressions.

Charikar '02 random-hyperplane sketch specialization for token sets: each
token hashes to 64 bits (Spark's built-in ``xxhash64``); bit i of the
document fingerprint is set iff the majority of the document's tokens have
bit i set (computed as a sum of ±1 votes). Near-duplicate documents differ
in few bits, so banding the fingerprint gives an LSH candidate generator.

Plan shape: explode(tokens) -> one hash per token -> ONE hash aggregate
with 64 vote-sums -> fingerprint assembly as a single projection. Wide but
fully whole-stage-codegen; the only shuffle is the groupBy on doc id. No
Python anywhere — this is the 100 TB-friendly formulation (a per-row
Python simhash UDF would be 10-100x slower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BITS = 64


def simhash(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash bigint) 64-bit SimHash of whitespace tokens."""
    # explode(split) then filter — plain codegen expressions; exploding a
    # HOF-built array (filter lambda) forces a fresh Janino compile per
    # execution, which dominates wall time on small inputs.
    ex = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_tok"))
        .filter(F.col("_tok") != "")
        .withColumn("_h", F.xxhash64("_tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(_BITS):
        bit = F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_bands(
    sig: DataFrame, *, id_col: str, bands: int = 4, carry: tuple = ()
) -> DataFrame:
    """(id, *carry, band, bucket) — split the 64-bit fingerprint into equal
    bands; candidates for near-dup share (band, bucket). Equi-join key, no
    cross join. ``carry`` columns ride along through the explode, so
    callers that want signature + bands together need no self-join."""
    width = _BITS // bands
    mask = (1 << width) - 1
    rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        id_col, *carry, F.explode(F.array(*rows)).alias("bb")
    ).select(id_col, *carry, "bb.band", "bb.bucket")


def hamming_distance(a, b):
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
