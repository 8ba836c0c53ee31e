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
    """(id, simhash bigint) 64-bit SimHash of whitespace tokens.

    The per-bit vote counts are accumulated SWAR-style: sixteen packed
    accumulators, each holding four 16-bit lane counters (bit positions
    p, p+16, p+32, p+48 of the token hash), so the aggregate has 16
    branch-free ``sum`` buffers instead of 64 conditional ones — 4x less
    aggregation state and a far smaller codegen fragment, same
    fingerprints. Bit i of the result is set iff the majority of tokens
    set it: ``2*count_i > n_tokens`` (exactly the ±1-vote rule).

    Lane headroom bounds document length at 16383 tokens (the doubled
    counter plus the comparison bias must stay below each lane's carry
    bit, which itself stays clear of the long sign bit) —
    chunk longer documents upstream (fingerprinting whole multi-hundred-KB
    blobs as one unit is out of spec for SimHash anyway, cf. the 64-bit
    hash's collision envelope).
    """
    # explode(split) then filter — plain codegen expressions; exploding a
    # HOF-built array (filter lambda) forces a fresh Janino compile per
    # execution, which dominates wall time on small inputs.
    ex = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_tok"))
        .filter(F.col("_tok") != "")
        .withColumn("_h", F.xxhash64("_tok"))
    )
    lane_mask = 0x0001000100010001  # one 16-bit lane per packed counter
    packed = [
        F.sum(F.shiftright("_h", p).bitwiseAND(F.lit(lane_mask))).alias(f"s{p}")
        for p in range(16)
    ]
    agg = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *packed)
    # SWAR majority compare, 16 branch-free terms: per lane,
    # 2*count + (0x3FFF - n) has bit 14 set iff 2*count > n (strict
    # majority; the 0x3FFF bias makes a tie land just below the carry
    # bit). The carry sits at bit 14 — not 15 — so the top lane never
    # touches the sign bit and the packed adds stay inside signed-long
    # range (ANSI mode overflow-checks every add). Shifting the carry
    # down to lane position and ORing the 16 packed results assembles
    # the fingerprint with no conditionals.
    lanes = F.lit(lane_mask)
    bias = (F.lit(0x3FFF) - F.col("_n")) * lanes
    fp = None
    for p in range(16):
        m = F.shiftright(F.col(f"s{p}") * 2 + bias, 14).bitwiseAND(lanes)
        term = F.shiftleft(m, p)
        fp = term if fp is None else fp.bitwiseOR(term)
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
