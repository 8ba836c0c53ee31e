"""SimHash document fingerprints, computed entirely in JVM expressions.

Charikar '02 random-hyperplane sketch specialization for token sets: each
token hashes to B bits; bit i of the document fingerprint is set iff the
majority of the document's tokens have bit i set (computed as a sum of ±1
votes). Near-duplicate documents differ in few bits, so banding the
fingerprint gives an LSH candidate generator.

Two hash widths share one SWAR implementation:

* default (``portable=False``): 64-bit ``xxhash64`` tokens — the fastest
  JVM hash, 16-bit SWAR lanes, fingerprints use the full long.
* ``portable=True``: the 60-bit cross-engine hash of
  functions/porthash.py (md5-derived, bit-identical in DuckDB), 15-bit
  SWAR lanes — this is the variant the driver's DuckDB oracle re-computes
  bit-for-bit, upgrading `dedup_simhash` from rows-only to hash-checked.

Plan shape: explode(tokens) -> one hash per token -> ONE hash aggregate
with ``stride`` packed vote-sums -> fingerprint assembly as a single
projection. Wide but fully whole-stage-codegen; the only shuffle is the
groupBy on doc id. No Python anywhere — this is the 100 TB-friendly
formulation (a per-row Python simhash UDF would be 10-100x slower).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.functions.porthash import phash60


def simhash(
    df: DataFrame, *, id_col: str, text_col: str, portable: bool = False
) -> DataFrame:
    """(id, simhash bigint) SimHash of whitespace tokens (64- or 60-bit).

    The per-bit vote counts are accumulated SWAR-style: ``stride`` packed
    accumulators, each holding four ``stride``-bit lane counters (bit
    positions p, p+stride, p+2*stride, p+3*stride of the token hash), so
    the aggregate has stride branch-free ``sum`` buffers instead of
    4*stride conditional ones — 4x less aggregation state and a far
    smaller codegen fragment, same fingerprints. Bit i of the result is
    set iff the majority of tokens set it: ``2*count_i > n_tokens``
    (exactly the ±1-vote rule).

    Lane headroom bounds document length (the doubled counter plus the
    0x3FFF comparison bias must stay below each lane's carry bit at lane
    bit 14, which itself stays clear of the long sign bit): 16383 tokens
    for the 16-bit lanes, 8191 for the 15-bit portable lanes — chunk
    longer documents upstream (fingerprinting whole multi-hundred-KB blobs
    as one unit is out of spec for SimHash anyway, cf. the hash's
    collision envelope).
    """
    stride = 15 if portable else 16  # lane width == number of accumulators
    # explode(split) then filter — plain codegen expressions; exploding a
    # HOF-built array (filter lambda) forces a fresh Janino compile per
    # execution, which dominates wall time on small inputs.
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    ).filter(F.col("_tok") != "")
    ex = tok.withColumn(
        "_h", phash60("_tok") if portable else F.xxhash64("_tok")
    )
    lane_mask = sum(1 << (stride * k) for k in range(4))  # one bit per lane
    packed = [
        F.sum(F.shiftright("_h", p).bitwiseAND(F.lit(lane_mask))).alias(f"s{p}")
        for p in range(stride)
    ]
    agg = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *packed)
    # SWAR majority compare, ``stride`` branch-free terms: per lane,
    # 2*count + (0x3FFF - n) has bit 14 set iff 2*count > n (strict
    # majority; the 0x3FFF bias makes a tie land just below the carry
    # bit). The carry sits at bit 14 — for 16-bit lanes that is below the
    # lane top, for 15-bit lanes it IS the lane top; either way the top
    # lane never touches the long sign bit and the packed adds stay
    # inside signed range (ANSI mode overflow-checks every add). Shifting
    # the carry down to lane position and ORing the packed results
    # assembles the fingerprint with no conditionals.
    lanes = F.lit(lane_mask)
    bias = (F.lit(0x3FFF) - F.col("_n")) * lanes
    fp = None
    for p in range(stride):
        m = F.shiftright(F.col(f"s{p}") * 2 + bias, 14).bitwiseAND(lanes)
        term = F.shiftleft(m, p)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_bands(
    sig: DataFrame,
    *,
    id_col: str,
    bands: int = 4,
    carry: tuple = (),
    bits: int = 64,
) -> DataFrame:
    """(id, *carry, band, bucket) — split the ``bits``-bit fingerprint into
    equal bands; candidates for near-dup share (band, bucket). Equi-join
    key, no cross join. ``carry`` columns ride along through the explode,
    so callers that want signature + bands together need no self-join."""
    width = bits // bands
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
    """Hamming distance between two fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
