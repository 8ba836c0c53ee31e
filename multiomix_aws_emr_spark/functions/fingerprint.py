"""Compact grouping keys for exact text dedup.

Exact dedup is a ``GROUP BY text`` — correct, but at corpus scale the
shuffle key payload is then the document body itself: every duplicate
row ships its full text to the reducer. Grouping on a compact
fingerprint instead makes the shuffle key ~20 bytes regardless of
document size, which cuts exact-dedup shuffle bytes by orders of
magnitude on a 100 TB corpus (dedup_latest_version already uses the
cheap-key form; this helper brings the exact-dedup family onto it).

The key is (length, xxhash64(text), xxhash64(1, text)) — two
independently-seeded 64-bit JVM hashes plus the length. Equality of the
composite key stands in for equality of the text: for two DIFFERENT
texts to land in one group, both seeded xxhash64 values and the length
must all collide (~2^-128 per pair before the length term), so even a
10^12-document corpus (~10^24 pairs) has a vanishing collision
probability — the standard fingerprint-equality argument production
dedup pipelines use in place of re-shipping the text for an in-group
byte compare, which would defeat the purpose of the compact key.

Callers that must EMIT the text (e.g. ``dedup_exact``) aggregate it
with ``F.min(text)``: within a group all texts are equal, and min is a
map-side partial aggregate, so each map task ships one copy per
distinct document rather than one per duplicate row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def text_fingerprint_cols(col: str = "text") -> list[Column]:
    """The composite exact-equality grouping key for a text column."""
    return [
        F.length(col).alias("_fp_len"),
        F.xxhash64(col).alias("_fp_h0"),
        F.xxhash64(F.lit(1), F.col(col)).alias("_fp_h1"),
    ]
