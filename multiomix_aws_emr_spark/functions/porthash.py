"""Portable 60-bit hash: identical in Spark and DuckDB, bit for bit.

``phash60(x) = int(md5(x)[:15], 16)`` — the top 60 bits of the standard
md5 digest of the UTF-8 string, always in ``[0, 2^60)`` so it fits a
signed long with headroom for packed SWAR arithmetic under ANSI overflow
checking. Spark computes it as ``conv(substring(md5(x), 1, 15), 16, 10)``
(all JVM built-ins, whole-stage codegen); DuckDB as
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``. Seeding prefixes the
input with ``"{seed}|"`` on both sides.

This is the cross-engine-checkable hash that upgrades the sketch-based
dedup queries (MinHash, SimHash) from rows-only to full DuckDB oracle
parity. It costs one md5 per input versus one xxhash64 — md5 is ~5-10x
more cycles per call but both are JVM-side and codegen-fused, so the
sketch pipelines stay shuffle-bound, not hash-bound, at scale. Callers
that never need cross-engine parity keep ``xxhash64`` (the operators take
a ``portable=`` flag; reference semantics per SURVEY.md §2.3 are
hash-agnostic).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash60(col: Union[Column, str], seed: Optional[int] = None) -> Column:
    """Spark column: portable 60-bit hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str, seed: Optional[int] = None) -> str:
    """DuckDB SQL fragment computing the same hash over ``expr``."""
    if seed is not None:
        expr = f"'{seed}|' || {expr}"
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def phash_pair(col: Union[Column, str]) -> tuple:
    """(a, b) Kirsch-Mitzenmacher base pair from ONE md5 call: a = top 60
    bits, b = 56 bits from the second digest half. A family of K seeded
    hashes is then ``h_i = a + i*b`` — one md5 per input instead of K
    (the K-M double-hashing construction; i <= 15 keeps ``a + i*b`` below
    2^61, safely inside ANSI-checked signed-long range)."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.md5(c)
    a = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    b = F.conv(F.substring(m, 17, 14), 16, 10).cast("long")
    return a, b


def phash_pair_sql(expr: str) -> tuple:
    """DuckDB fragments computing the same (a, b) pair over ``expr``."""
    return (
        f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)",
        f"CAST('0x' || substr(md5({expr}), 17, 14) AS BIGINT)",
    )
