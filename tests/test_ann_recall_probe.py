"""tools/ann_recall_probe.py planted-synth invariants.

BASELINE.md's planted-geometry recall table (recall@5 = 1.0 at every
setting) is only meaningful if the synth actually plants what it
claims, so pin it: every copy stays NEAR its source vector (high
within-family cosine — concentrated true neighborhoods), families are
mutually far (the isotropic bulk), ids are disjoint, and the transform
is deterministic (the probe's run-twice-byte-identical protocol depends
on it).
"""

import math
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import pytest


@pytest.fixture(scope="module")
def planted(spark, sf_dir, tmp_path_factory):
    from tools.ann_recall_probe import synthesize_planted

    out = str(tmp_path_factory.mktemp("planted"))
    synthesize_planted(spark, sf_dir, out, replicas=4)
    return out


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_row_multiplication_and_id_disjointness(spark, sf_dir, planted):
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    big = spark.read.parquet(f"{planted}/embeddings.parquet")
    assert big.count() == 4 * src.count()
    assert big.select("vec_id").distinct().count() == big.count()


def test_within_family_near_cross_family_far(spark, sf_dir, planted):
    src = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(40)
        .collect()
    }
    big = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{planted}/embeddings.parquet").collect()
    }
    within, cross = [], []
    fam_ids = sorted(src)[:10]
    for v in fam_ids:
        members = [big[v * 4 + k] for k in range(4)]
        for m in members:
            within.append(_cos(src[v], m))
        other = fam_ids[(fam_ids.index(v) + 1) % len(fam_ids)]
        cross.append(_cos(big[v * 4], big[other * 4]))
    # concentrated neighborhoods: family >= 0.9, far above the isotropic
    # bulk (fixture top-5 cosines ~0.3)
    assert min(within) >= 0.9, f"family cosine too low: {min(within):.3f}"
    assert max(cross) < 0.85, f"cross-family cosine too high: {max(cross):.3f}"
    assert sum(within) / len(within) > sum(cross) / len(cross) + 0.2


def test_deterministic(spark, sf_dir, tmp_path_factory, planted):
    from tools.ann_recall_probe import synthesize_planted

    out2 = str(tmp_path_factory.mktemp("planted2"))
    synthesize_planted(spark, sf_dir, out2, replicas=4)
    a = sorted(
        map(tuple, spark.read.parquet(f"{planted}/embeddings.parquet").collect())
    )
    b = sorted(map(tuple, spark.read.parquet(f"{out2}/embeddings.parquet").collect()))
    assert a == b
