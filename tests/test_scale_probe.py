"""tools/scale_probe.py synthesizer invariants: the 10x/100x scale
evidence in BASELINE.md is only as good as the synthetic corpus, so pin
what the replicate-and-scramble transform promises (see the module
docstring there): row multiplication, per-copy word-multiset preservation
(token-level stats match the source), copy-distinct shingle sets, and
determinism."""

import os
import sys
from collections import Counter

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


@pytest.fixture(scope="module")
def synth(spark, sf_dir, tmp_path_factory):
    from tools.scale_probe import synthesize

    out = str(tmp_path_factory.mktemp("probe"))
    synthesize(spark, sf_dir, out, replicas=2)
    return out


def test_synthesize_row_multiplication_and_id_disjointness(spark, sf_dir, synth):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = spark.read.parquet(f"{synth}/documents.parquet")
    assert big.count() == 2 * src.count()
    assert big.select("doc_id").distinct().count() == big.count()


def test_synthesize_preserves_word_multiset_per_copy(spark, sf_dir, synth):
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(20)
        .collect()
    }
    big = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{synth}/documents.parquet").collect()
    }
    for doc_id, text in src.items():
        for k in (0, 1):
            copy = big[doc_id * 2 + k]
            assert Counter(copy.split(" ")) == Counter(text.split(" ")), (
                doc_id,
                k,
            )


def test_synthesize_copies_are_shingle_distinct(spark, sf_dir, synth):
    """Copies of one doc must NOT share word order (their shingle sets
    diverge), otherwise the duplicate-pair count would grow quadratically
    in the replication factor and poison the linearity probe."""
    big = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{synth}/documents.parquet").collect()
    }
    differing = sum(
        1
        for doc_id in range(0, 40, 2)
        if doc_id + 1 in big
        and len(big[doc_id].split(" ")) > 3
        and big[doc_id] != big[doc_id + 1]
    )
    assert differing >= 15  # multi-word docs scramble differently per copy


def test_synthesize_deterministic(spark, sf_dir, synth, tmp_path):
    from tools.scale_probe import synthesize

    out2 = str(tmp_path / "probe2")
    synthesize(spark, sf_dir, out2, replicas=2)
    a = sorted(
        map(
            tuple,
            spark.read.parquet(f"{synth}/documents.parquet").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            spark.read.parquet(f"{out2}/documents.parquet").collect(),
        )
    )
    assert a == b
