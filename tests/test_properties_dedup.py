"""Property-based tests for the MinHash+LSH operator (SURVEY.md §5.2.5).

Near-dup recall is probabilistic by design, but one guarantee is exact
and family-independent: documents with IDENTICAL text have identical
shingle sets, hence identical signatures, hence identical band buckets —
LSH can never split exact duplicates, for any number of hashes or bands,
in either hash family (xxhash64 or the portable md5 family). Hypothesis
builds corpora where every text appears at least twice and asserts the
guarantee plus the cluster-shape invariants (rep is a real doc id, never
exceeds its member, assignment is total)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.operators.dedup import minhash_lsh_clusters

_settings = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=6).map(" ".join),
    min_size=1,
    max_size=5,
)


@pytest.mark.parametrize("portable", [False, True])
@_settings
@given(texts=_texts)
def test_exact_duplicates_never_split(spark, texts, portable):
    # every text appears twice under different doc ids
    rows = [(2 * i, t) for i, t in enumerate(texts)] + [
        (2 * i + 1, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = {
        r.doc_id: r.rep_id
        for r in minhash_lsh_clusters(
            df,
            id_col="doc_id",
            text_col="text",
            num_hashes=8,
            bands=2,
            shingle_words=2,
            portable=portable,
        ).collect()
    }
    ids = {i for i, _ in rows}
    # total assignment with sane reps
    assert set(clusters) == ids
    assert all(rep in ids and rep <= i for i, rep in clusters.items())
    # the hard guarantee: identical text => identical cluster
    by_text: dict[str, set] = {}
    for i, t in rows:
        by_text.setdefault(t, set()).add(clusters[i])
    for t, reps in by_text.items():
        assert len(reps) == 1, f"exact duplicates split for {t!r}: {reps}"
