"""Property-based test for exact_topk (SURVEY.md §5.2.5): the brute-force
cosine top-k that every ANN recall bound (similarity_ivf /
similarity_ann_lsh self-reports) is measured against, checked against an
independent numpy implementation with the same rounding and tie-break.
Integer-valued vectors keep dot products and squared norms exact in
float64, so both engines' arithmetic is bit-identical and the comparison
is exact, including rank order."""

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.operators.similarity import exact_topk

_settings = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2 free int dims + a constant 1 third dim => norms never zero
_vectors = st.lists(
    st.tuples(st.integers(-4, 4), st.integers(-4, 4)),
    min_size=2,
    max_size=10,
)


def _round6(x: float) -> float:
    # Spark's round() on doubles is HALF_UP; mirror it sign-aware
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


@_settings
@given(vecs=_vectors, k=st.integers(1, 4))
def test_exact_topk_matches_numpy(spark, vecs, k):
    rows = [(i, [float(a), float(b), 1.0]) for i, (a, b) in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    query_ids = [0, len(rows) - 1]

    got = sorted(
        (r.query_id, r.rn, r.id_b, r.cos_sim)
        for r in exact_topk(
            df, id_col="id", vec_col="emb", query_ids=query_ids, k=k
        ).collect()
    )

    mat = np.array([v for _, v in rows])
    norms = np.sqrt((mat * mat).sum(axis=1))
    expected = []
    for qid in set(query_ids):
        scored = []
        for j in range(len(rows)):
            if j == qid:
                continue
            cos = float(mat[qid] @ mat[j]) / (norms[qid] * norms[j])
            scored.append((_round6(cos), j))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rn, (cos, j) in enumerate(scored[:k], start=1):
            expected.append((qid, rn, j, cos))
    assert got == sorted(expected)


@_settings
@given(
    vecs=st.lists(
        st.tuples(st.integers(-3, 3), st.integers(-3, 3)),
        min_size=2,
        max_size=16,
    ),
    n_lists=st.integers(1, 3),
    cap=st.integers(2, 20),
    tile=st.integers(1, 7),
)
def test_semantic_survivors_properties(spark, vecs, n_lists, cap, tile):
    """The capped SemDeDup prune over arbitrary integer vectors (exact
    float64 arithmetic): (a) one verdict per id at any cap/tile; (b) a
    cap no cluster exceeds reproduces the uncapped NumPy reference
    exactly, at every tile size; (c) a binding cap yields a SUPERSET of
    the uncapped survivors (sub-splitting only removes comparisons)."""
    from multiomix_aws_emr_spark.operators.similarity import (
        semantic_survivors,
    )

    rows = [
        (i, [float(a), float(b), 1.0], i % n_lists)
        for i, (a, b) in enumerate(vecs)
    ]
    df = spark.createDataFrame(
        rows, "vid long, emb array<double>, lst int"
    )

    # uncapped reference (mirrors the operator's rounding convention)
    by_list: dict = {}
    for i, emb, lst in rows:
        by_list.setdefault(lst, []).append((i, np.array(emb)))
    want = set()
    for lst, members in by_list.items():
        members.sort(key=lambda t: t[0])
        v = np.array([e for _, e in members])
        nrm = np.sqrt((v * v).sum(axis=1))
        c = (v @ v.T) / np.outer(nrm, nrm)
        rr = np.sign(c) * np.floor(np.abs(c) * 1e5 + 0.5) / 1e5
        drop = np.triu(rr >= 0.35, k=1).any(axis=0)
        want |= {
            (m[0], lst) for m, d in zip(members, drop) if not d
        }

    def run(max_cluster):
        out = semantic_survivors(
            df,
            id_col="vid",
            vec_col="emb",
            list_col="lst",
            threshold=0.35,
            max_cluster=max_cluster,
            tile=tile,
        ).collect()
        ids = [r.vid for r in out]
        assert len(ids) == len(set(ids))  # (a) one verdict per id
        return {(r.vid, r.lst) for r in out}

    assert run(len(rows) + 1) == want  # (b) non-binding cap == reference
    assert run(cap) >= want  # (c) binding cap only adds survivors
