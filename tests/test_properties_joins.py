"""Property-based tests for the join-strategy operators (SURVEY.md §5.2.5):
``salted_join``, ``range_join_binned``, and ``connected_components``
against plain-join / brute-force / union-find references over
hypothesis-generated inputs.

These operators rewrite the physical plan for scale (salting a skewed
probe side, binning a theta-range join into an equi-join, iterative
min-label propagation) while promising bit-identical LOGICAL results —
exactly the contract a property test can pin: duplicate keys on both
sides must keep multiplicities, range boundaries are inclusive on both
ends across bin edges, and component labels must equal the min node id
reachable regardless of edge orientation, duplicates, or self-loops."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.operators.components import connected_components
from multiomix_aws_emr_spark.operators.rangejoin import range_join_binned
from multiomix_aws_emr_spark.operators.skew import salted_join

_settings = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_probe_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=12
)
_build_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(10, 19)), max_size=8
)


@_settings
@given(probe=_probe_rows, build=_build_rows, how=st.sampled_from(["inner", "left"]))
def test_salted_join_equals_plain_join(spark, probe, build, how):
    dp = spark.createDataFrame(probe or [(0, 0)], "k int, p int").limit(len(probe))
    db = spark.createDataFrame(build or [(0, 0)], "k int, b int").limit(len(build))

    got = Counter(
        (r.k, r.p, r.b)
        for r in salted_join(dp, db, "k", n_salts=4, how=how).collect()
    )
    want = Counter((r.k, r.p, r.b) for r in dp.join(db, "k", how).collect())
    assert got == want


_left_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-5, 5)), max_size=10
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-5, 5), st.integers(0, 6)),
    max_size=8,
)


@_settings
@given(
    left=_left_rows,
    right=_right_rows,
    bin_width=st.sampled_from([0.5, 1.0, 2.5, 10.0]),
)
def test_range_join_binned_matches_bruteforce(spark, left, right, bin_width):
    # right rows carry (id, lo, span) so lo <= hi by construction
    right_data = [(i, float(lo), float(lo + span)) for i, (_, lo, span) in
                  enumerate(right)]
    left_data = [(i, float(v)) for i, (_, v) in enumerate(left)]

    dl = spark.createDataFrame(
        left_data or [(0, 0.0)], "lid int, v double"
    ).limit(len(left_data))
    dr = spark.createDataFrame(
        right_data or [(0, 0.0, 0.0)], "rid int, lo double, hi double"
    ).limit(len(right_data))

    got = {
        (r.lid, r.rid)
        for r in range_join_binned(
            dl, dr, left_val="v", right_lo="lo", right_hi="hi",
            bin_width=bin_width,
        ).collect()
    }
    want = {
        (li, ri)
        for li, v in left_data
        for ri, lo, hi in right_data
        if lo <= v <= hi
    }
    assert got == want


_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=10
)


@_settings
@given(edges=_edges)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(
        edges or [(0, 0)], "src int, dst int"
    ).limit(len(edges))

    got = {(r.node, r.component) for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[find(n)]) for n in parent}
    assert got == want
