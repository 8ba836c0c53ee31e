"""Property-based tests for the temporal operators (SURVEY.md §5.2.5):
``asof_latest_prior`` and ``temporal_join`` against brute-force references
over hypothesis-generated inputs.

These operators use the union + single-window-scan plan (operators/asof.py)
whose correctness hinges on tie-breaking at equal timestamps — exactly the
boundary hypothesis is good at hitting: lookups/dim versions at the SAME
timestamp as the probe row must count (inclusive <=), anchors with no
prior lookup must drop (inner) or null (left), and duplicate probe rows
must each match independently. The reference is a per-row brute force —
O(n^2) and obviously correct, independent of both Spark and DuckDB."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.operators.asof import asof_latest_prior, temporal_join

_settings = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small cardinalities force collisions: few users/keys, tiny time range
_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 5),  # ts
        st.booleans(),  # True = anchor, False = lookup
    ),
    max_size=20,
)


@_settings
@given(rows=_events)
def test_asof_latest_prior_matches_bruteforce(spark, rows):
    data = [
        (i, u, t, "anchor" if is_anchor else "lookup")
        for i, (u, t, is_anchor) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data or [(0, 0, 0, "x")], "id int, user int, ts int, etype string"
    ).limit(len(data))

    got = {
        (r.id, r.user, r.prior_ts)
        for r in asof_latest_prior(
            df,
            user_col="user",
            time_col="ts",
            type_col="etype",
            anchor_type="anchor",
            lookup_type="lookup",
            id_col="id",
            out_col="prior_ts",
        ).collect()
    }

    expected = set()
    for i, u, t, etype in data:
        if etype != "anchor":
            continue
        prior = [
            lt for (_, lu, lt, le) in data if le == "lookup" and lu == u and lt <= t
        ]
        if prior:
            expected.add((i, u, max(prior)))
    assert got == expected


_dims = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.text(max_size=3)),
    max_size=12,
)
_facts = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5)),
    max_size=12,
)


@_settings
@given(dims=_dims, facts=_facts, how=st.sampled_from(["inner", "left"]))
def test_temporal_join_matches_bruteforce(spark, dims, facts, how):
    # the operator's contract requires dim versions unique per (key, time)
    dim_rows = list({(k, t): v for k, t, v in dims}.items())
    dim_data = [(k, t, v) for (k, t), v in dim_rows]
    fact_data = [(i, k, t) for i, (k, t) in enumerate(facts)]

    dim = spark.createDataFrame(
        dim_data or [(0, 0, "")], "key int, vt int, payload string"
    ).limit(len(dim_data))
    fact = spark.createDataFrame(
        fact_data or [(0, 0, 0)], "fact_id int, key int, vt int"
    ).limit(len(fact_data))

    got = {
        (r.fact_id, r.key, r.vt, r.payload)
        for r in temporal_join(
            fact,
            dim,
            key_cols=["key"],
            time_col="vt",
            payload_cols=["payload"],
            how=how,
        ).collect()
    }

    expected = set()
    for i, k, t in fact_data:
        versions = [(dt, v) for dk, dt, v in dim_data if dk == k and dt <= t]
        if versions:
            expected.add((i, k, t, max(versions)[1]))
        elif how == "left":
            expected.add((i, k, t, None))
    assert got == expected
