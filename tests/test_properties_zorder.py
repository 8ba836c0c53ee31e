"""Property-based tests for the z-order operator (SURVEY.md §5.2.5): the
JVM bit-interleave expression vs a pure-Python Morton reference, and the
min-max scaler's contract. The pruning probe's 9.5-32x data-skipping
numbers rest on this encoding actually being the Morton curve — bit b of
dimension d at position b*ndims+d, injective over the scaled domain —
so pin the arithmetic itself, engine vs reference, under hypothesis."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.zorder import scale_to_bits, zvalue

_settings = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BITS = 6  # small domain so hypothesis explores collisions and corners


def _morton_ref(coords: tuple, bits: int) -> int:
    ndims = len(coords)
    out = 0
    for d, v in enumerate(coords):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * ndims + d)
    return out


_pairs = st.lists(
    st.tuples(st.integers(0, (1 << _BITS) - 1), st.integers(0, (1 << _BITS) - 1)),
    min_size=1,
    max_size=16,
)


@_settings
@given(pairs=_pairs)
def test_zvalue_matches_python_morton_and_is_injective(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zvalue(["x", "y"], bits=_BITS)).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref((x, y), _BITS), (x, y)
    # injectivity over the scaled domain: distinct inputs, distinct codes
    assert len(set(got.values())) == len(got)


@_settings
@given(
    triples=st.lists(
        st.tuples(*[st.integers(0, (1 << _BITS) - 1)] * 3),
        min_size=1,
        max_size=10,
    )
)
def test_zvalue_three_dims_matches_reference(spark, triples):
    df = spark.createDataFrame(triples, "x long, y long, w long")
    for r in df.withColumn("z", zvalue(["x", "y", "w"], bits=_BITS)).collect():
        assert r.z == _morton_ref((r.x, r.y, r.w), _BITS)


@_settings
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=16),
)
def test_scale_to_bits_bounds_and_monotonicity(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    lo, hi = min(vals), max(vals)
    rows = (
        df.withColumn(
            "s", scale_to_bits(F.col("v"), F.lit(lo), F.lit(hi), bits=_BITS)
        )
        .orderBy("v")
        .collect()
    )
    top = (1 << _BITS) - 1
    assert all(0 <= r.s <= top for r in rows)
    # monotone nondecreasing in the input
    assert all(a.s <= b.s for a, b in zip(rows, rows[1:]))
    if lo == hi:
        assert all(r.s == 0 for r in rows)  # degenerate range maps to 0
    else:
        # the extremes use the full scale
        assert rows[0].s == 0 and rows[-1].s == top
