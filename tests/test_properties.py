"""Property-based tests (SURVEY.md §5.2.5): algebraic identities of the
set operators, dedup idempotency, and fitness guard invariants, over
hypothesis-generated inputs. Spark actions are slow, so examples are few
and the per-example deadline is disabled; failures still shrink."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiomix_aws_emr_spark.fs.fitness import WORST_FITNESS, cv_linear_cox_fitness

_settings = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_small_ints = st.lists(st.integers(min_value=-5, max_value=5), max_size=12)


@_settings
@given(a=_small_ints, b=_small_ints)
def test_set_algebra_identities(spark, a, b):
    da = spark.createDataFrame([(v,) for v in a] or [(0,)], "k int").limit(len(a))
    db = spark.createDataFrame([(v,) for v in b] or [(0,)], "k int").limit(len(b))

    union_all = da.union(db)
    assert union_all.count() == len(a) + len(b)

    union_distinct = sorted(r.k for r in da.union(db).distinct().collect())
    assert union_distinct == sorted(set(a) | set(b))

    intersect = sorted(r.k for r in da.intersect(db).collect())
    assert intersect == sorted(set(a) & set(b))

    except_ = sorted(r.k for r in da.exceptAll(db).collect())
    # multiset difference semantics of EXCEPT ALL
    from collections import Counter

    expected = sorted((Counter(a) - Counter(b)).elements())
    assert except_ == expected


@_settings
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), max_size=16))
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows or [(0, 0)], "a int, b int").limit(len(rows))
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice == sorted(set(rows))


@given(
    n=st.integers(min_value=4, max_value=24),
    seed=st.integers(min_value=0, max_value=2**16),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_fitness_guards(n, seed):
    rng = np.random.RandomState(seed)
    x = rng.normal(size=(n, 3))
    time = rng.uniform(1, 100, n)
    event = np.ones(n, dtype=bool)
    ids = np.array([f"S{i}" for i in range(n)])

    # zero-width matrix -> worst sentinel (R13, core.py:52-77)
    assert cv_linear_cox_fitness(x[:, :0], time, event, ids) == WORST_FITNESS
    # fitness is a C-index: bounded in [0, 1]
    f = cv_linear_cox_fitness(x, time, event, ids, folds=3)
    assert f == WORST_FITNESS or 0.0 <= f <= 1.0
    # deterministic in all inputs
    assert f == cv_linear_cox_fitness(x, time, event, ids, folds=3)
