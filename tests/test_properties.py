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


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """graph_pagerank vs a direct NumPy implementation of the same
    3-iteration damped walk on the same trade matrix — independent of
    the DuckDB oracle (which shares the SQL formulation)."""
    import numpy as np

    from multiomix_aws_emr_spark.queries import QUERIES

    got = {
        r.node: r.pagerank
        for r in QUERIES["graph_pagerank"](spark, sf_dir).collect()
    }

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter("s_nationkey <> c_nationkey")
        .groupBy("s_nationkey", "c_nationkey")
        .count()
        .collect()
    )
    n = 25
    w = np.zeros((n, n))
    for r in edges:
        w[r.s_nationkey][r.c_nationkey] = r["count"]
    out = w.sum(axis=1)
    p = np.divide(w, out[:, None], out=np.zeros_like(w), where=out[:, None] > 0)
    pr = np.full(n, 1.0 / n)
    for _ in range(3):
        pr = 0.15 / n + 0.85 * (p.T @ pr)
    for node in range(n):
        assert abs(got[node] - round(float(pr[node]), 6)) <= 1e-6, node


def test_cox_score_screen_matches_numpy(spark, sf_dir):
    """omics_cox_score_screen vs a direct NumPy evaluation of
    U = sum(x_i - mean_at_risk), V = sum(var_at_risk) under the same
    (lifetime DESC, user_id) ordering convention."""
    import numpy as np

    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.sources.tables import events_v

    got = {
        r.feature: (r.score_u, r.score_v, r.chi2)
        for r in QUERIES["omics_cox_score_screen"](spark, sf_dir).collect()
    }

    ev = events_v(spark, sf_dir).select(
        "user_id", "event_type", "ts_ms", "value"
    ).collect()
    t0, t1, vals = {}, {}, {}
    for r in ev:
        if r.event_type == "signup":
            t0[r.user_id] = min(t0.get(r.user_id, r.ts_ms), r.ts_ms)
        elif r.event_type == "error":
            t1[r.user_id] = min(t1.get(r.user_id, r.ts_ms), r.ts_ms)
        elif r.event_type in ("click", "view", "purchase"):
            vals.setdefault((r.user_id, r.event_type), []).append(r.value)
    life = {
        u: t1[u] - t0[u]
        for u in t0
        if u in t1 and t1[u] >= t0[u]
    }
    for feature in ("click", "view", "purchase"):
        rows = [
            (life[u], u, float(np.mean(vs)))
            for (u, f), vs in vals.items()
            if f == feature and u in life
        ]
        rows.sort(key=lambda r: (-r[0], r[1]))
        x = np.array([r[2] for r in rows])
        rn = np.arange(1, len(x) + 1)
        cum_x = np.cumsum(x)
        cum_x2 = np.cumsum(x * x)
        u_stat = float((x - cum_x / rn).sum())
        v_stat = float((cum_x2 / rn - (cum_x / rn) ** 2).sum())
        eu, ev_, ec = got[feature]
        assert abs(eu - round(u_stat, 4)) <= 1e-4, feature
        assert abs(ev_ - round(v_stat, 4)) <= 1e-4, feature
        assert abs(ec - round(u_stat * u_stat / v_stat, 4)) <= 1e-3, feature


_texts = st.lists(
    st.text(min_size=0, max_size=40),
    min_size=1,
    max_size=25,
    unique=True,
)


@_settings
@given(texts=_texts)
def test_phash60_three_engine_identity(spark, texts):
    """The portable hash contract (functions/porthash.py): Spark's
    conv(substring(md5)) formulation, DuckDB's CAST('0x'||substr(md5))
    formulation, and the definitional Python int(md5(utf8)[:15], 16) must
    agree bit for bit on arbitrary unicode — this identity is what makes
    every sketch-based oracle (MinHash/SimHash/sampling/curation)
    cross-engine checkable."""
    import hashlib

    import duckdb
    import pandas as pd

    from multiomix_aws_emr_spark.functions.porthash import phash60, phash60_sql

    pyref = {
        t: int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        for t in texts
    }
    sdf = spark.createDataFrame([(t,) for t in texts], "t string").withColumn(
        "h", phash60("t")
    )
    assert {r.t: r.h for r in sdf.collect()} == pyref

    con = duckdb.connect()
    con.register("tt", pd.DataFrame({"t": texts}))
    duck = dict(con.sql(f"SELECT t, {phash60_sql('t')} AS h FROM tt").fetchall())
    assert duck == pyref


@_settings
@given(texts=_texts)
def test_phash_pair_km_family_bounds(spark, texts):
    """The Kirsch-Mitzenmacher pair (a, b) from ONE md5: a < 2^60,
    b < 2^56, so every family member a + i*b (i <= 15) stays below 2^61 —
    inside ANSI-checked signed-long range (no overflow at any scale), and
    the Spark pair must match the definitional digest slices."""
    import hashlib

    from pyspark.sql import functions as F

    from multiomix_aws_emr_spark.functions.porthash import phash_pair

    a_col, b_col = phash_pair("t")
    rows = (
        spark.createDataFrame([(t,) for t in texts], "t string")
        .select("t", a_col.alias("a"), b_col.alias("b"))
        .collect()
    )
    for r in rows:
        digest = hashlib.md5(r.t.encode("utf-8")).hexdigest()
        assert r.a == int(digest[:15], 16)
        assert r.b == int(digest[16:30], 16)
        assert 0 <= r.a < 1 << 60 and 0 <= r.b < 1 << 56
        assert r.a + 15 * r.b < 1 << 61
