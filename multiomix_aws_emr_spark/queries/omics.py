"""Omics-pipeline surface as declared queries. The BBHA metaheuristic is
iterative + seeded-random (not SQL-expressible), so its declared queries
ship the invariant-grid contract (_BBHA_ORACLE) a DuckDB twin CAN state
exactly; the raw fitness histories stay on the BBHAResult API
(SURVEY.md §2.2 contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load


#: Invariant-grid oracle for the BBHA history (8 stars x 2 iterations,
#: plus the R34 all-features baseline row at (-1, -1) — `scripts/
#: core.py:171-179`): the run must emit exactly the full (iteration,
#: star) grid AND the baseline row, every fitness must be a valid CV
#: concordance (in [0, 1], or the -1.0 zero-feature guard value —
#: fs/fitness.py:30), and every mask width must stay within the 16-dim
#: feature space. A crashed star, a NaN fitness, a mask escaping the
#: space, or a missing baseline evaluation each breaks the hash.
_BBHA_ORACLE = """
SELECT CAST(-1 AS INTEGER) AS iteration, CAST(-1 AS INTEGER) AS star_id,
       TRUE AS fitness_ok, TRUE AS nf_ok
UNION ALL
SELECT CAST(t.i // 8 AS INTEGER) AS iteration,
       CAST(t.i % 8 AS INTEGER) AS star_id,
       TRUE AS fitness_ok,
       TRUE AS nf_ok
FROM range(0, 16) t(i)
"""


def _bbha_invariant_view(history: DataFrame) -> DataFrame:
    """Project a BBHA history onto the oracle-checkable invariant grid
    (see _BBHA_ORACLE). The raw per-star fitness values stay available
    from run_bbha / BBHAResult.history_df — seeded-random iterative
    search has no SQL twin, but its contract does."""
    return history.select(
        "iteration",
        "star_id",
        (
            (F.col("fitness") == F.lit(-1.0))
            | F.col("fitness").between(0.0, 1.0)
        ).alias("fitness_ok"),
        F.col("n_features").between(0, 16).alias("nf_ok"),
    )


@query("fs_bbha_embeddings", oracle=_BBHA_ORACLE)
def fs_bbha_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBHA feature selection (the reference's core job,
    `scripts/metaheuristics.py:468-734`) driven end-to-end on harness data:
    samples = embedding vectors, features = their first 16 dims, survival
    time = a deterministic function of 3 'informative' dims. Emits the
    oracle-checkable invariant view of the per-(iteration, star) history
    (_bbha_invariant_view); the tidy fitness history itself (D6) remains
    the BBHAResult.history_df API surface."""
    from multiomix_aws_emr_spark.fs.bbha import run_bbha

    rows = (
        load(spark, sf_dir, "embeddings")
        # vec_id < 200 == first 200 ids, as a pushed-down scan filter (no
        # global sort); slice the 16 dims server-side so the bounded
        # driver collect moves 16 floats/row, not the full vector
        .filter(F.col("vec_id") < 200)
        .select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
        .collect()
    )
    rows = sorted(rows, key=lambda r: r.vec_id)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    x = pd.DataFrame(
        mat,
        index=[r.vec_id for r in rows],
        columns=[f"dim_{i}" for i in range(16)],
    )
    # Deterministic survival signal carried by dims 0..2.
    time_col = 100.0 + 20.0 * (mat[:, 0] + mat[:, 1] + mat[:, 2])
    event_col = np.ones(len(rows), dtype=bool)

    result = run_bbha(
        spark,
        x,
        time_col,
        event_col,
        n_stars=8,
        n_iterations=2,
        random_state=42,
    )
    return _bbha_invariant_view(result.history_df(spark))


_KM_ORACLE = """
WITH events_v AS (
  SELECT epoch_ms(ts) AS ts_ms, user_id, event_type FROM events
), surv AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t0,
         MIN(CASE WHEN event_type = 'error' THEN ts_ms END) AS t1
  FROM events_v GROUP BY user_id
), life AS (
  SELECT user_id,
         CASE WHEN t1 IS NOT NULL AND t1 >= t0 THEN t1 - t0
              ELSE NULL END AS lifetime_ms
  FROM surv WHERE t0 IS NOT NULL
), risk AS (
  SELECT lifetime_ms AS t, CAST(COUNT(*) AS BIGINT) AS d,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM life) AS n_total
  FROM life WHERE lifetime_ms IS NOT NULL GROUP BY lifetime_ms
), ordered AS (
  SELECT t, d,
         CAST(n_total
           - COALESCE(SUM(d) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_at_risk
  FROM risk
)
SELECT t AS lifetime_ms, d AS n_events, n_at_risk,
       ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_at_risk))
             OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 4) AS km_survival
FROM ordered WHERE n_at_risk > d
"""


@query("omics_kaplan_meier", oracle=_KM_ORACLE)
def omics_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve — the reference's survival-analysis
    domain (clinical D2: (event, time) records; `scripts/utils.py:59-62`)
    as a pure relational query over the event log: per-user lifetime =
    signup -> first error (censored when error-free, which only affects
    the at-risk denominator through total count here since all observed
    lifetimes share one origin cohort).

    Shape: one grouped pass builds the (time, deaths) risk table, a
    window cumsum derives the at-risk counts, and the product-limit
    estimator S(t) = prod(1 - d_i/n_i) computes as exp(cumsum(ln)) in a
    second window pass — no iteration, no UDF, identical plan at any
    cohort size (the risk table has one row per distinct event time).
    Rows where everyone at risk dies (n == d) are excluded (S hits 0;
    ln undefined) — same filter in the oracle.
    """
    from multiomix_aws_emr_spark.sources.tables import events_v
    from pyspark.sql.window import Window

    ev = events_v(spark, sf_dir)
    surv = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts_ms"))).alias("t1"),
    )
    life = surv.filter(F.col("t0").isNotNull()).select(
        F.when(
            F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0")),
            F.col("t1") - F.col("t0"),
        ).alias("lifetime_ms")
    )
    n_total = life.agg(F.count(F.lit(1)).alias("n_total"))
    risk = (
        life.filter(F.col("lifetime_ms").isNotNull())
        .groupBy(F.col("lifetime_ms").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
        .crossJoin(F.broadcast(n_total))
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    ordered = risk.select(
        "t",
        "d",
        (
            F.col("n_total") - F.coalesce(F.sum("d").over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    km = F.round(
        F.exp(
            F.sum(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_at_risk"))
            ).over(w_cum)
        ),
        4,
    )
    # filter BEFORE the window pass — SQL WHERE runs before window
    # evaluation, so the oracle's cumulative product never sees the
    # excluded all-die row either
    return ordered.filter(F.col("n_at_risk") > F.col("d")).select(
        F.col("t").alias("lifetime_ms"),
        F.col("d").alias("n_events"),
        "n_at_risk",
        km.alias("km_survival"),
    )


_LOGRANK_CTES = """
counts AS (
  SELECT lifetime_ms AS t, grp,
         SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
         COUNT(*) AS c
  FROM life GROUP BY 1, 2
), totals AS (
  SELECT grp, SUM(c) AS total_g FROM counts GROUP BY grp
), times AS (
  SELECT DISTINCT t FROM counts
), grid AS (
  SELECT times.t, totals.grp, totals.total_g FROM times CROSS JOIN totals
), dense AS (
  SELECT g.t, g.grp,
         COALESCE(c.d, 0) AS d, COALESCE(c.c, 0) AS c, g.total_g
  FROM grid g LEFT JOIN counts c ON c.t = g.t AND c.grp = g.grp
), at_risk AS (
  SELECT t, grp, d,
         total_g - COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_g
  FROM dense
), per_time AS (
  SELECT t, grp, d, n_g,
         SUM(d) OVER (PARTITION BY t) AS d_tot,
         SUM(n_g) OVER (PARTITION BY t) AS n_tot
  FROM at_risk
), oe AS (
  SELECT grp,
         SUM(d) AS o_g,
         SUM(CAST(d_tot AS DOUBLE) * n_g / n_tot) AS e_g
  FROM per_time WHERE d_tot > 0 AND n_tot > 0 GROUP BY grp
)
SELECT CAST(grp AS INTEGER) AS grp, CAST(o_g AS BIGINT) AS observed,
       ROUND(e_g, 4) AS expected,
       ROUND(SUM((o_g - e_g) * (o_g - e_g) / e_g) OVER (), 4) AS chi2
FROM oe
"""

_LOGRANK_SQL = "WITH " + _LOGRANK_CTES


def _life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, lifetime_ms, observed): signup -> first-error lifetimes with
    right-censoring at each user's last seen event; cohorts = user_id
    parity."""
    from multiomix_aws_emr_spark.sources.tables import events_v

    ev = events_v(spark, sf_dir)
    surv = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts_ms"))).alias("t1"),
        F.max("ts_ms").alias("t_end"),
    )
    return (
        surv.filter(F.col("t0").isNotNull())
        .select(
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.when(
                F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0")),
                F.col("t1") - F.col("t0"),
            )
            .otherwise(F.col("t_end") - F.col("t0"))
            .alias("lifetime_ms"),
            (F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0"))).alias(
                "observed"
            ),
        )
        .filter(F.col("lifetime_ms") >= 0)
    )


@query(
    "omics_logrank_test",
    oracle=(
        "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, user_id, event_type "
        "FROM events), surv AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t0, "
        "MIN(CASE WHEN event_type = 'error' THEN ts_ms END) AS t1, "
        "MAX(ts_ms) AS t_end FROM events_v GROUP BY user_id), "
        "life AS (SELECT CAST(user_id % 2 AS INTEGER) AS grp, "
        "CASE WHEN t1 IS NOT NULL AND t1 >= t0 THEN t1 - t0 "
        "ELSE t_end - t0 END AS lifetime_ms, "
        "(t1 IS NOT NULL AND t1 >= t0) AS observed "
        "FROM surv WHERE t0 IS NOT NULL "
        "AND (CASE WHEN t1 IS NOT NULL AND t1 >= t0 THEN t1 - t0 "
        "ELSE t_end - t0 END) >= 0), "
    )
    + _LOGRANK_CTES,
)
def omics_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test (the survival-curve comparison behind the
    clustering fitness, fs/fitness.py logrank_chi2) as ONE SQL text run
    identically in both engines over a DataFrame-built life table:
    censoring included, at-risk sets from a per-group window cumsum over
    the dense (time x group) grid — one row per distinct lifetime per
    group, so the plan is cohort-size independent (never per-user
    quadratic). Output: per-group observed/expected + the chi-square
    statistic (numpy-cross-checked in tests)."""
    _life_table(spark, sf_dir).createOrReplaceTempView("life")
    return spark.sql(_LOGRANK_SQL)


_COX_SCREEN_ORACLE = """
WITH events_v AS (
  SELECT epoch_ms(ts) AS ts_ms, user_id, event_type, value FROM events
), surv AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t0,
         MIN(CASE WHEN event_type = 'error' THEN ts_ms END) AS t1
  FROM events_v GROUP BY user_id
), life AS (
  SELECT user_id, t1 - t0 AS lifetime_ms FROM surv
  WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
), feat AS (
  SELECT user_id, event_type AS feature, AVG(value) AS x
  FROM events_v WHERE event_type IN ('click', 'view', 'purchase')
  GROUP BY user_id, event_type
), xmat AS (
  SELECT l.user_id, l.lifetime_ms, f.feature, COALESCE(f.x, 0.0) AS x
  FROM life l JOIN feat f ON l.user_id = f.user_id
), ranked AS (
  SELECT feature, x,
         ROW_NUMBER() OVER w AS rn,
         SUM(x) OVER w AS cum_x,
         SUM(x * x) OVER w AS cum_x2
  FROM xmat
  WINDOW w AS (PARTITION BY feature ORDER BY lifetime_ms DESC, user_id
               ROWS UNBOUNDED PRECEDING)
), terms AS (
  SELECT feature,
         x - cum_x / rn AS u_i,
         cum_x2 / rn - (cum_x / rn) * (cum_x / rn) AS v_i
  FROM ranked
)
SELECT feature, ROUND(SUM(u_i), 4) AS score_u,
       ROUND(SUM(v_i), 4) AS score_v,
       ROUND(SUM(u_i) * SUM(u_i) / NULLIF(SUM(v_i), 0), 4) AS chi2
FROM terms GROUP BY feature
"""


@query("omics_cox_score_screen", oracle=_COX_SCREEN_ORACLE)
def omics_cox_score_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature univariate Cox SCORE-test screening — the multi-omics
    'which molecules associate with survival' pass (the reference runs a
    full CV model per candidate subset; the screening tier runs a
    closed-form statistic per feature first) re-expressed as one
    relational plan over a long (sample, feature, value) layout.

    For each feature, samples sort by survival time DESCENDING so the
    at-risk set at each failure is exactly the window prefix: running
    count/sum/sum-of-squares give the at-risk mean and variance of the
    covariate, and the score statistic is U = sum(x_i - mean_at_risk),
    V = sum(var_at_risk), chi2 = U^2/V (all observed events; tie order
    pinned by (lifetime DESC, user_id) in both engines). ONE window pass
    per feature partition — the plan is feature-parallel and scales to
    millions of features by adding partitions, never driver state.
    Here the 'features' are per-user mean event values (click/view/
    purchase) against the signup->error lifetime, matching the engine's
    survival fixtures."""
    from pyspark.sql.window import Window

    from multiomix_aws_emr_spark.sources.tables import events_v

    ev = events_v(spark, sf_dir)
    surv = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts_ms"))).alias("t1"),
    )
    life = surv.filter(
        F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
        & (F.col("t1") >= F.col("t0"))
    ).select("user_id", (F.col("t1") - F.col("t0")).alias("lifetime_ms"))
    feat = (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("user_id", F.col("event_type").alias("feature"))
        .agg(F.avg("value").alias("x"))
    )
    xmat = life.join(feat, "user_id").select(
        "user_id", "lifetime_ms", "feature", F.coalesce("x", F.lit(0.0)).alias("x")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy(F.col("lifetime_ms").desc(), "user_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = xmat.select(
        "feature",
        "x",
        F.row_number().over(
            Window.partitionBy("feature").orderBy(
                F.col("lifetime_ms").desc(), "user_id"
            )
        ).alias("rn"),
        F.sum("x").over(w).alias("cum_x"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("cum_x2"),
    )
    mean_r = F.col("cum_x") / F.col("rn")
    terms = ranked.select(
        "feature",
        (F.col("x") - mean_r).alias("u_i"),
        (F.col("cum_x2") / F.col("rn") - mean_r * mean_r).alias("v_i"),
    )
    su, sv = F.sum("u_i"), F.sum("v_i")
    return terms.groupBy("feature").agg(
        F.round(su, 4).alias("score_u"),
        F.round(sv, 4).alias("score_v"),
        F.round(su * su / F.nullif(sv, F.lit(0)), 4).alias("chi2"),
    )


@query("fs_bbha_improved", oracle=_BBHA_ORACLE)
def fs_bbha_improved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMPROVED BBHA variant (the reference's flag-gated TODO,
    `scripts/metaheuristics.py:342-465`; SURVEY.md §7.6) driven
    end-to-end: reciprocal event horizon, single-dimension capture
    toggle, and personal-best-blended position updates with
    iteration-decaying coefficients. Same fixture and oracle contract as
    fs_bbha_embeddings (_bbha_invariant_view over the same star grid), so
    the two variants' histories are directly comparable."""
    from multiomix_aws_emr_spark.fs.bbha import run_bbha

    rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
        .collect()
    )
    rows = sorted(rows, key=lambda r: r.vec_id)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    x = pd.DataFrame(
        mat,
        index=[r.vec_id for r in rows],
        columns=[f"dim_{i}" for i in range(16)],
    )
    time_col = 100.0 + 20.0 * (mat[:, 0] + mat[:, 1] + mat[:, 2])
    event_col = np.ones(len(rows), dtype=bool)
    result = run_bbha(
        spark, x, time_col, event_col,
        n_stars=8, n_iterations=2, random_state=42,
        variant="improved", coeff_1=2.2, coeff_2=0.1,
    )
    return _bbha_invariant_view(result.history_df(spark))
