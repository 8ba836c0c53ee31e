"""Binary Black Hole Algorithm (BBHA) feature selection, Spark-native.

Re-founds the reference's core compute job
(`scripts/metaheuristics.py:468-734`) on DataFrame + Arrow primitives:

- star population: a small driver-side list of (star_id, mask) pairs (D3);
  the reference's `sc.parallelize` + pinned `partitionBy` + `mapPartitions`
  (`metaheuristics.py:248,297-299`, R7/R8/R9) becomes
  ``createDataFrame`` + a planned ``bin_id`` column +
  ``groupBy('bin_id').applyInPandas`` (Arrow-vectorized, SURVEY.md §4.2);
- the molecules matrix ships once per executor via ``sc.broadcast``
  (`scripts/core.py:167-169`, R12/P1 — unchanged, it is the right tool);
- per-iteration driver loop: arg-best black-hole selection with the
  fewer-features tie-break (`metaheuristics.py:647-681`, R14/R15), the
  Euclidean event-horizon test (`:683-694`, R16), the tanh position update
  (`:696-705`, R17), seeded random re-initialization (`:307-327`, R18);
- the bounded ``collect`` of n_stars fitness rows per iteration matches
  the reference's synchronous loop (`:300`, R11/P7) — the only driver
  materialization in the engine, O(n_stars), independent of data size;
- per-host runtime accounting (`:617-645,707-714`, R19/R20) is re-emitted
  as a tidy metrics DataFrame instead of a dict of parallel lists (D6).

Algorithm semantics follow the published BBHA (Hatamlou 2013, "Black hole:
a new heuristic optimization approach"; binary variant as described in the
reference's docstrings). Documented deviations from the reference's loop
(search trajectories therefore differ; the final contract — best mask by
CV fitness with the fewer-features tie-break — is the same):

- RNG stream: NOT a bit-for-bit replay (NumPy legacy RandomState calls
  differ), but seed threading has the same shape — star i initializes
  from seed ``random_state * (i + 1)`` (`metaheuristics.py:524-527`) and
  the loop RNG from ``random_state``.
- Update/capture order: this loop applies the position update and THEN
  tests event-horizon capture on the updated star; the reference captures
  first and only updates survivors (`metaheuristics.py:683-705`). The
  paper's formulation evaluates capture on current positions, so both
  orders are published-BBHA-consistent; this one keeps the update
  vectorizable over the whole population.
- Horizon denominator: the radius here is ``f_bh / sum(all fitnesses)``
  — the paper's definition. The reference computes ``f_bh /
  np.sum(f_a)`` where ``f_a`` is a scalar, making an effectively
  per-star horizon ``f_bh / f_a`` (`metaheuristics.py:684-694`); that
  form captures far more aggressively. The paper form is kept
  deliberately.
"""

from __future__ import annotations

import json
import socket
import time as _time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.fs.costmodel import (
    RuntimeCostModel,
    plan_star_bins,
)
from multiomix_aws_emr_spark.fs.fitness import (
    WORST_FITNESS,
    cv_linear_cox_fitness,
)

FitnessFn = Callable[[np.ndarray, np.ndarray, np.ndarray, np.ndarray], float]


def random_mask(n_features: int, rng: np.random.RandomState) -> np.ndarray:
    """Seeded random subset: random number of ones, shuffled positions
    (semantics of `metaheuristics.py:307-327`, R18)."""
    n_ones = rng.randint(1, n_features + 1)
    mask = np.zeros(n_features, dtype=np.int32)
    mask[:n_ones] = 1
    rng.shuffle(mask)
    return mask


@dataclass
class BBHAResult:
    best_mask: np.ndarray
    best_fitness: float
    selected_features: list[str]
    n_iterations: int
    execution_time: float
    history: list[dict] = field(default_factory=list)
    #: R34 (`scripts/core.py:171-179`): CV fitness of the all-features
    #: mask, evaluated once before the search as the comparison baseline.
    baseline_fitness: Optional[float] = None

    def history_df(self, spark: SparkSession) -> DataFrame:
        """Per-(iteration, star) metrics as a tidy DataFrame — replaces the
        reference's dict-of-parallel-lists result (D6)."""
        return spark.createDataFrame(
            pd.DataFrame(self.history),
            schema=(
                "iteration int, star_id int, fitness double, n_features int, "
                "exec_time double, hostname string"
            ),
        )

    def host_metrics_df(self, spark: SparkSession) -> DataFrame:
        """Per-host per-iteration busy time (`metaheuristics.py:617-645`,
        R19) with population-σ summary stats (`:707-714`, R20) left to the
        caller via stddev_pop."""
        h = self.history_df(spark)
        return h.groupBy("hostname", "iteration").agg(
            F.round(F.sum("exec_time"), 4).alias("busy_sec"),
            F.count(F.lit(1)).alias("n_stars"),
        )

    def to_result_json(self) -> str:
        """The reference's result.json shape (`scripts/core.py:277-285`,
        R24): features as a ' | '-joined string + scalars, including the
        all-features baseline under the reference's own key name
        (``best_metric_with_all_features``, `core.py:282`, R34)."""
        payload = {
            "features": " | ".join(self.selected_features),
            "best_metric": round(self.best_fitness, 4),
            "n_iterations": self.n_iterations,
            "execution_time": round(self.execution_time, 4),
        }
        if self.baseline_fitness is not None:
            payload["best_metric_with_all_features"] = round(
                self.baseline_fitness, 4
            )
        return json.dumps(payload)


class _ClosureValue:
    """Duck-typed stand-in for a Broadcast when ``use_broadcast=False``
    (the reference's `--use-broadcast false` path, `scripts/core.py` /
    `parameters.py:100-102`): the payload rides inside each task's
    serialized closure instead of the torrent-distributed broadcast —
    re-shipped per task rather than once per executor. Kept as an
    explicit toggle for parity and for A/B-ing distribution cost; the
    broadcast default is the right choice at any real scale."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


def _payload_handle(sc, payload: dict, use_broadcast: bool):
    """The evaluator's data handle: a real Broadcast, or the closure
    wrapper when broadcast is disabled."""
    return sc.broadcast(payload) if use_broadcast else _ClosureValue(payload)


def _make_evaluator(bc, fitness_fn: FitnessFn, worst_fitness: float = WORST_FITNESS):
    """Grouped-map evaluator: one Arrow batch per bin, one fitness call per
    star in the bin (the reference's mapPartitions body,
    `metaheuristics.py:214-222` + zero-feature guard `core.py:52-77`).

    ``worst_fitness`` is the zero-feature sentinel; callers whose fitness
    is unbounded below (clustering ``log_likelihood`` scoring) must pass
    ``float('-inf')`` — the reference's NEG_INF (`scripts/core.py:74`) —
    so the empty subset can never outrank a valid one."""

    def evaluate(pdf: pd.DataFrame) -> pd.DataFrame:
        payload = bc.value
        x = payload["values"]
        out = []
        host = socket.gethostname()
        for star_id, mask in zip(pdf["star_id"], pdf["mask"]):
            m = np.asarray(mask, dtype=np.int32)
            start = _time.perf_counter()
            if m.sum() == 0:
                fit = worst_fitness  # R13: never evaluate the empty subset
            else:
                fit = fitness_fn(
                    x[:, m == 1],
                    payload["time"],
                    payload["event"],
                    payload["sample_ids"],
                )
            out.append(
                (
                    int(star_id),
                    float(fit),
                    int(m.sum()),
                    _time.perf_counter() - start,
                    host,
                )
            )
        return pd.DataFrame(
            out, columns=["star_id", "fitness", "n_features", "exec_time", "hostname"]
        )

    return evaluate


_EVAL_SCHEMA = (
    "star_id int, fitness double, n_features int, exec_time double, hostname string"
)


def evaluate_all_features_baseline(
    spark: SparkSession, evaluator, n_features: int
) -> dict:
    """R34 (`scripts/core.py:171-179`): evaluate ``np.ones(n_features)``
    once before the metaheuristic, through the SAME grouped-Arrow
    evaluator the search uses (the reference routes it through the same
    ``compute_cross_validation``), so the baseline is measured under
    identical CV folds, seeding, and executor placement. One 1-row Spark
    job; returned as a history-row dict with the reserved coordinates
    ``iteration=-1, star_id=-1``."""
    sdf = spark.createDataFrame(
        [(-1, 0, [1] * n_features)],
        schema="star_id int, bin_id int, mask array<int>",
    )
    row = sdf.groupBy("bin_id").applyInPandas(evaluator, _EVAL_SCHEMA).collect()[0]
    return {
        "iteration": -1,
        "star_id": -1,
        "fitness": float(row.fitness),
        "n_features": int(row.n_features),
        "exec_time": float(row.exec_time),
        "hostname": row.hostname,
    }


#: Admissible improved-variant coefficients (`metaheuristics.py:358-367`,
#: from Gholizadeh/Razavi/Shojaei, "Improved black hole and multiverse
#: algorithms for discrete sizing optimization of planar structures").
IMPROVED_COEFF_1 = (2.2, 2.35)
IMPROVED_COEFF_2 = (0.1, 0.2, 0.3)


def run_bbha(
    spark: SparkSession,
    x: pd.DataFrame,
    time_col: np.ndarray,
    event_col: np.ndarray,
    *,
    n_stars: int = 10,
    n_iterations: int = 5,
    random_state: int = 42,
    binarization_threshold: Optional[float] = 0.6,
    n_bins: Optional[int] = None,
    cost_fn: Optional[Callable[[np.ndarray], float]] = None,
    fitness_fn: FitnessFn = cv_linear_cox_fitness,
    variant: str = "classic",
    coeff_1: float = 2.2,
    coeff_2: float = 0.1,
    use_load_balancer: bool = True,
    use_broadcast: bool = True,
    worst_fitness: float = WORST_FITNESS,
) -> BBHAResult:
    """Run BBHA feature selection over a samples x features pandas frame.

    ``x`` is broadcast once (bounded: the molecules matrix — the star
    population, not the data, is what distributes). Load balancing
    (R30/R31): an explicit ``cost_fn`` injects a predictor directly;
    otherwise a :class:`RuntimeCostModel` self-fits on the
    (n_features, exec_time) observations of completed iterations and,
    once ready, steers greedy bin-packing — iteration 0 (and any
    constant-width population) falls back to the sequential partitioner
    (R8), the reference's own no-model behavior.

    ``use_load_balancer=False`` (the reference's `--use-load-balancer
    false`, `scripts/parameters.py:91-93`) forces the sequential
    partitioner for every iteration — no cost model is trained and an
    injected ``cost_fn`` is ignored. ``use_broadcast=False``
    (`--use-broadcast false`) ships the molecules payload in each task
    closure instead of a Broadcast (see :class:`_ClosureValue`). Both
    default to the reference parser's defaults ('true'); results are
    identical either way — the toggles trade distribution/packing cost
    only.

    ``variant='improved'`` applies the three modifications of the improved
    BBHA the reference gates behind a flag (`metaheuristics.py:342-465`,
    a declared TODO there — SURVEY.md §7.6):

    1. event horizon ``(1/f_bh) / sum(1/f)`` instead of ``f_bh / sum(f)``
       (`:441`);
    2. a captured star toggles ONE random dimension instead of full
       re-initialization (`:449-451`);
    3. the position update blends attraction to the black hole with the
       star's own best position, with iteration-decaying weights
       ``d{1,2} = coeff_{1,2} + (1 - i/n)`` (`:453-465`); a ``None``
       binarization threshold draws a fresh uniform threshold per
       dimension, as the paper specifies.
    """
    if variant not in ("classic", "improved"):
        raise ValueError("variant must be 'classic' or 'improved'")
    if variant == "improved":
        if coeff_1 not in IMPROVED_COEFF_1:
            raise ValueError(f"coeff_1 must be one of {IMPROVED_COEFF_1}")
        if coeff_2 not in IMPROVED_COEFF_2:
            raise ValueError(f"coeff_2 must be one of {IMPROVED_COEFF_2}")
    t_start = _time.perf_counter()
    sc = spark.sparkContext
    n_features = x.shape[1]
    feature_names = list(x.columns)
    if n_bins is None:
        n_bins = max(1, sc.defaultParallelism)  # R33 executor discovery analog

    bc = _payload_handle(
        sc,
        {
            "values": x.to_numpy(dtype=np.float64),
            "sample_ids": x.index.to_numpy(),
            "time": np.asarray(time_col, dtype=np.float64),
            "event": np.asarray(event_col, dtype=bool),
        },
        use_broadcast,
    )
    evaluator = _make_evaluator(bc, fitness_fn, worst_fitness)

    # R34: all-features baseline before the search (`core.py:171-179`).
    baseline = evaluate_all_features_baseline(spark, evaluator, n_features)

    # Star initialization: star i from seed random_state * (i + 1)
    # (seed threading shape of metaheuristics.py:524-527).
    masks = [
        random_mask(n_features, np.random.RandomState(random_state * (i + 1)))
        for i in range(n_stars)
    ]
    loop_rng = np.random.RandomState(random_state)

    cost_model = RuntimeCostModel() if use_load_balancer else None

    def evaluate_all(iteration: int) -> list[tuple[int, float, int, float, str]]:
        star_ids = list(range(n_stars))
        bins, _ = plan_star_bins(
            masks,
            n_bins,
            cost_fn=cost_fn if use_load_balancer else None,
            cost_model=cost_model,
        )
        rows = [(i, bins[i], [int(b) for b in masks[i]]) for i in star_ids]
        sdf = spark.createDataFrame(
            rows, schema="star_id int, bin_id int, mask array<int>"
        )
        res = (
            sdf.groupBy("bin_id")
            .applyInPandas(evaluator, _EVAL_SCHEMA)
            .collect()  # bounded: n_stars rows (P7)
        )
        return sorted(
            (r.star_id, r.fitness, r.n_features, r.exec_time, r.hostname)
            for r in res
        )

    history: list[dict] = [baseline]
    bh_idx, bh_fitness = -1, -np.inf
    # improved variant: per-star personal bests (`metaheuristics.py:371-374`)
    best_masks = [m.copy() for m in masks]
    best_fitnesses = np.full(n_stars, -np.inf)

    for iteration in range(n_iterations):
        results = evaluate_all(iteration)
        fitnesses = np.array([r[1] for r in results])
        for sid, fit, nf, dt, host in results:
            if cost_model is not None:
                cost_model.observe(nf, dt)  # R30: train the width->time curve
            history.append(
                {
                    "iteration": iteration,
                    "star_id": sid,
                    "fitness": fit,
                    "n_features": nf,
                    "exec_time": dt,
                    "hostname": host,
                }
            )
        improved = fitnesses > best_fitnesses
        for i in np.nonzero(improved)[0]:
            best_fitnesses[i] = fitnesses[i]
            best_masks[i] = masks[i].copy()

        # Black-hole selection: arg-best with fewer-features tie-break
        # (metaheuristics.py:647-681, R14/R15).
        order = sorted(
            range(n_stars),
            key=lambda i: (-fitnesses[i], int(masks[i].sum()), i),
        )
        if fitnesses[order[0]] > bh_fitness or (
            fitnesses[order[0]] == bh_fitness
            and bh_idx >= 0
            and masks[order[0]].sum() < masks[bh_idx].sum()
        ):
            bh_idx, bh_fitness = order[0], float(fitnesses[order[0]])
        bh_mask = masks[bh_idx].copy()

        if iteration == n_iterations - 1:
            break

        if variant == "improved":
            # Improvement 1: reciprocal event horizon (`:441`).
            safe = np.clip(fitnesses, 1e-9, None)
            horizon = (1.0 / max(bh_fitness, 1e-9)) / float((1.0 / safe).sum())
        else:
            # Classic radius: f_bh / sum(f) (metaheuristics.py:684, R16);
            # fitness clipped at 0 so worst sentinels don't flip signs.
            total = float(np.clip(fitnesses, 0, None).sum()) or 1.0
            horizon = max(bh_fitness, 0.0) / total

        # Improvement 3 weights: iteration-decaying pull toward the black
        # hole (d1) and the star's own best (d2) (`:453-456`).
        w = 1.0 - iteration / n_iterations
        d1, d2 = coeff_1 + w, coeff_2 + w

        for i in range(n_stars):
            if i == bh_idx:
                continue
            rand = loop_rng.random_sample(n_features)
            if variant == "improved":
                rand2 = loop_rng.random_sample(n_features)
                x_new = (
                    masks[i]
                    + d1 * rand * (bh_mask - masks[i])
                    + d2 * rand2 * (best_masks[i] - masks[i])
                )
            else:
                # Position update (metaheuristics.py:696-705, R17):
                # x_new = x + rand * (bh - x).
                x_new = masks[i] + rand * (bh_mask - masks[i])
            if binarization_threshold is None:
                thr = loop_rng.random_sample(n_features)
            else:
                thr = binarization_threshold
            masks[i] = (np.abs(np.tanh(x_new)) > thr).astype(np.int32)

            dist = float(np.linalg.norm(bh_mask - masks[i]))
            if variant == "improved":
                # Improvement 2: capture toggles ONE random dimension
                # (`:449-451`); an all-zero mask still re-randomizes (the
                # zero subset is invalid by R13).
                if dist < horizon:
                    flip = loop_rng.randint(0, n_features)
                    masks[i][flip] ^= 1
                if masks[i].sum() == 0:
                    masks[i] = random_mask(
                        n_features,
                        np.random.RandomState(
                            random_state * (i + 1) + 1000 * (iteration + 1)
                        ),
                    )
            else:
                # Event-horizon capture -> seeded re-initialization
                # (metaheuristics.py:683-694, R16/R18).
                if dist < horizon or masks[i].sum() == 0:
                    masks[i] = random_mask(
                        n_features,
                        np.random.RandomState(
                            random_state * (i + 1) + 1000 * (iteration + 1)
                        ),
                    )

    best_mask = masks[bh_idx]
    return BBHAResult(
        best_mask=best_mask,
        best_fitness=bh_fitness,
        selected_features=[
            f for f, b in zip(feature_names, best_mask) if b
        ],
        n_iterations=n_iterations,
        execution_time=_time.perf_counter() - t_start,
        history=history,
        baseline_fitness=baseline["fitness"],
    )
