"""End-to-end BBHA test (SURVEY.md §5.2.4): tiny synthetic survival dataset
with informative features by construction, fixed random_state -> the run is
deterministic, improves on noise, and the result JSON has the reference's
shape (`scripts/core.py:277-285`)."""

import json

import numpy as np
import pandas as pd
import pytest

from multiomix_aws_emr_spark.fs.bbha import BBHAResult, random_mask, run_bbha
from multiomix_aws_emr_spark.fs.fitness import cv_linear_cox_fitness


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.RandomState(7)
    n, k = 40, 10
    x = pd.DataFrame(
        rng.normal(size=(n, k)),
        index=[f"S{i:02d}" for i in range(n)],
        columns=[f"GENE_{i:04d}" for i in range(k)],
    )
    # informative: GENE_0000..0002 drive survival time, rest is noise
    time = 50 + 8 * (x.iloc[:, 0] + x.iloc[:, 1] + x.iloc[:, 2]).to_numpy()
    time += rng.normal(scale=0.1, size=n)
    event = np.ones(n, dtype=bool)
    return x, time, event


def _run(spark, dataset, **kw):
    x, time, event = dataset
    return run_bbha(
        spark, x, time, event,
        n_stars=6, n_iterations=3, random_state=42, **kw,
    )


def test_bbha_deterministic(spark, dataset):
    r1 = _run(spark, dataset)
    r2 = _run(spark, dataset)
    assert (r1.best_mask == r2.best_mask).all()
    assert r1.best_fitness == r2.best_fitness
    assert r1.selected_features == r2.selected_features


def test_bbha_finds_signal(spark, dataset):
    r = _run(spark, dataset)
    assert r.best_fitness > 0.7  # far above the 0.5 random baseline
    # 18 search rows + the R34 all-features baseline at (-1, -1)
    assert len(r.history) == 6 * 3 + 1
    assert {(h["iteration"], h["star_id"]) for h in r.history} == {
        (i, s) for i in range(3) for s in range(6)
    } | {(-1, -1)}


def test_bbha_all_features_baseline(spark, dataset):
    # R34 (`scripts/core.py:171-179`): the all-features fitness is
    # evaluated once before the search, carried on the result, and its
    # history row records the full feature width.
    r = _run(spark, dataset)
    assert r.baseline_fitness is not None and 0.0 <= r.baseline_fitness <= 1.0
    base_rows = [h for h in r.history if h["iteration"] == -1]
    assert len(base_rows) == 1
    assert base_rows[0]["n_features"] == dataset[0].shape[1]
    assert base_rows[0]["fitness"] == r.baseline_fitness
    # seeded determinism extends to the baseline evaluation
    assert _run(spark, dataset).baseline_fitness == r.baseline_fitness


def test_bbha_metrics_and_json(spark, dataset):
    r = _run(spark, dataset)
    hdf = r.history_df(spark)
    assert hdf.count() == 19
    host = r.host_metrics_df(spark).collect()
    assert all(row.busy_sec >= 0 for row in host)
    doc = json.loads(r.to_result_json())
    assert set(doc) == {
        "features",
        "best_metric",
        "n_iterations",
        "execution_time",
        "best_metric_with_all_features",
    }
    assert doc["best_metric_with_all_features"] == round(r.baseline_fitness, 4)
    assert doc["features"].count("|") == len(r.selected_features) - 1


def test_bbha_with_cost_model_binpacking(spark, dataset):
    # the reference's load-balancer path (R30/R31): cost ~ subset size
    r = _run(spark, dataset, cost_fn=lambda m: 1.0 + float(m.sum()))
    assert r.best_fitness > 0.7


def test_random_mask_seeded():
    m1 = random_mask(20, np.random.RandomState(42))
    m2 = random_mask(20, np.random.RandomState(42))
    assert (m1 == m2).all()
    assert 1 <= m1.sum() <= 20


def test_improved_variant_deterministic_and_converges(spark, dataset):
    x, time_col, event_col = dataset

    kw = dict(
        n_stars=6, n_iterations=4, random_state=42,
        variant="improved", coeff_1=2.2, coeff_2=0.1,
        binarization_threshold=None,
    )
    r1 = run_bbha(spark, x, time_col, event_col, **kw)
    r2 = run_bbha(spark, x, time_col, event_col, **kw)
    assert r1.selected_features == r2.selected_features
    assert r1.best_fitness == r2.best_fitness
    assert r1.best_fitness > 0.5  # beats random ordering


def test_improved_variant_rejects_bad_coeffs(spark, dataset):
    x, time_col, event_col = dataset

    with pytest.raises(ValueError, match="coeff_1"):
        run_bbha(spark, x, time_col, event_col, variant="improved", coeff_1=9.9)
    with pytest.raises(ValueError, match="coeff_2"):
        run_bbha(spark, x, time_col, event_col, variant="improved", coeff_2=0.9)


def test_blind_search_one_pass(spark, dataset):
    from multiomix_aws_emr_spark.fs.blind import run_blind_search

    x, time_col, event_col = dataset
    r1 = run_blind_search(
        spark, x, time_col, event_col, n_subsets=12, random_state=42
    )
    r2 = run_blind_search(
        spark, x, time_col, event_col, n_subsets=12, random_state=42
    )
    assert r1.selected_features == r2.selected_features  # seeded
    # 12 subsets + the R34 all-features baseline row at iteration -1
    assert len(r1.history) == 13 and r1.n_iterations == 1
    assert r1.baseline_fitness is not None
    # best-of-12 must match a driver-side argmax over its own history
    # (the baseline row is reporting, not a search candidate)
    best = max(
        (h for h in r1.history if h["iteration"] >= 0),
        key=lambda h: (h["fitness"], -h["n_features"]),
    )
    assert r1.best_fitness == best["fitness"]
    # with informative features planted, random search still beats chance
    assert r1.best_fitness > 0.5
