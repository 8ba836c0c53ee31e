import numpy as np

from multiomix_aws_emr_spark.fs.fitness import (
    WORST_FITNESS,
    concordance_index,
    cv_linear_cox_fitness,
    deterministic_folds,
)


def test_concordance_perfect_and_inverted():
    time = np.array([1.0, 2.0, 3.0, 4.0])
    event = np.array([True, True, True, True])
    # higher risk == earlier failure -> perfectly concordant
    assert concordance_index(np.array([4.0, 3.0, 2.0, 1.0]), time, event) == 1.0
    assert concordance_index(np.array([1.0, 2.0, 3.0, 4.0]), time, event) == 0.0
    # constant risk -> all ties -> 0.5
    assert concordance_index(np.ones(4), time, event) == 0.5


def test_concordance_censoring():
    time = np.array([1.0, 2.0, 3.0])
    event = np.array([False, False, False])  # nothing comparable
    assert concordance_index(np.array([3.0, 2.0, 1.0]), time, event) == 0.5


def test_folds_deterministic_and_covering():
    ids = np.array([f"S{i:02d}" for i in range(30)])
    f1 = deterministic_folds(ids, 3, seed=7)
    f2 = deterministic_folds(ids, 3, seed=7)
    assert (f1 == f2).all()
    assert set(f1) == {0, 1, 2}


def test_cv_fitness_recovers_signal():
    rng = np.random.RandomState(0)
    n = 60
    x = rng.normal(size=(n, 5))
    # time driven by features 0 and 1; higher value -> later failure
    time = 10 + 3 * x[:, 0] + 3 * x[:, 1] + rng.normal(scale=0.1, size=n)
    event = np.ones(n, dtype=bool)
    ids = np.array([f"S{i}" for i in range(n)])

    informative = cv_linear_cox_fitness(x[:, :2], time, event, ids, seed=1)
    noise_only = cv_linear_cox_fitness(x[:, 3:], time, event, ids, seed=1)
    assert informative > 0.9
    assert noise_only < informative - 0.2


def test_empty_subset_is_worst():
    x = np.zeros((10, 0))
    assert (
        cv_linear_cox_fitness(
            x, np.arange(10.0), np.ones(10, bool), np.arange(10)
        )
        == WORST_FITNESS
    )
