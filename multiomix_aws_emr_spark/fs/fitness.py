"""Fitness functions for survival feature selection.

The reference scores a candidate feature subset with cross-validated
survival models — survival SVM / random survival forest
(`scripts/main.py:114-135`, R26) or clustering + Cox proportional hazards
(`scripts/main.py:79-112`, R27) — returning the mean test concordance
index. Those model libraries (scikit-survival, lifelines) are not part of
this engine's baked environment, so the built-in fitness is a
dependency-free equivalent with the same contract: deterministic k-fold CV
-> fit a risk model on train -> concordance index on test -> mean across
folds. Heavier model backends plug in behind the same signature (gated by
import-try, mirroring the reference's pluggable ``--model`` switch,
`scripts/main.py:29-42`).

Determinism notes (SURVEY.md §4.2.2): CV folds are assigned by
``crc32(sample_id) % k`` — stable across engines, partitions, and runs,
unlike ``randomSplit`` or sklearn's internal shuffling.
"""

from __future__ import annotations

import zlib

import numpy as np

#: Fitness assigned to an empty feature subset — the reference's
#: zero-feature guard returns the worst value without evaluating
#: (`scripts/core.py:52-77`, R13).
WORST_FITNESS = -1.0


def concordance_index(
    risk: np.ndarray, time: np.ndarray, event: np.ndarray
) -> float:
    """Harrell's C-index: fraction of comparable pairs ordered correctly.

    A pair (i, j) is comparable when the earlier time has an observed event
    (time_i < time_j and event_i). Concordant when the earlier-failing
    sample has the higher risk score; ties in risk count 0.5.
    """
    time = np.asarray(time, dtype=float)
    event = np.asarray(event, dtype=bool)
    risk = np.asarray(risk, dtype=float)
    n = len(time)
    concordant = 0.0
    comparable = 0
    for i in range(n):
        if not event[i]:
            continue
        later = time > time[i]
        comparable += int(later.sum())
        concordant += float((risk[later] < risk[i]).sum())
        concordant += 0.5 * float((risk[later] == risk[i]).sum())
    if comparable == 0:
        return 0.5
    return concordant / comparable


def deterministic_folds(sample_ids: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Stable fold assignment: crc32(sample_id) + seed mod k."""
    return np.array(
        [(zlib.crc32(str(s).encode()) + seed) % k for s in sample_ids],
        dtype=int,
    )


def cv_linear_cox_fitness(
    x: np.ndarray,
    time: np.ndarray,
    event: np.ndarray,
    sample_ids: np.ndarray,
    *,
    folds: int = 3,
    seed: int = 42,
) -> float:
    """Built-in fitness: k-fold CV of a least-squares linear risk model.

    Train: ridge-regularized lstsq of standardized features onto -time
    (higher predicted value == higher risk == earlier failure), the linear
    risk-score family Cox models also fit. Test: Harrell's C-index of the
    predicted risk. Returns the mean test C-index across folds — the same
    'mean cross_validate test score' contract as the reference
    (`scripts/main.py:130-135`).
    """
    if x.ndim != 2 or x.shape[1] == 0:
        return WORST_FITNESS
    fold_of = deterministic_folds(sample_ids, folds, seed)
    scores = []
    for f in range(folds):
        train, test = fold_of != f, fold_of == f
        if train.sum() < 2 or test.sum() < 2:
            continue
        xtr, xte = x[train], x[test]
        mu, sigma = xtr.mean(axis=0), xtr.std(axis=0)
        sigma[sigma == 0] = 1.0
        xtr = (xtr - mu) / sigma
        xte = (xte - mu) / sigma
        # ridge via augmented lstsq: [X; sqrt(lam) I] beta = [-t; 0]
        lam = 1e-3
        aug = np.vstack([xtr, np.sqrt(lam) * np.eye(xtr.shape[1])])
        target = np.concatenate([-time[train], np.zeros(xtr.shape[1])])
        beta, *_ = np.linalg.lstsq(aug, target, rcond=None)
        risk = xte @ beta
        scores.append(concordance_index(risk, time[test], event[test]))
    if not scores:
        return WORST_FITNESS
    return float(np.mean(scores))
