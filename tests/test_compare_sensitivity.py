"""Mutation tests for the oracle-compare harness (tests/compare.py).

All 177 oracle-parity green rows are only as trustworthy as the
comparator: a bug that canonicalized everything to equality would turn
the whole correctness gate into a rubber stamp. These tests inject known
corruptions — a perturbed cell, a dropped row, a renamed column, an
int->float dtype flip — and assert each is DETECTED, plus the two
intentional insensitivities (row order, -0.0 vs 0.0) that must NOT trip
it, mirroring the driver's order-insensitive gate."""

import pandas as pd
import pytest

from tests.compare import compare_results


@pytest.fixture(scope="module")
def base(spark):
    sdf = spark.createDataFrame(
        [(1, 1.5, "a"), (2, -0.0, "b"), (3, 2.25, None)],
        "id int, val double, name string",
    )
    pdf = pd.DataFrame(
        {"id": [1, 2, 3], "val": [1.5, 0.0, 2.25], "name": ["a", "b", None]}
    )
    return sdf, pdf


def test_identical_results_match(base, duck):
    sdf, pdf = base
    assert compare_results(sdf, duck.from_df(pdf)) == []


def test_row_order_is_insensitive(base, duck):
    sdf, pdf = base
    shuffled = pdf.iloc[[2, 0, 1]].reset_index(drop=True)
    assert compare_results(sdf, duck.from_df(shuffled)) == []


def test_negative_zero_folds(base, duck):
    # spark side carries -0.0 in row 2; an oracle producing +0.0 must match
    sdf, pdf = base
    assert compare_results(sdf, duck.from_df(pdf)) == []


def test_perturbed_cell_detected(base, duck):
    sdf, pdf = base
    bad = pdf.copy()
    bad.loc[1, "val"] = 0.0001
    problems = compare_results(sdf, duck.from_df(bad))
    assert problems and "values differ" in problems[0]


def test_dropped_row_detected(base, duck):
    sdf, pdf = base
    problems = compare_results(sdf, duck.from_df(pdf.iloc[:2]))
    assert any("row count differs" in p for p in problems)


def test_renamed_column_detected(base, duck):
    sdf, pdf = base
    problems = compare_results(
        sdf, duck.from_df(pdf.rename(columns={"val": "value"}))
    )
    assert problems and "columns differ" in problems[0]


def test_dtype_flip_detected(base, duck):
    # the HUGEINT trap: same values, int column arrives as float
    sdf, pdf = base
    bad = pdf.copy()
    bad["id"] = bad["id"].astype("float64")
    problems = compare_results(sdf, duck.from_df(bad))
    assert problems and "dtype kind differs" in problems[0]


def test_null_swap_detected(base, duck):
    sdf, pdf = base
    bad = pdf.copy()
    bad.loc[2, "name"] = "c"  # spark has NULL there
    problems = compare_results(sdf, duck.from_df(bad))
    assert problems and "values differ" in problems[0]
