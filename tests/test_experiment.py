"""End-to-end experiment runner: TSV ingest -> BBHA -> artifacts
(the `scripts/main.py` + `core.py:80-291` slice, SURVEY.md §7.3)."""

import argparse
import json
import os

import numpy as np
import pandas as pd
import pytest

from multiomix_aws_emr_spark.experiment import build_arg_parser, run_experiment


@pytest.fixture(scope="module")
def tsvs(tmp_path_factory):
    """Survival fixture with 3 informative features out of 10: time is a
    deterministic function of GENE_0000..0002, so a working selector finds
    them."""
    rng = np.random.RandomState(7)
    n_features, n_samples = 10, 40
    features = [f"GENE_{i:04d}" for i in range(n_features)]
    samples = [f"S{i:02d}" for i in range(n_samples)]
    mat = rng.normal(size=(n_features, n_samples)).round(4)

    mol = pd.DataFrame(mat, index=features, columns=samples)
    mol.index.name = "feature_id"
    d = tmp_path_factory.mktemp("exp")
    mol_path = str(d / "molecules.tsv")
    mol.to_csv(mol_path, sep="\t")

    time = 50.0 + 10.0 * (mat[0] + mat[1] + mat[2])
    clin = pd.DataFrame(
        {"event": np.ones(n_samples, dtype=int), "time": time.round(4)},
        index=pd.Index(samples, name="sample_id"),
    )
    clin_path = str(d / "clinical.tsv")
    clin.to_csv(clin_path, sep="\t")
    return mol_path, clin_path


def _args(tsvs, results_dir, **over):
    mol, clin = tsvs
    base = dict(
        app_name="test-exp",
        molecules_dataset=mol,
        clinical_dataset=clin,
        results_dir=str(results_dir),
        model="cox",
        n_stars=6,
        bbha_iterations=3,
        cv_folds=4,
        random_state=42,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_experiment_writes_all_artifacts(spark, tsvs, tmp_path):
    summary = run_experiment(spark, _args(tsvs, tmp_path / "r1"))
    assert os.path.exists(summary["result_json"])
    assert os.path.exists(summary["model_path"])

    res = json.load(open(summary["result_json"]))
    assert set(res) == {
        "features",
        "best_metric",
        "n_iterations",
        "execution_time",
        "best_metric_with_all_features",
    }
    assert res["best_metric"] == summary["best_metric"] > 0.5  # beats random
    # R34: the all-features baseline metric is in the payload (the
    # reference's key name, `scripts/core.py:282`) and in the summary.
    assert res["best_metric_with_all_features"] == summary["baseline_metric"]
    assert 0.0 <= res["best_metric_with_all_features"] <= 1.0

    metrics = spark.read.parquet(str(tmp_path / "r1" / "metrics.parquet"))
    # n_stars x iterations + the iteration=-1 baseline row
    assert metrics.count() == 6 * 3 + 1
    assert "iteration" in [f.name for f in metrics.schema.fields]

    from multiomix_aws_emr_spark.sources.sinks import read_model_artifact

    model = read_model_artifact(summary["model_path"])
    assert model["features"] == res["features"].split(" | ")


def test_experiment_is_seed_deterministic(spark, tsvs, tmp_path):
    s1 = run_experiment(spark, _args(tsvs, tmp_path / "a"))
    s2 = run_experiment(spark, _args(tsvs, tmp_path / "b"))
    r1 = json.load(open(s1["result_json"]))
    r2 = json.load(open(s2["result_json"]))
    assert r1["features"] == r2["features"]
    assert r1["best_metric"] == r2["best_metric"]


def test_svm_model_runs_end_to_end(spark, tsvs, tmp_path):
    # R26 SVM family: ranking survival SVM fitness (sksurv when installed,
    # NumPy twin otherwise) drives the full experiment
    out = tmp_path / "c"
    res = run_experiment(spark, _args(tsvs, out, model="svm"))
    assert res["best_metric"] > 0.5  # linear signal fixture: beats random
    assert (out / "result.json").exists()


def test_rf_model_runs_end_to_end(spark, tsvs, tmp_path):
    # R26 RF family: random survival forest fitness; the 40-sample fixture
    # is below the reference's min_samples_leaf=15 split regime, so the
    # contract here is "runs end-to-end, bounded metric", not signal
    # recovery (covered at proper n in test_fitness.py)
    out = tmp_path / "rf"
    res = run_experiment(spark, _args(tsvs, out, model="rf"))
    assert -1.0 <= res["best_metric"] <= 1.0
    assert (out / "result.json").exists()


def test_clustering_model_runs_end_to_end(spark, tsvs, tmp_path):
    # the reference's third fitness family (clustering + survival
    # separation, main.py:79-112) runs dependency-free
    out = tmp_path / "d"
    res = run_experiment(spark, _args(tsvs, out, model="clustering"))
    assert -1.0 <= res["best_metric"] <= 1.0
    assert (out / "result.json").exists()


def test_arg_parser_mirrors_reference_params():
    p = build_arg_parser()
    args = p.parse_args(
        [
            "--app-name", "x",
            "--molecules-dataset", "m.tsv",
            "--clinical-dataset", "c.tsv",
            "--n-stars", "8",
            "--bbha-iterations", "2",
            "--cv-folds", "3",
            "--random-state", "1",
        ]
    )
    assert args.model == "cox" and args.n_stars == 8
