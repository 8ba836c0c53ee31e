"""End-to-end BBHA experiment runner — the spark-submit entry point.

The Spark-native analog of the reference's `scripts/main.py:252-296` +
`scripts/core.py:80-291`: parse CLI parameters (the operative subset of the
reference's 28, `scripts/parameters.py:75-173`), ingest the survival TSVs,
clean, run BBHA feature selection, and write the three artifacts the
reference emits — `result.json` (R24, `core.py:277-285`), the per-star
metrics (R24, tidied to parquet instead of a dict-of-parallel-lists), and
the best-model artifact (R25, `core.py:265-269`).

Run:

    spark-submit -py-files <pkg.zip> -m multiomix_aws_emr_spark.experiment \
        --app-name exp1 --molecules-dataset m.tsv --clinical-dataset c.tsv \
        --results-dir /tmp/out --n-stars 8 --bbha-iterations 4

or locally: ``python -m multiomix_aws_emr_spark.experiment ...``.

Model selection mirrors `scripts/main.py:29-42`: ``--model cox`` is the
dependency-free linear Cox CV, ``--model clustering`` the k-means +
log-rank family (fs/fitness.py), and ``--model svm|rf`` the reference's
primary families — scikit-survival's FastKernelSurvivalSVM /
RandomSurvivalForest when that library is installed (fs/sksurv_backend),
otherwise the same-family NumPy implementations (fs/survival_models), so
every model choice runs end-to-end in the baked environment.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time as _time

import numpy as np

from pyspark.sql import SparkSession


def _cox_fitness(folds: int, seed: int):
    from multiomix_aws_emr_spark.fs.fitness import cv_linear_cox_fitness

    return functools.partial(cv_linear_cox_fitness, folds=folds, seed=seed)


def _svm_or_rf_fitness(model: str, folds: int, seed: int):
    """R26 (`scripts/main.py:29-42,114-135`): prefer the real sksurv
    estimators when the library is installed; otherwise the
    dependency-free same-family implementations (fs/survival_models.py)
    keep ``--model svm|rf`` runnable with the identical CV/C-index
    contract."""
    from multiomix_aws_emr_spark.fs import sksurv_backend

    if sksurv_backend.available():
        return sksurv_backend.make_fitness(model, folds=folds, seed=seed)
    from multiomix_aws_emr_spark.fs.fitness import (
        cv_rank_svm_fitness,
        cv_survival_forest_fitness,
    )

    fn = cv_rank_svm_fitness if model == "svm" else cv_survival_forest_fitness
    return functools.partial(fn, folds=folds, seed=seed)


def build_arg_parser() -> argparse.ArgumentParser:
    """The operative parameter subset of `scripts/parameters.py:75-173`."""
    p = argparse.ArgumentParser(prog="multiomix_aws_emr_spark.experiment")
    p.add_argument("--app-name", required=True)
    p.add_argument("--molecules-dataset", required=True)
    p.add_argument("--clinical-dataset", required=True)
    p.add_argument("--results-dir", default="results")
    p.add_argument(
        "--model",
        default="cox",
        choices=("cox", "coxph", "svm", "rf", "clustering"),
    )
    # both values of the reference's algorithm enum (`src/emr.py:10-14`);
    # blind search is implemented here (the reference left it a TODO)
    p.add_argument(
        "--algorithm", default="bbha", choices=("bbha", "blind_search")
    )
    # both values of the reference's clustering enum for --model clustering
    # (`scripts/main.py:49,83-84`: kmeans | spectral)
    p.add_argument(
        "--clustering-algorithm",
        default="kmeans",
        choices=("kmeans", "spectral"),
    )
    p.add_argument("--n-stars", type=int, default=30)
    p.add_argument("--bbha-iterations", type=int, default=30)
    p.add_argument("--cv-folds", type=int, default=10)
    p.add_argument("--random-state", type=int, default=42)
    # improved-BBHA surface (`scripts/parameters.py` --coeff-1/--coeff-2;
    # the variant itself is the reference's gated TODO, SURVEY.md §7.6)
    p.add_argument("--bbha-variant", default="classic", choices=("classic", "improved"))
    p.add_argument("--coeff-1", type=float, default=2.2)
    p.add_argument("--coeff-2", type=float, default=0.1)
    return p


def run_experiment(spark: SparkSession, args: argparse.Namespace) -> dict:
    """Ingest -> clean -> BBHA -> write artifacts. Returns result dict."""
    from multiomix_aws_emr_spark.fs.bbha import run_bbha
    from multiomix_aws_emr_spark.sources.sinks import (
        write_model_artifact,
        write_parquet,
    )
    from multiomix_aws_emr_spark.sources.survival import (
        clean_wide,
        long_to_wide,
        read_clinical_tsv,
        read_molecules_tsv,
    )

    t0 = _time.perf_counter()
    if args.model == "cox":
        fitness = _cox_fitness(args.cv_folds, args.random_state)
    elif args.model == "coxph":
        # the model-faithful R27 tier: Newton-fit Cox partial likelihood
        from multiomix_aws_emr_spark.fs.fitness import cv_coxph_fitness

        fitness = functools.partial(
            cv_coxph_fitness, folds=args.cv_folds, seed=args.random_state
        )
    elif args.model in ("svm", "rf"):
        fitness = _svm_or_rf_fitness(args.model, args.cv_folds, args.random_state)
    else:  # clustering (`scripts/main.py:79-112`): dependency-free
        # k-means or spectral + log-rank separation fitness (fs/fitness.py
        # R27; algorithm enum mirrors `scripts/main.py:49,83-84`)
        import functools as _ft

        from multiomix_aws_emr_spark.fs.fitness import (
            cv_clustering_logrank_fitness,
        )

        fitness = _ft.partial(
            cv_clustering_logrank_fitness,
            folds=args.cv_folds,
            seed=args.random_state,
            algorithm=getattr(args, "clustering_algorithm", "kmeans"),
        )

    molecules = read_molecules_tsv(spark, args.molecules_dataset)
    wide = clean_wide(long_to_wide(molecules))
    clinical = read_clinical_tsv(spark, args.clinical_dataset)

    # The cleaned molecules matrix joins clinical on sample_id, then lands
    # on the driver as the bounded pandas frame the metaheuristic needs
    # (the reference broadcasts exactly this object, core.py:167-169).
    joined = wide.join(clinical, "sample_id", "inner")
    pdf = joined.toPandas().set_index("sample_id").sort_index()
    time_col = pdf.pop("time").to_numpy(dtype=np.float64)
    event_col = pdf.pop("event").to_numpy(dtype=bool)

    if getattr(args, "algorithm", "bbha") == "blind_search":
        from multiomix_aws_emr_spark.fs.blind import run_blind_search

        result = run_blind_search(
            spark,
            pdf,
            time_col,
            event_col,
            n_subsets=args.n_stars,
            random_state=args.random_state,
            fitness_fn=fitness,
        )
    else:
        result = run_bbha(
            spark,
            pdf,
            time_col,
            event_col,
            n_stars=args.n_stars,
            n_iterations=args.bbha_iterations,
            random_state=args.random_state,
            fitness_fn=fitness,
            variant=getattr(args, "bbha_variant", "classic"),
            coeff_1=getattr(args, "coeff_1", 2.2),
            coeff_2=getattr(args, "coeff_2", 0.1),
        )

    os.makedirs(args.results_dir, exist_ok=True)
    # result.json (R24: core.py:277-285 — same shape)
    result_path = os.path.join(args.results_dir, "result.json")
    with open(result_path, "w") as fh:
        fh.write(result.to_result_json())
    # tidy per-(iteration, star) metrics (replaces D6)
    write_parquet(
        result.history_df(spark),
        os.path.join(args.results_dir, "metrics.parquet"),
        partition_by=["iteration"],
    )
    # model artifact by path (R25)
    model_path = write_model_artifact(
        {
            "model": args.model,
            "algorithm": getattr(args, "algorithm", "bbha"),
            "mask": result.best_mask.tolist(),
            "features": result.selected_features,
            "best_fitness": result.best_fitness,
            "random_state": args.random_state,
        },
        args.results_dir,
    )
    summary = {
        "app_name": args.app_name,
        "result_json": result_path,
        "model_path": model_path,
        "best_metric": round(result.best_fitness, 4),
        "n_features": len(result.selected_features),
        "wall_seconds": round(_time.perf_counter() - t0, 4),
    }
    if result.baseline_fitness is not None:
        # R34 (`scripts/core.py:282`): the all-features comparison metric.
        summary["baseline_metric"] = round(result.baseline_fitness, 4)
    return summary


def main(argv: list[str] | None = None) -> dict:
    args = build_arg_parser().parse_args(argv)
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(app_name=args.app_name)
    try:
        summary = run_experiment(spark, args)
        print(json.dumps(summary))
        return summary
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
