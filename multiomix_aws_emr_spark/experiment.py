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


def _svm_or_rf_fitness(model: str, folds: int, seed: int, args=None):
    """R26 (`scripts/main.py:29-42,114-135`): prefer the real sksurv
    estimators when the library is installed; otherwise the
    dependency-free same-family implementations (fs/survival_models.py)
    keep ``--model svm|rf`` runnable with the identical CV/C-index
    contract.

    The per-estimator tunables (`scripts/parameters.py:91-118` /
    `main.py:29-42`) reach the estimator builder here: ``--svm-kernel``,
    ``--svm-optimizer``, ``--svm-max-iterations``, ``--svm-is-regression``
    to FastKernelSurvivalSVM and ``--rf-n-estimators``, ``--tree-n-jobs``
    to RandomSurvivalForest. The dependency-free fallbacks honor the
    knobs that change RESULTS (`max_iter`, `n_estimators`) and reject
    what they cannot express (non-linear kernels, the regression
    objective) loudly; ``--svm-optimizer``/``--tree-n-jobs`` select
    sksurv's internal tree structure / sklearn thread count — pure
    speed knobs with no result effect, so the fallbacks accept and
    record them without branching."""
    from multiomix_aws_emr_spark.fs import sksurv_backend

    kernel = getattr(args, "svm_kernel", "linear")
    optimizer = getattr(args, "svm_optimizer", "avltree")
    max_iter = getattr(args, "svm_max_iterations", 1000)
    is_regression = getattr(args, "svm_is_regression", False)
    n_estimators = getattr(args, "rf_n_estimators", 10)
    tree_n_jobs = getattr(args, "tree_n_jobs", -1)

    if sksurv_backend.available():
        return sksurv_backend.make_fitness(
            model,
            folds=folds,
            seed=seed,
            kernel=kernel,
            optimizer=optimizer,
            max_iter=max_iter,
            is_regression=is_regression,
            n_estimators=n_estimators,
            n_jobs=tree_n_jobs,
        )
    from multiomix_aws_emr_spark.fs.fitness import (
        cv_rank_svm_fitness,
        cv_survival_forest_fitness,
    )

    if model == "svm":
        if kernel != "linear":
            raise ValueError(
                f"--svm-kernel {kernel} needs the scikit-survival backend "
                "(the dependency-free ranking SVM is linear); install "
                "sksurv or use --svm-kernel linear"
            )
        if is_regression:
            raise ValueError(
                "--svm-is-regression true needs the scikit-survival "
                "backend (the dependency-free fallback implements the "
                "ranking objective, rank_ratio=1.0)"
            )
        return functools.partial(
            cv_rank_svm_fitness, folds=folds, seed=seed, max_iter=max_iter
        )
    return functools.partial(
        cv_survival_forest_fitness,
        folds=folds,
        seed=seed,
        n_estimators=n_estimators,
    )


def _tf(value: str) -> bool:
    """The reference's string-boolean convention: every flag is typed
    ``choices=['true','false']`` and compared ``== 'true'``
    (`scripts/parameters.py:158-173`)."""
    if value not in ("true", "false"):
        raise argparse.ArgumentTypeError(
            f"expected 'true' or 'false', got {value!r}"
        )
    return value == "true"


def build_arg_parser() -> argparse.ArgumentParser:
    """The reference CLI surface (`scripts/parameters.py:75-173`) plus this
    engine's own extensions (``--results-dir``, ``--algorithm``,
    ``--bbha-variant``/``--coeff-*``, ``--model cox|coxph``).

    Every reference argument is accepted, so a reference spark-submit
    arg list ports verbatim. Documented deviations:

    - ``--svm-is-regression`` defaults to 'false' (ranking,
      rank_ratio=1.0 — the reference's documented primary mode). The
      reference parser's default is 'true', but its help string is a
      copy-paste of the load-balancer flag's and flipping it makes the
      dependency-free default unrunnable without sksurv.
    - ``--return-train-scores`` defaults to 'false' (the reference's
      default is the string 'train', which its ``== 'true'`` parse also
      reads as False).
    - ``--clustering-algorithm`` accepts the reference spelling
      ``k_means`` alongside ``kmeans``.
    - ``--clustering-scoring-method`` adds ``logrank`` (this engine's
      bounded default) to the reference's two lifelines methods.
    """
    p = argparse.ArgumentParser(prog="multiomix_aws_emr_spark.experiment")
    p.add_argument("--app-name", required=True)
    p.add_argument(
        "--master",
        default=None,
        help="Spark master URL (reference default spark://master-node:7077; "
        "here None = let the session builder pick local[*])",
    )
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
    # general toggles (`scripts/parameters.py:91-108`)
    p.add_argument(
        "--use-load-balancer", type=_tf, default=True, metavar="{true,false}",
    )
    p.add_argument(
        "--use-broadcast", type=_tf, default=True, metavar="{true,false}",
    )
    p.add_argument(
        "--debug", type=_tf, default=False, metavar="{true,false}",
    )
    # SVM parameters (`scripts/parameters.py:109-118`)
    p.add_argument(
        "--svm-kernel",
        default="linear",
        choices=("linear", "poly", "rbf", "sigmoid", "cosine", "precomputed"),
    )
    p.add_argument(
        "--svm-optimizer", default="avltree", choices=("avltree", "rbtree")
    )
    p.add_argument("--svm-max-iterations", type=int, default=1000)
    p.add_argument(
        "--svm-is-regression", type=_tf, default=False, metavar="{true,false}",
    )
    # RF parameters (`scripts/parameters.py:119-124`)
    p.add_argument("--rf-n-estimators", type=int, default=10)
    p.add_argument("--tree-n-jobs", type=int, default=-1)
    # clustering parameters (`scripts/parameters.py:126-135`); both
    # values of the reference's enum (`scripts/main.py:49,83-84`)
    p.add_argument(
        "--clustering-algorithm",
        default="kmeans",
        choices=("kmeans", "k_means", "spectral"),
    )
    p.add_argument(
        "--clustering-scoring-method",
        default="logrank",
        choices=("logrank", "concordance_index", "log_likelihood"),
    )
    p.add_argument("--number-of-clusters", type=int, default=2)
    # CV parameters (`scripts/parameters.py:137-141`)
    p.add_argument(
        "--n-jobs", type=int, default=-1,
        help="accepted for reference CLI parity but UNUSED: fold "
        "evaluation runs inside one Arrow batch per star, not a joblib "
        "pool (the reference's sklearn n_jobs has no analog here)",
    )
    p.add_argument("--cv-folds", type=int, default=10)
    p.add_argument(
        "--return-train-scores", type=_tf, default=False, metavar="{true,false}",
        help="accepted for reference CLI parity but UNUSED: train-fold "
        "scores are not computed (the declared result surface pins test "
        "scores only)",
    )
    # BBHA parameters (`scripts/parameters.py:143-147`)
    p.add_argument("--n-stars", type=int, default=30)
    p.add_argument("--bbha-iterations", type=int, default=30)
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
    # Empty-subset / error sentinel for the metaheuristic: -1.0 for every
    # bounded-in-[0,1] fitness; the reference's NEG_INF for the
    # unbounded-below clustering log_likelihood scoring (ADVICE r7 —
    # otherwise a valid subset with LL < -1 ranks below the empty one).
    worst_fitness = None
    if args.model == "cox":
        fitness = _cox_fitness(args.cv_folds, args.random_state)
    elif args.model == "coxph":
        # the model-faithful R27 tier: Newton-fit Cox partial likelihood
        from multiomix_aws_emr_spark.fs.fitness import cv_coxph_fitness

        fitness = functools.partial(
            cv_coxph_fitness, folds=args.cv_folds, seed=args.random_state
        )
    elif args.model in ("svm", "rf"):
        fitness = _svm_or_rf_fitness(
            args.model, args.cv_folds, args.random_state, args
        )
    else:  # clustering (`scripts/main.py:79-112`): dependency-free
        # k-means or spectral + log-rank separation fitness (fs/fitness.py
        # R27; algorithm enum mirrors `scripts/main.py:49,83-84`, accepting
        # the reference spelling 'k_means'; --number-of-clusters and
        # --clustering-scoring-method plumb through, parameters.py:126-135)
        import functools as _ft

        from multiomix_aws_emr_spark.fs.fitness import (
            cv_clustering_logrank_fitness,
        )

        algo = getattr(args, "clustering_algorithm", "kmeans")
        scoring = getattr(args, "clustering_scoring_method", "logrank")
        if scoring == "logrank":
            # Deliberate default deviation: the reference defaults to
            # 'log_likelihood' (`scripts/parameters.py:126-135`); this
            # engine defaults to the bounded squashed-logrank that its
            # declared queries/oracles pin. Say so once, loudly, so a
            # reference spark-submit line that omits the flag is not
            # silently rescored.
            print(
                "[experiment] clustering scoring is 'logrank' (this "
                "engine's default); note the reference defaults to "
                "'log_likelihood' — pass --clustering-scoring-method "
                "log_likelihood for reference-default semantics",
                file=__import__("sys").stderr,
            )
        fitness = _ft.partial(
            cv_clustering_logrank_fitness,
            folds=args.cv_folds,
            seed=args.random_state,
            algorithm="kmeans" if algo == "k_means" else algo,
            n_clusters=getattr(args, "number_of_clusters", 2),
            scoring=scoring,
        )
        if scoring == "log_likelihood":
            from multiomix_aws_emr_spark.fs.fitness import NEG_INF_FITNESS

            worst_fitness = NEG_INF_FITNESS

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
            use_broadcast=getattr(args, "use_broadcast", True),
            worst_fitness=worst_fitness,
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
            use_load_balancer=getattr(args, "use_load_balancer", True),
            use_broadcast=getattr(args, "use_broadcast", True),
            **({"worst_fitness": worst_fitness} if worst_fitness is not None else {}),
        )

    if getattr(args, "debug", False):
        # the reference's --debug logs every star's value in the terminal
        # (`scripts/parameters.py:105-107`, metaheuristics star logging)
        import sys

        for row in result.history:
            print(
                f"[debug] iteration={row['iteration']} star={row['star_id']} "
                f"fitness={row['fitness']:.4f} n_features={row['n_features']}",
                file=sys.stderr,
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

    spark = build_session(
        app_name=args.app_name, master=getattr(args, "master", None)
    )
    try:
        summary = run_experiment(spark, args)
        print(json.dumps(summary))
        return summary
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
