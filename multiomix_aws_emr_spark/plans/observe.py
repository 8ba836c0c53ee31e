"""Runtime observability: in-plan row metrics and executed-plan counters.

The reference hand-collects per-worker timings into result dicts
(`scripts/metaheuristics.py:617-645`, R19/R20). The Spark-native way to
know what a pipeline actually did is (a) ``Observation`` nodes — named
aggregates evaluated ON the rows flowing past a point in the plan, for
free, during the one real action (no second scan, no count() jobs) —
and (b) the SQL metrics every physical operator already maintains
(shuffle records/bytes, spill, output rows), read off the executed plan
after an action. Both are surfaced here as plain dicts so pipelines can
assert/log their own dataflow ("rows in -> rows kept -> rows written")
the way `bench.py` asserts wall time.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Observation


def with_audit(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach an observation point: ``metrics`` are aggregate expressions
    (count/sum/min/...) computed over exactly the rows that pass this
    point during the NEXT action on the returned DataFrame. Read them
    with ``observation.get`` after the action — zero extra jobs, which
    at 100 TB is the difference between auditing and re-scanning."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def executed_metrics(df: DataFrame, prefix: Optional[str] = None) -> dict[str, int]:
    """SQL metrics of the already-executed physical plan, summed per
    (operator, metric) pair — e.g. ``Exchange: shuffle records written``
    or ``HashAggregate: spill size``. Call AFTER an action on ``df``
    (the same DataFrame object — a write clones the plan). ``prefix``
    filters operator names. Values are raw longs (bytes / rows / ns as
    the metric defines)."""
    plan = df._jdf.queryExecution().executedPlan()
    out: dict[str, int] = {}

    def walk(node) -> None:
        node_name = node.nodeName()
        if prefix is None or node_name.startswith(prefix):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                key = f"{node_name}: {kv._2().name().get()}" if kv._2().name().isDefined() else f"{node_name}: {kv._1()}"
                try:
                    out[key] = out.get(key, 0) + int(kv._2().value())
                except Exception:
                    pass
        # InputAdapter/WholeStageCodegen wrap children; recurse everywhere
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        # AQE nodes hang their subtree off accessors, not children():
        # AdaptiveSparkPlan -> executedPlan, *QueryStage -> plan
        if node_name.startswith("AdaptiveSparkPlan"):
            try:
                walk(node.executedPlan())
            except Exception:
                pass
        elif "QueryStage" in node_name:
            try:
                walk(node.plan())
            except Exception:
                pass

    walk(plan)
    return out


def shuffle_summary(df: DataFrame) -> dict[str, int]:
    """The two numbers that predict cluster cost: total shuffle records
    and bytes written by the executed plan (0 for a narrow pipeline —
    asserting that IS the no-unnecessary-shuffle test)."""
    metrics = executed_metrics(df)
    records = sum(
        v for k, v in metrics.items() if "shuffle records written" in k
    )
    bytes_ = sum(
        v for k, v in metrics.items() if "shuffle bytes written" in k
    )
    return {"shuffle_records": records, "shuffle_bytes": bytes_}
