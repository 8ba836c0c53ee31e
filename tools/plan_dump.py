#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries to plans/<tag>/<qid>_<when>.txt.

Usage: python tools/plan_dump.py <tag> <when> [qid ...]
  tag   - subdirectory under plans/ (e.g. r15)
  when  - 'before' or 'after'
  qids  - optional subset; default = all declared queries

Also prints a one-line plan-shape summary per query (Exchange count, join
strategies, Python-eval nodes) so the expensive shapes are scannable.
Uses $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    when = sys.argv[2] if len(sys.argv) > 2 else "before"
    subset = sys.argv[3:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.session import build_session

    spark = build_session(app_name=f"plan-dump-{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    qids = subset or sorted(QUERIES)
    for qid in qids:
        try:
            df = QUERIES[qid](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building/explaining {qid}: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{qid}_{when}.txt"), "w") as fh:
            fh.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        joins = sorted(
            set(re.findall(r"\b(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))\b", text))
        )
        py = sorted(
            set(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                    r"FlatMapGroupsInPandas|PythonMapInArrow|InMemoryTableScan)\b",
                    text,
                )
            )
        )
        print(
            f"{qid}: Exchange={n_ex} joins={','.join(joins) or '-'} "
            f"py={','.join(py) or '-'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
