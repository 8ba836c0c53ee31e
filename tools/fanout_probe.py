"""Fan-out probe: MEASURE each wide shape's widest-exchange bytes.

The rule-2 sizing hints (queries/registry.py) estimate the bytes entering
a query's widest exchange as ``fact_bytes(table) * fanout``. This probe
replaces guessed fan-outs with measured ones: run each candidate query at
a real SF, read per-stage ``shuffleWriteBytes`` from the status REST API
(the spill_probe pattern), and report

    fanout_widest = max_stage_shuffle_write_bytes / documents_parquet_bytes

Both sides are compressed on-disk/in-flight representations (parquet zstd
vs shuffle lz4), the same units the ``fact_bytes`` proxy contract uses, so
rule 2's decompression_ratio applies to the ratio unchanged. The widest
STAGE is the right numerator: rule 2 sizes per-task state of the biggest
exchange, not the sum over the plan.

Usage:  python tools/fanout_probe.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line per query plus a summary with the fan-outs to wire
into the registry hints.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries measured: the three unhinted wide shapes named by VERDICT r10
#: task 3, plus the two already-hinted document shapes as calibration
#: anchors (near_minhash ships fanout=3.0; a measured value near it
#: validates the method).
CANDIDATES = (
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_unigram_rarity",
    "dedup_near_minhash",
    "text_ngram_topk",
)


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.load(resp)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--qids", default=",".join(CANDIDATES))
    args = ap.parse_args()

    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.session import build_session, parquet_bytes

    spark = build_session(
        app_name="fanout-probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    doc_bytes = parquet_bytes(os.path.join(args.sf_dir, "documents.parquet"))
    seen: set[int] = set()
    out: dict[str, float] = {}
    for qid in args.qids.split(","):
        qid = qid.strip()
        seen.update(s["stageId"] for s in _stages(spark))
        t0 = time.perf_counter()
        QUERIES[qid](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        wall = time.perf_counter() - t0
        fresh = [s for s in _stages(spark) if s["stageId"] not in seen]
        widest = max((s.get("shuffleWriteBytes", 0) for s in fresh), default=0)
        total = sum(s.get("shuffleWriteBytes", 0) for s in fresh)
        fanout = widest / max(doc_bytes, 1)
        out[qid] = round(fanout, 2)
        print(
            json.dumps(
                {
                    "qid": qid,
                    "sec": round(wall, 2),
                    "widest_stage_shuffle_mb": round(widest / 1e6, 1),
                    "total_shuffle_mb": round(total / 1e6, 1),
                    "n_stages": len(fresh),
                    "fanout_widest_vs_documents": round(fanout, 3),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "documents_parquet_mb": round(doc_bytes / 1e6, 1),
                "fanouts": out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
