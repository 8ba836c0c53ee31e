"""Per-query bench regression bands (VERDICT r12 task 4).

The suite WALL drifts upward by construction as fixed-cost composites
accumulate (each new streaming/store query adds 2-6 s of real work), so
wall-vs-baseline stops being a regression signal. The tracked signal is
now PER-QUERY: ``BENCH_BANDS.json`` holds each qid's reference seconds —
the min over recorded quiet runs at the headline SF — and a run is
regression-free when no carried query exceeds its band by the margin.

Margin: ``band * ratio + slack`` with ratio 1.5 and slack 0.4 s. The
ratio absorbs the host's documented minutes-scale load cycling
(BASELINE.md §B: quiet-vs-loaded swings of 1.2-1.4x are routine); the
absolute slack keeps 0.1-0.4 s queries from flagging on scheduler
jitter that is larger than the query itself. Queries with no band yet
(new this round) are reported separately, never flagged.

Usage:
  python tools/bench_bands.py --record [bench_result.json]
      merge a run into the bands (per-qid min; refuses runs whose load
      probe exceeds --probe-max, default 1.3 s — bands must come from
      quiet windows or they stop being floors)
  python tools/bench_bands.py --check [bench_result.json]
      compare a run against the bands; exit 1 if any query regressed
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANDS_PATH = os.path.join(REPO, "BENCH_BANDS.json")

RATIO = 1.5
SLACK = 0.4


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def record(result_path: str, probe_max: float, max_over_frac: float) -> int:
    run = _load(result_path)
    probe = run.get("load_probe_sec")
    if probe is None or probe > probe_max:
        print(
            json.dumps(
                {
                    "recorded": False,
                    "reason": f"load probe {probe} > {probe_max}: not a "
                    "quiet window; bands must be floors",
                }
            )
        )
        return 1
    bands = _load(BANDS_PATH) if os.path.exists(BANDS_PATH) else {
        "sf": run.get("sf"),
        "unit": "sec",
        "n_runs": 0,
        "queries": {},
    }
    if bands.get("sf") != run.get("sf"):
        print(
            json.dumps(
                {
                    "recorded": False,
                    "reason": f"run sf {run.get('sf')} != bands sf "
                    f"{bands.get('sf')}",
                }
            )
        )
        return 1
    # Second quiet gate: the single-core probe misses MULTI-core
    # noisy-neighbor contention (measured: a run at probe 1.26 walled
    # 2.3x with 30% of queries over margin). If a large fraction of
    # already-banded queries regress at once, that is the host, not 58
    # simultaneous real regressions — refuse, so brand-new queries never
    # get banded from a loaded window (min-merge already protects the
    # existing bands either way).
    banded = [
        (sec, bands["queries"][qid])
        for qid, sec in run.get("queries", {}).items()
        if qid in bands["queries"]
    ]
    if banded:
        over = sum(1 for sec, band in banded if sec > band * RATIO + SLACK)
        frac = over / len(banded)
        if frac > max_over_frac:
            print(
                json.dumps(
                    {
                        "recorded": False,
                        "reason": f"{over}/{len(banded)} banded queries over "
                        f"margin ({frac:.0%} > {max_over_frac:.0%}): loaded "
                        "window the single-core probe missed",
                    }
                )
            )
            return 1
    updated = 0
    for qid, sec in run.get("queries", {}).items():
        prev = bands["queries"].get(qid)
        if prev is None or sec < prev:
            bands["queries"][qid] = sec
            updated += 1
    bands["n_runs"] = bands.get("n_runs", 0) + 1
    bands["probe_max"] = probe_max
    with open(BANDS_PATH, "w") as fh:
        json.dump(bands, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {
                "recorded": True,
                "n_runs": bands["n_runs"],
                "n_queries": len(bands["queries"]),
                "tightened": updated,
                "probe": probe,
            }
        )
    )
    return 0


def check(result_paths: list[str]) -> int:
    """Flag a query only when its MIN across the given runs exceeds the
    margin — the per-query analog of the min-of-N-spaced-runs protocol
    the suite wall always used. A single run can flag a high-variance
    1-2 s query (measured: three unchanged agg queries swing 1.5-2x
    between quiet runs); a query over margin in EVERY run is a
    regression."""
    runs = [_load(p) for p in result_paths]
    if not os.path.exists(BANDS_PATH):
        print(
            json.dumps(
                {
                    "regressions": {},
                    "error": f"no bands recorded yet ({BANDS_PATH} missing): "
                    "run --record on a quiet run first",
                }
            )
        )
        return 1
    bands = _load(BANDS_PATH)
    merged: dict = {}
    for run in runs:
        for qid, sec in run.get("queries", {}).items():
            merged[qid] = min(sec, merged.get(qid, sec))
    over, new = {}, []
    for qid, sec in merged.items():
        band = bands["queries"].get(qid)
        if band is None:
            new.append(qid)
        elif sec > band * RATIO + SLACK:
            over[qid] = {"sec": sec, "band": band}
    out = {
        "regressions": over,
        "n_checked": len(merged) - len(new),
        "n_runs": len(runs),
        "new_unbanded": sorted(new),
        "load_probe_sec": [r.get("load_probe_sec") for r in runs],
        "margin": f"min-over-runs > band*{RATIO}+{SLACK}s",
    }
    print(json.dumps(out, sort_keys=True))
    return 1 if over else 0


def rebase(qid: str, result_paths: list[str], reason: str) -> int:
    """Audited floor re-baseline for ONE query whose recorded floor
    encodes a context the suite no longer reproduces (the honest escape
    from monotone-min staleness — NOT a regression override). Floors are
    mins over quiet runs, so a floor set under a since-departed JVM/
    codegen context (e.g. a smaller surface whose class-cache state made
    a first-run cheap) can become permanently unreachable while every
    OTHER floor still tightens; a gate that stays red forever stops
    gating. Requirements: >= 3 runs supplied (the new floor is their
    min — same evidence standard as a closing check), and a non-empty
    ``--reason``. The old floor, new floor, run count, and reason are
    APPENDED to a ``rebases`` audit list in the bands file — visible
    history, not a silent rewrite. A rebase that would LOWER the floor
    is refused (that is what --record is for)."""
    if len(result_paths) < 3:
        print(json.dumps({"rebased": False, "reason": "need >= 3 runs"}))
        return 1
    if not reason.strip():
        print(json.dumps({"rebased": False, "reason": "need --reason"}))
        return 1
    bands = _load(BANDS_PATH)
    old = bands["queries"].get(qid)
    if old is None:
        print(json.dumps({"rebased": False, "reason": f"{qid} unbanded"}))
        return 1
    runs = [_load(p) for p in result_paths]
    secs = [r["queries"][qid] for r in runs if qid in r.get("queries", {})]
    if len(secs) < 3:
        print(
            json.dumps(
                {"rebased": False, "reason": f"{qid} missing from runs"}
            )
        )
        return 1
    new = min(secs)
    if new <= old:
        print(
            json.dumps(
                {
                    "rebased": False,
                    "reason": f"min {new} <= current floor {old}: "
                    "use --record",
                }
            )
        )
        return 1
    bands["queries"][qid] = new
    bands.setdefault("rebases", []).append(
        {
            "qid": qid,
            "old": old,
            "new": new,
            "n_runs": len(secs),
            "runs_sec": sorted(secs),
            "reason": reason,
        }
    )
    with open(BANDS_PATH, "w") as fh:
        json.dump(bands, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"rebased": True, "qid": qid, "old": old, "new": new}))
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--record", action="store_true")
    mode.add_argument("--check", action="store_true")
    mode.add_argument(
        "--rebase",
        metavar="QID",
        help="audited floor re-baseline for one query (see rebase())",
    )
    ap.add_argument(
        "result",
        nargs="*",
        default=[os.path.join(REPO, "bench_result.json")],
    )
    ap.add_argument("--probe-max", type=float, default=1.3)
    ap.add_argument("--max-over-frac", type=float, default=0.2)
    ap.add_argument("--reason", default="")
    args = ap.parse_args()
    if args.record:
        sys.exit(
            max(
                record(path, args.probe_max, args.max_over_frac)
                for path in args.result
            )
        )
    if args.rebase:
        sys.exit(rebase(args.rebase, args.result, args.reason))
    sys.exit(check(args.result))


if __name__ == "__main__":
    main()
