"""tools/bench_bands.py record/check contract: quiet-gated min-merge,
margin math, and new-query handling — pure JSON, no Spark."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def bands_mod(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_bands", os.path.join(REPO, "tools", "bench_bands.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "BANDS_PATH", str(tmp_path / "BANDS.json"))
    return mod


def _run(tmp_path, name, queries, probe=1.0, sf=0.1):
    p = tmp_path / name
    p.write_text(
        json.dumps({"queries": queries, "load_probe_sec": probe, "sf": sf})
    )
    return str(p)


def test_record_min_merges_and_gates_on_probe(bands_mod, tmp_path, capsys):
    r1 = _run(tmp_path, "r1.json", {"q1": 2.0, "q2": 0.5})
    assert bands_mod.record(r1, probe_max=1.3, max_over_frac=0.2) == 0
    # a loaded run is refused outright
    r2 = _run(tmp_path, "r2.json", {"q1": 1.0}, probe=2.5)
    assert bands_mod.record(r2, probe_max=1.3, max_over_frac=0.2) == 1
    # a faster quiet run tightens only the improved query
    r3 = _run(tmp_path, "r3.json", {"q1": 1.5, "q2": 0.9})
    assert bands_mod.record(r3, probe_max=1.3, max_over_frac=0.2) == 0
    bands = json.load(open(bands_mod.BANDS_PATH))
    assert bands["queries"] == {"q1": 1.5, "q2": 0.5}
    assert bands["n_runs"] == 2
    # sf mismatch refused (bands are per-SF floors)
    r4 = _run(tmp_path, "r4.json", {"q1": 0.1}, sf=0.01)
    assert bands_mod.record(r4, probe_max=1.3, max_over_frac=0.2) == 1


def test_check_flags_over_margin_and_reports_new(bands_mod, tmp_path, capsys):
    base = _run(tmp_path, "base.json", {"q1": 1.0, "q2": 0.2})
    bands_mod.record(base, probe_max=1.3, max_over_frac=0.2)
    capsys.readouterr()
    # within margin (band*1.5+0.4): q1 at 1.8 passes, q2 jitter passes
    ok = _run(tmp_path, "ok.json", {"q1": 1.8, "q2": 0.6, "qnew": 3.0})
    assert bands_mod.check([ok]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["regressions"] == {}
    assert out["new_unbanded"] == ["qnew"]
    assert out["n_checked"] == 2
    # a real regression flags and exits nonzero
    bad = _run(tmp_path, "bad.json", {"q1": 2.1, "q2": 0.2})
    assert bands_mod.check([bad]) == 1
    out = json.loads(capsys.readouterr().out)
    assert set(out["regressions"]) == {"q1"}


def test_record_refuses_mass_regression_window(bands_mod, tmp_path, capsys):
    """The multicore-contention gate: a run where most banded queries
    regress at once is the host, not the code — refused outright so new
    queries never inherit loaded-window bands."""
    base = _run(tmp_path, "b.json", {"q1": 1.0, "q2": 1.0, "q3": 1.0})
    assert bands_mod.record(base, probe_max=1.3, max_over_frac=0.2) == 0
    capsys.readouterr()
    loaded = _run(
        tmp_path, "l.json", {"q1": 3.0, "q2": 3.0, "q3": 1.0, "qnew": 9.9}
    )
    assert bands_mod.record(loaded, probe_max=1.3, max_over_frac=0.2) == 1
    out = json.loads(capsys.readouterr().out)
    assert "loaded window" in out["reason"]
    bands = json.load(open(bands_mod.BANDS_PATH))
    assert "qnew" not in bands["queries"]  # nothing from the loaded run


def test_check_min_over_runs_absorbs_variance(bands_mod, tmp_path, capsys):
    """A query over margin in ONE run but inside it in another is
    variance, not regression — the min across runs is what gates."""
    base = _run(tmp_path, "b2.json", {"q1": 1.0})
    bands_mod.record(base, probe_max=1.3, max_over_frac=0.2)
    capsys.readouterr()
    slow = _run(tmp_path, "s.json", {"q1": 2.5})
    fast = _run(tmp_path, "f.json", {"q1": 1.2})
    assert bands_mod.check([slow]) == 1
    capsys.readouterr()
    assert bands_mod.check([slow, fast]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["regressions"] == {} and out["n_runs"] == 2


def test_rebase_requires_evidence_and_audits(bands_mod, tmp_path, capsys):
    """--rebase (r14): >= 3 runs, non-empty reason, floor can only RISE
    (lowering is --record's job), and the old/new/reason land in a
    visible audit list instead of silently rewriting history."""
    base = _run(tmp_path, "base.json", {"q1": 1.0, "q2": 0.2})
    bands_mod.record(base, probe_max=1.3, max_over_frac=0.2)
    capsys.readouterr()
    runs = [
        _run(tmp_path, f"rb{i}.json", {"q1": sec, "q2": 0.2})
        for i, sec in enumerate((2.6, 3.1, 2.9))
    ]
    # gate: needs 3 runs and a reason
    assert bands_mod.rebase("q1", runs[:2], "ctx shift") == 1
    assert bands_mod.rebase("q1", runs, "") == 1
    # unbanded and would-lower cases refused
    assert bands_mod.rebase("q_missing", runs, "x") == 1
    low = [
        _run(tmp_path, f"lo{i}.json", {"q2": 0.05}) for i in range(3)
    ]
    assert bands_mod.rebase("q2", low, "x") == 1
    capsys.readouterr()
    # the real rebase: floor rises to min-over-runs, audit appended
    assert bands_mod.rebase("q1", runs, "JVM context shift") == 0
    bands = json.load(open(bands_mod.BANDS_PATH))
    assert bands["queries"]["q1"] == 2.6
    (audit,) = bands["rebases"]
    assert audit["old"] == 1.0 and audit["new"] == 2.6
    assert audit["reason"] == "JVM context shift"
    assert audit["runs_sec"] == [2.6, 2.9, 3.1]
    # q2's floor untouched
    assert bands["queries"]["q2"] == 0.2
