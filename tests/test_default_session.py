"""Driver-mirror smoke: the external driver builds its OWN SparkSession
with stock confs — none of the engine's RUNTIME_CONF baseline — and then
calls entry()/queries(). Round 3 went red precisely here (the events
fixture's parquet timestamp type needs engine-side conf/dispatch the
test session was masking), so pin the real surface: a subprocess JVM
with a DEFAULT session must run the flagship plus an events-based query
and a scalar query end-to-end. This is the automated twin of the manual
.claude/skills/verify recipe."""

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import importlib.util, sys
sys.path.insert(0, {repo!r})
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r}
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

# stock confs on purpose: no RUNTIME_CONF, no nanosAsLong, no UTC pin —
# whatever the engine needs it must set itself, as under the driver
spark = (
    SparkSession.builder.master("local[4]")
    .appName("default_session_smoke")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

n_entry = len(mod.entry(spark).collect())
assert n_entry > 0, "entry() returned no rows"

qs = mod.queries()
sf_dir = {sf_dir!r}
for qid in ("stream_tumbling", "scalar_date", "agg_groupby"):
    n = qs[qid](spark, sf_dir).count()
    assert n > 0, f"{{qid}} returned no rows"
print("DEFAULT_SESSION_OK", n_entry)
spark.stop()
"""


def test_entry_and_queries_run_on_default_session(sf_dir):
    script = _SCRIPT.format(
        repo=_HERE,
        entry=os.path.join(_HERE, "__spark_entry__.py"),
        sf_dir=sf_dir,
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=_HERE,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DEFAULT_SESSION_OK" in proc.stdout, proc.stdout
