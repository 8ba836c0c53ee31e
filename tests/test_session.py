"""Session conf assembly — pure-dict tests (no JVM).

The one behavioral contract worth pinning here is override ORDER:
``assemble_conf`` layers harness sizing, then RUNTIME_CONF, then caller
``extra_conf`` LAST. The local-cluster probe depends on the last layer
winning (it must force ``spark.executor.memory`` past both defaults and
RUNTIME_CONF); a refactor that reorders the layers would make executors
silently launch at the 1g default and OOM mid-stage — exactly the
failure the round-8 probe hit before the hook existed.
"""

from multiomix_aws_emr_spark.session import RUNTIME_CONF, assemble_conf


def test_default_assembly_carries_runtime_conf_and_sizing():
    conf = assemble_conf(32)
    assert conf["spark.sql.shuffle.partitions"] == "32"
    assert conf["spark.ui.enabled"] == "false"
    for key, value in RUNTIME_CONF.items():
        assert conf[key] == value


def test_extra_conf_wins_over_runtime_conf_and_defaults():
    runtime_key = next(iter(RUNTIME_CONF))
    overrides = {
        runtime_key: "PROBE_OVERRIDE",
        "spark.executor.memory": "24576m",
        "spark.sql.shuffle.partitions": "7",
    }
    conf = assemble_conf(32, overrides)
    assert conf[runtime_key] == "PROBE_OVERRIDE"
    assert conf["spark.executor.memory"] == "24576m"
    assert conf["spark.sql.shuffle.partitions"] == "7"
    # and the unrelated layers are untouched
    others = {k: v for k, v in RUNTIME_CONF.items() if k != runtime_key}
    for key, value in others.items():
        assert conf[key] == value


def test_none_extra_conf_is_a_no_op():
    assert assemble_conf(16, None) == assemble_conf(16, {})
