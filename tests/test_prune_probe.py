"""tools/prune_probe.py contracts at toy scale: the bytes-read evidence
in BASELINE.md rests on (a) correct parsing of the humanized SQL metrics
("1018.0 KiB", "1,234", multi-line totals), and (b) every (layout,
predicate) pair computing the identical answer — in particular the
narrow/widerow pair, whose answer EQUALITY is the column-pruning control.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.prune_probe import (  # noqa: E402
    _PROJECTED,
    PREDICATES_BY_LAYOUT,
    _parse_metric,
    _predicate_df,
    _required_bytes,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1,234", 1234.0),
        ("1018.0 KiB", 1018.0 * 1024),
        ("2.3 MiB", 2.3 * 1024**2),
        ("4.0 GiB", 4.0 * 1024**3),
        ("64", 64.0),
        ("0", 0.0),
        # SQL metrics sometimes render as 'total (min, med, max)' with the
        # total on the last line
        ("total (min, med, max (stageId: taskId))\n2.1 GiB (1 KiB, 2 KiB, 3 KiB)",
         2.1 * 1024**3),
        ("", 0.0),
    ],
)
def test_parse_metric(raw, expected):
    assert _parse_metric(raw) == pytest.approx(expected)


@pytest.fixture(scope="module")
def flat_layout(spark, sf_dir, tmp_path_factory):
    from multiomix_aws_emr_spark.sources.tables import events_v

    path = str(tmp_path_factory.mktemp("prune") / "flat")
    ev = events_v(spark, sf_dir).select(
        "event_id", "ts_ms", "user_id", "event_type", "value"
    )
    ev.repartition(4).write.mode("overwrite").parquet(path)
    return path


def _bounds(spark, path):
    row = (
        spark.read.parquet(path)
        .agg(
            F.expr("percentile_approx(user_id, array(0.45, 0.55))").alias("u"),
            F.expr("percentile_approx(ts_ms, array(0.45, 0.55))").alias("t"),
        )
        .collect()[0]
    )
    return {
        "u_lo": int(row["u"][0]),
        "u_hi": int(row["u"][1]),
        "t_lo": int(row["t"][0]),
        "t_hi": int(row["t"][1]),
    }


def test_narrow_and_widerow_answers_identical(spark, flat_layout):
    bounds = _bounds(spark, flat_layout)
    narrow = _predicate_df(spark, flat_layout, "narrow", bounds).collect()
    wide = _predicate_df(spark, flat_layout, "widerow", bounds).collect()
    assert [tuple(r) for r in narrow] == [tuple(r) for r in wide]


def test_typefilter_matches_direct_recompute(spark, flat_layout):
    bounds = _bounds(spark, flat_layout)
    out = _predicate_df(spark, flat_layout, "typefilter", bounds)
    expect = (
        spark.read.parquet(flat_layout)
        .filter(F.col("event_type") == "click")
        .select((F.expr("ts_ms div 86400000") * 86400000).alias("day_ms"))
        .distinct()
        .count()
    )
    assert out.count() == expect


def test_box_predicate_selects_inside_bounds_only(spark, flat_layout):
    bounds = _bounds(spark, flat_layout)
    n_box = (
        _predicate_df(spark, flat_layout, "box", bounds)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    expect = (
        spark.read.parquet(flat_layout)
        .filter(
            F.col("user_id").between(bounds["u_lo"], bounds["u_hi"])
            & F.col("ts_ms").between(bounds["t_lo"], bounds["t_hi"])
        )
        .count()
    )
    assert n_box == expect


def test_every_layout_list_is_nonempty_and_flat_is_the_denominator():
    for predicate, layouts in PREDICATES_BY_LAYOUT.items():
        assert layouts, predicate
        assert "flat" in layouts, f"{predicate} lacks the flat denominator"
        assert predicate in _PROJECTED, predicate


def test_userfilter_matches_direct_recompute(spark, flat_layout):
    bounds = _bounds(spark, flat_layout)
    n = (
        _predicate_df(spark, flat_layout, "userfilter", bounds)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    expect = (
        spark.read.parquet(flat_layout)
        .filter(F.col("user_id").between(bounds["u_lo"], bounds["u_hi"]))
        .count()
    )
    assert n == expect


def test_required_bytes_footer_math(spark, flat_layout):
    import pyarrow.parquet as pq
    import glob

    bounds = _bounds(spark, flat_layout)
    # widerow must require exactly the sum of every column chunk; narrow
    # exactly the `value` chunks — the two ends of the projection axis
    total = value_only = 0
    for f in glob.glob(os.path.join(flat_layout, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for c in range(rg.num_columns):
                col = rg.column(c)
                total += col.total_compressed_size
                if col.path_in_schema == "value":
                    value_only += col.total_compressed_size
    wide = _required_bytes(flat_layout, "widerow", bounds)
    nar = _required_bytes(flat_layout, "narrow", bounds)
    assert wide["required_mb"] == round(total / 1e6, 1)
    assert nar["required_mb"] == round(value_only / 1e6, 1)
    assert wide["rg_matched"] == wide["rg_total"]
    # a predicate that can never match skips every row group
    impossible = dict(bounds, u_lo=-10, u_hi=-5)
    none = _required_bytes(flat_layout, "userfilter", impossible)
    assert none["rg_matched"] == 0 and none["required_mb"] == 0.0
