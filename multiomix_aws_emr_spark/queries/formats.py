"""Source-format breadth: TSV / ORC / JSON-lines scan paths.

The reference's only input format is headered TSV read with pandas
(`scripts/utils.py:53-62`, R1/R2) — here that read is a real distributed
`spark.read.csv(sep='\\t')` with an explicit schema (no inference pass,
which at 100 TB would be a full extra scan). ORC and JSON-lines round out
the formats a lake actually serves.

Each query materializes a deterministic copy of a parquet fixture in the
target format under a scratch dir, reads it back with the format's native
reader, and aggregates — so the oracle is simply the same aggregate on
the parquet view, and any loss of fidelity in the write/read hop
(delimiters, quoting, type round-trips) breaks parity. Writes go through
a content-independent fixed path per (sf, format) with overwrite mode:
idempotent, safe to re-run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import load

_SCRATCH = "/tmp/spark_graft_formats"


def _scratch(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"{_SCRATCH}/{tag}/{fmt}"


_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.LongType()),
        T.StructField("n_comment", T.StringType()),
    ]
)


@query(
    "scan_tsv_roundtrip",
    oracle=(
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations, "
        "CAST(SUM(n_nationkey) AS BIGINT) AS key_sum, MIN(n_name) AS first_name "
        "FROM nation GROUP BY n_regionkey"
    ),
)
def scan_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headered TSV write + schema'd distributed read (the reference's R1
    molecules/clinical reader re-founded on spark.read.csv): parity with
    the parquet original proves the hop is lossless."""
    path = _scratch(sf_dir, "tsv_nation")
    nation = load(spark, sf_dir, "nation")
    nation.write.mode("overwrite").options(sep="\t", header=True).csv(path)
    back = spark.read.csv(path, sep="\t", header=True, schema=_NATION_SCHEMA)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").alias("key_sum"),
        F.min("n_name").alias("first_name"),
    )


@query(
    "scan_orc_roundtrip",
    oracle=(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "SUM(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read of a lineitem projection (exact double/decimal
    round-trip — columnar format #2 beside parquet), then the standard
    pricing rollup. Predicate/column pushdown works on ORC scans the same
    as parquet; the projection keeps the scratch copy narrow."""
    path = _scratch(sf_dir, "orc_lineitem")
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.sum("l_quantity").alias("sum_qty"),
    )


_ORDERS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


@query(
    "scan_json_roundtrip",
    oracle=(
        "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(o_totalprice), 2) AS sum_total "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write + schema'd read (no inference scan) of an orders
    projection, then a status rollup. Doubles survive the decimal text
    hop exactly (Spark prints shortest round-trip representation)."""
    path = _scratch(sf_dir, "json_orders")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").json(path)
    back = spark.read.json(path, schema=_ORDERS_JSON_SCHEMA)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


@query(
    "zorder_scan_pruned",
    oracle=(
        "WITH events_v AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, "
        "event_type, value FROM events) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM events_v "
        "WHERE user_id BETWEEN 10 AND 20 "
        "AND ts_ms BETWEEN 1704067200000 AND 1706745600000 "
        "GROUP BY event_type"
    ),
)
def zorder_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered copy of events + a 2-dimensional box predicate.

    The scratch copy is laid out along the Morton curve of
    (user_id, ts_ms) (operators/zorder.py), so every parquet file covers
    a compact rectangle of that space and the (user range x time range)
    filter prunes most files from their footer stats alone — the
    multi-dimensional data-skipping layout a 100 TB event store needs
    (a plain time-sorted layout skips on time but scans every file for a
    user predicate). Parity with the un-clustered original proves the
    layout hop changes nothing semantically; the pruning geometry itself
    is asserted in tests/test_plans.py from the parquet footers.
    """
    from multiomix_aws_emr_spark.operators.zorder import write_zordered
    from multiomix_aws_emr_spark.sources.tables import events_v

    path = _scratch(sf_dir, "zorder_events")
    ev = events_v(spark, sf_dir).select(
        "event_id", "ts_ms", "user_id", "event_type", "value"
    )
    write_zordered(ev, path, zorder_by=["user_id", "ts_ms"], num_files=16)
    back = spark.read.parquet(path)
    return (
        back.filter(
            F.col("user_id").between(10, 20)
            & F.col("ts_ms").between(1704067200000, 1706745600000)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "maintenance_compact_files",
    oracle=(
        "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value "
        "FROM events) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(value), 2) AS sum_value "
        "FROM events_v GROUP BY event_type"
    ),
)
def maintenance_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every streaming
    ingest eventually needs (micro-batches leave thousands of tiny
    files; scans then pay per-file open cost). A 64-way fragmented copy
    of events is rewritten as 4 right-sized files via repartition (a
    real shuffle — ``coalesce`` would narrow-merge but can skew; for
    sorted layouts use repartitionByRange, cf. operators/zorder.py), and
    the aggregate over the compacted table must match the original —
    compaction is pure layout, zero semantics. File counts are asserted
    in tests/test_plans.py."""
    from multiomix_aws_emr_spark.sources.tables import events_v

    fragmented = _scratch(sf_dir, "fragmented_events")
    compacted = _scratch(sf_dir, "compacted_events")
    ev = events_v(spark, sf_dir).select("ts_ms", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(fragmented)
    spark.read.parquet(fragmented).repartition(4).write.mode(
        "overwrite"
    ).parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


_MERGE_ORACLE = """
WITH events_v AS (
  SELECT epoch_ms(ts) AS ts_ms, user_id, event_type, value FROM events
), bounds AS (
  SELECT (MIN(ts_ms) + MAX(ts_ms)) // 2 AS cutoff FROM events_v
), base AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         SUM(value) AS total
  FROM events_v, bounds
  WHERE event_type = 'purchase' AND ts_ms <= cutoff
  GROUP BY user_id
), delta AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         SUM(value) AS total
  FROM events_v, bounds
  WHERE event_type = 'purchase' AND ts_ms > cutoff
  GROUP BY user_id
), tombstones AS (
  SELECT user_id FROM events_v, bounds
  WHERE event_type = 'error' AND ts_ms > cutoff
  GROUP BY user_id HAVING COUNT(*) >= 2
), merged AS (
  SELECT COALESCE(b.user_id, d.user_id) AS user_id,
         COALESCE(b.n_purchases, 0) + COALESCE(d.n_purchases, 0)
           AS n_purchases,
         ROUND(COALESCE(b.total, 0) + COALESCE(d.total, 0), 2) AS total
  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
)
SELECT m.user_id, m.n_purchases, m.total FROM merged m
WHERE NOT EXISTS (SELECT 1 FROM tombstones t WHERE t.user_id = m.user_id)
"""


@query("maintenance_merge_upsert", oracle=_MERGE_ORACLE)
def maintenance_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the lakehouse CDC-apply) as a pure batch
    plan: a per-user purchase dimension at the mid-log cutoff is merged
    with the post-cutoff delta — matched rows UPDATE (aggregates add),
    unmatched rows INSERT (full outer join), and users with >= 2
    post-cutoff errors are tombstoned out (left-anti). One events scan
    feeds base, delta and tombstones; the cutoff is a 1-row bounds
    aggregate broadcast back (the engine's standard scalar-broadcast
    shape), and the merge itself is one full-outer shuffle on user_id
    plus a broadcast anti join — exactly the plan a Delta/Iceberg MERGE
    compiles to when the delta is small."""
    from multiomix_aws_emr_spark.sources.tables import events_v

    ev = events_v(spark, sf_dir).select("user_id", "ts_ms", "event_type", "value")
    bounds = ev.agg(
        ((F.min("ts_ms") + F.max("ts_ms")) / F.lit(2))
        .cast("bigint")
        .alias("cutoff")
    )
    with_cut = ev.crossJoin(F.broadcast(bounds))
    purchases = with_cut.filter(F.col("event_type") == "purchase")

    def _agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("value").alias("total"),
        )

    base = _agg(purchases.filter(F.col("ts_ms") <= F.col("cutoff")))
    delta = _agg(purchases.filter(F.col("ts_ms") > F.col("cutoff")))
    tombstones = (
        with_cut.filter(
            (F.col("event_type") == "error") & (F.col("ts_ms") > F.col("cutoff"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= 2)
        .select("user_id")
    )
    b = base.alias("b")
    d = delta.alias("d")
    merged = b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer").select(
        F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
        (
            F.coalesce(F.col("b.n_purchases"), F.lit(0))
            + F.coalesce(F.col("d.n_purchases"), F.lit(0))
        ).alias("n_purchases"),
        F.round(
            F.coalesce(F.col("b.total"), F.lit(0.0))
            + F.coalesce(F.col("d.total"), F.lit(0.0)),
            2,
        ).alias("total"),
    )
    return merged.join(F.broadcast(tombstones), "user_id", "left_anti")


@query(
    "scan_partitioned_pruned",
    oracle=(
        "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value "
        "FROM events) "
        "SELECT (ts_ms // 86400000) * 86400000 AS day_ms, "
        "CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS sum_value "
        "FROM events_v WHERE event_type = 'click' GROUP BY 1"
    ),
)
def scan_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning: events are
    rewritten partitioned by event_type, and the 'click'-only read must
    touch exactly ONE partition directory — the predicate prunes at
    PLANNING time from directory names, before any file or footer is
    opened (PartitionFilters in the scan, vs PushedFilters which still
    opens files). Partition-by-low-cardinality-dimension + sort-within
    is the first layout decision of any 100 TB event store; the z-order
    query covers the complementary high-cardinality case. Parity with
    the unpartitioned oracle proves the layout hop changes nothing."""
    import shutil

    from multiomix_aws_emr_spark.sources.tables import events_v

    path = _scratch(sf_dir, "events_by_type")
    shutil.rmtree(path, ignore_errors=True)
    ev = events_v(spark, sf_dir).select("ts_ms", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("event_type") == "click")
        # integer div, not double-divide+cast: float division can round
        # up across a bucket boundary; `div` matches DuckDB's `//` exactly
        .groupBy(
            (F.expr("ts_ms div 86400000") * 86400000).alias("day_ms")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "join_dynamic_partition_prune",
    oracle=(
        "WITH events_v AS (SELECT epoch_ms(ts) AS ts_ms, event_type, value "
        "FROM events), "
        "dim(event_type, category) AS (VALUES "
        "('click', 'engagement'), ('view', 'engagement'), "
        "('purchase', 'conversion'), ('signup', 'conversion'), "
        "('error', 'ops')) "
        "SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(e.value), 2) AS sum_value "
        "FROM events_v e JOIN dim d ON e.event_type = d.event_type "
        "WHERE d.category = 'engagement' "
        "GROUP BY e.event_type"
    ),
)
def join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — the PARTITION-granularity sibling of
    ``join_runtime_bloom``'s row-granularity runtime filter, completing
    the runtime-filter family: the fact is laid out partitioned on the
    join key (``scan_partitioned_pruned``'s first layout decision), the
    dim carries the selective predicate (``category = 'engagement'`` —
    a filter the fact side cannot see statically), and Catalyst inserts
    ``dynamicpruningexpression(event_type IN dynamicpruning#N)`` into
    the scan's PartitionFilters, reusing the broadcast result — so only
    the 2 of 5 partition DIRECTORIES that can match are ever listed or
    opened. At 100 TB this is the difference between scanning the whole
    store and scanning the slice a dashboard filter actually names; it
    needs NO conf overrides (unlike the bloom's size-gated injection) —
    plan-asserted in tests/test_runtime_bloom.py. Parity with the
    unpartitioned oracle proves the layout + pruning hop changes
    nothing."""
    import shutil

    from multiomix_aws_emr_spark.sources.tables import events_v

    path = _scratch(sf_dir, "events_by_type_dpp")
    shutil.rmtree(path, ignore_errors=True)
    ev = events_v(spark, sf_dir).select("ts_ms", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    return (
        back.join(
            F.broadcast(dim.filter(F.col("category") == "engagement")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "maintenance_recompress_zstd",
    oracle=(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def maintenance_recompress_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec migration — the cold-storage maintenance op: rewrite a
    lineitem projection from the default codec to zstd (higher ratio,
    cheap decompression; the standard archival choice) and prove the hop
    is lossless by aggregating the read-back against the original as the
    oracle. A pure storage-layer change: same rows, same schema, smaller
    files — the compression test in tests/test_plans.py asserts the
    zstd copy is actually smaller than an uncompressed one."""
    path = _scratch(sf_dir, "zstd_lineitem")
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    li.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


_MASKED_ORACLE = (
    "SELECT c_custkey, "
    "regexp_replace(c_name, 'Customer#[0-9]+', 'Customer#***') AS name_masked, "
    "CAST(FLOOR(c_acctbal / 1000) * 1000 AS DOUBLE) AS acctbal_band, "
    "c_mktsegment FROM customer"
)


@query("secure_masked_view", oracle=_MASKED_ORACLE)
def secure_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column masking for a governed view — the row/column-security
    pattern: identifying name suffix redacted by regexp, the exact
    balance generalized to a 1000-unit band (k-anonymity-style
    coarsening), raw columns never exposed past the view boundary. Pure
    narrow projection: masking costs nothing at scan time and composes
    under any downstream query, which is why masking belongs IN the
    view, not in consumers."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(
            "c_name", "Customer#[0-9]+", "Customer#***"
        ).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("double")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


_PYDS_ORACLE = """
SELECT f AS feature_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       ROUND(AVG(((s * 31 + f * 17) % 1000) / 10.0), 4) AS avg_value,
       ROUND(MAX(((s * 31 + f * 17) % 1000) / 10.0), 1) AS max_value
FROM range(0, 200) t(s), range(0, 64) u(f)
GROUP BY f
"""


@query("source_python_datasource", oracle=_PYDS_ORACLE)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector through the Spark 4 Python Data Source API
    (sources/pydatasource.py): a registered DataSource with real partition
    planning (one feature block per InputPartition) whose partitions emit
    Arrow RecordBatches — the 6th user surface, re-founding the
    reference's driver-side matrix ingest (scripts/utils.py:38-63) as a
    distributed source. The cell value is closed-form, so the oracle
    recomputes per-feature aggregates over the identical matrix: the
    connector's partitioning, option plumbing, and Arrow batch assembly
    all sit under the cross-engine hash."""
    from multiomix_aws_emr_spark.sources.pydatasource import register

    register(spark)
    m = (
        spark.read.format("omics_matrix")
        .option("n_samples", "200")
        .option("n_features", "64")
        .option("feature_block", "8")
        .load()
    )
    return m.groupBy("feature_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.max("value"), 1).alias("max_value"),
    )


_PYDS_STREAM_ORACLE = """
SELECT i % 7 AS g, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(((i * 31) % 1000) / 10.0), 2) AS sum_value
FROM range(0, 1000) t(i) GROUP BY i % 7
"""


@query("source_python_stream", oracle=_PYDS_STREAM_ORACLE)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the Python Data Source API
    (sources/pydatasource.py): a SimpleDataSourceStreamReader feed with
    real offset tracking replays 1000 closed-form rows through multiple
    micro-batches (rows_per_batch=300 -> 4 real batches) into a
    complete-mode rollup; the run stops on the query's own commit
    telemetry once the source offset reaches the feed end. The DuckDB
    oracle recomputes the rollup from the closed form — offset
    management, batch replay, and the readBetweenOffsets recovery
    contract all sit under the cross-engine hash."""
    from multiomix_aws_emr_spark.sources.pydatasource import (
        run_event_feed_rollup,
    )

    out = run_event_feed_rollup(spark, n_total=1000, rows_per_batch=300)
    return out.select("g", "n", "sum_value")


_PYDS_SINK_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


@query("sink_python_datasource", oracle=_PYDS_SINK_ORACLE)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of the Python Data Source API: documents flow
    through a custom manifest-committed sink (sources/pydatasource.py
    TsvShardSink — per-partition staged TSV shards, driver commit writes
    a manifest listing only successful shards, the two-phase protocol
    every real sink uses), then the readback goes through the MANIFEST
    (never a directory listing, so orphan shards from retried tasks or
    prior runs are invisible) and re-aggregates. The oracle aggregates
    the source table directly — a lost row, double-written shard, or
    manifest slip anywhere in the write path breaks the hash."""
    import json
    import shutil

    from multiomix_aws_emr_spark.sources.pydatasource import register_sink

    register_sink(spark)
    out_dir = _scratch(sf_dir, "pyds_sink")
    shutil.rmtree(out_dir, ignore_errors=True)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.write.format("tsv_shards").option("path", out_dir).mode("append").save()
    with open(os.path.join(out_dir, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    paths = [os.path.join(out_dir, s) for s in manifest["shards"]]
    back = (
        spark.read.schema("doc_id bigint, lang string, n_chars bigint")
        # match the sink's csv.QUOTE_MINIMAL escaping: doubled quotes
        # inside quotes, embedded newlines inside quoted fields, empty
        # field = NULL
        .option("sep", "\t")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("nullValue", "")
        .csv(paths)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
