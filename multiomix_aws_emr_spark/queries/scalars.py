"""Scalar expression surface: string, date, math, JSON, array, map.

Reference analogs: filename normalization `re.sub(' +','_',s).lower()`
(`scripts/core.py:257-259`, R22), timestamp formatting (`scripts/core.py:257`,
`scripts/main.py:143-145`, R23), the tanh binarization math
(`scripts/metaheuristics.py:696-705`, R17), and the Euclidean-distance
array HOF (`scripts/metaheuristics.py:683-694`, R16).

All expressions are JVM-side built-ins inside whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomix_aws_emr_spark.queries.registry import query
from multiomix_aws_emr_spark.sources.tables import (
    events_v,
    load,
    scan_parallel,
    with_events_v,
)


@query(
    "scalar_string",
    oracle=(
        "SELECT p_partkey, UPPER(p_brand) AS brand_u, "
        "LOWER(REGEXP_REPLACE(p_type, ' +', '_', 'g')) AS type_norm, "
        "SUBSTRING(p_name, 1, 5) AS name5, "
        "CAST(LENGTH(p_name) AS INTEGER) AS name_len, "
        "p_brand || '#' || p_type AS brand_type FROM part"
    ),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pipeline mirroring core.py:259's `re.sub(' +','_',…).lower()`
    normalization (R22)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower(F.regexp_replace("p_type", " +", "_")).alias("type_norm"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "scalar_date",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y, "
        "CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m, "
        "CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d, "
        "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) "
        "AS month_start, "
        "CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) "
        "AS VARCHAR) AS plus30, "
        "CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) "
        "AS INTEGER) AS dd FROM orders"
    ),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (ref: strftime formatting, core.py:257 /
    main.py:143-145, R23 — engine standardizes on extract/trunc/diff, not
    format strings, for cross-engine determinism)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.trunc(d, "month").cast("string").alias("month_start"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("dd"),
    )


@query(
    "scalar_math",
    # DuckDB 1.0 has no TANH; 1 - 2/(exp(2x)+1) is the stable identity
    # (saturates to ±1 instead of overflowing for large |x|).
    oracle=with_events_v(
        "SELECT event_id, "
        "ROUND(ABS(1 - 2/(EXP(2*(value/100)) + 1)), 6) AS t, "
        "ROUND(SQRT(ABS(value)), 6) AS sq, "
        "ROUND(LN(ABS(value) + 1), 6) AS lnv, "
        "ROUND(POW(value, 2), 4) AS v2 FROM events_v"
    ),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pipeline with the reference's tanh update rule
    (metaheuristics.py:705, R17)."""
    ev = events_v(spark, sf_dir)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(F.tanh(v / 100)), 6).alias("t"),
        F.round(F.sqrt(F.abs(v)), 6).alias("sq"),
        F.round(F.log(F.abs(v) + 1), 6).alias("lnv"),
        F.round(F.pow(v, 2), 4).alias("v2"),
    )


@query(
    "json_extract_int",
    oracle=with_events_v(
        "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events_v "
        "WHERE CAST(props->>'$.k' AS INTEGER) > 50"
    ),
)
def json_extract_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (closure; the events fixture
    carries JSON-in-string `props`). ``get_json_object`` re-parses the string
    per row, so the scan is spread across all cores first — the fixture is a
    single-file/single-split parquet and would otherwise run serially
    (``scan_parallel`` is a no-op on a many-file production scan)."""
    ev = scan_parallel(events_v(spark, sf_dir))
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@query(
    "scalar_array",
    oracle=(
        "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, "
        "ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_v FROM embeddings"
    ),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar ops — size + 1-based element_at on both engines."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_v"),
    )


@query(
    "array_explode",
    oracle=(
        "SELECT vec_id, ROUND(CAST(UNNEST(embedding) AS DOUBLE), 6) AS v "
        "FROM embeddings"
    ),
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array unnest (ref analog: entrypoint-args flattening, emr.py:156-164,
    R40)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.explode("embedding").alias("_e")).select(
        "vec_id", F.round(F.col("_e").cast("double"), 6).alias("v")
    )


@query(
    "array_aggregate",
    oracle=(
        "SELECT vec_id, ROUND(SQRT(list_sum(list_transform(embedding, "
        "x -> CAST(x AS DOUBLE) * x))), 4) AS l2 FROM embeddings"
    ),
)
def array_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm via array HOFs — the Euclidean-distance machinery of the
    event-horizon test (metaheuristics.py:683-694, R16). Elements cast to
    double BEFORE multiply on both engines (float32 squares diverge)."""
    e = load(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return e.select("vec_id", F.round(l2, 4).alias("l2"))


@query(
    "map_from_json_keys",
    oracle=with_events_v(
        "SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_from_map "
        "FROM events_v"
    ),
)
def map_from_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key extraction: build a map<string,string> from the
    flattened JSON body with str_to_map, then read key 'k' back out. The
    emitted column is scalar, so this hashes cross-engine (the oracle reads
    the same key via the JSON path). regexp_replace + str_to_map cost real
    CPU per row, so the single-split fixture scan is spread across cores
    first (no-op at production split counts)."""
    ev = scan_parallel(events_v(spark, sf_dir))
    m = F.expr(
        "str_to_map(regexp_replace(props, '[{}\" ]', ''), ',', ':')"
    )
    return ev.select(
        "event_id", F.element_at(m, F.lit("k")).cast("int").alias("k_from_map")
    )


_VARIANT_ARRAY_ORACLE = with_events_v(
    """
SELECT event_type, pos, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(tag) AS BIGINT) AS sum_tag,
       CAST(MAX(val1) AS BIGINT) AS max_val1
FROM (
  SELECT e.event_type,
         CAST(t.i AS INTEGER) AS pos,
         CAST(js ->> ('$.tags[' || t.i || ']') AS INTEGER) AS tag,
         CAST(js ->> '$.nest.vals[1]' AS BIGINT) AS val1
  FROM (
    SELECT event_type,
           '{"k": ' || k || ', "tags": [' || (k % 7) || ', ' || (k % 5)
             || ', ' || (k % 3) || '], "nest": {"vals": [' || k || ', '
             || (k * 2) || ']}}' AS js
    FROM (SELECT event_type, CAST(props ->> '$.k' AS INTEGER) AS k
          FROM events_v)
  ) e, range(0, 3) t(i)
)
GROUP BY event_type, pos
"""
)


@query("variant_array_explode", oracle=_VARIANT_ARRAY_ORACLE)
def variant_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested VARIANT arrays (the round-3 extension of
    ``variant_json_shred``): a nested JSON document — scalar + array +
    object-with-array — is parsed ONCE to a binary variant, then
    ``variant_get`` pulls (a) the whole ``$.tags`` array typed
    ``array<int>`` which LATERAL-explodes to rows (posexplode keeps the
    element index), and (b) a path INTO an array element
    (``$.nest.vals[1]``). That's the semi-structured shredding trio a
    100 TB ingest needs: typed top-level paths, array flatten, and
    indexed descent, all binary probes after one parse. The DuckDB
    oracle rebuilds the same document and reads the same paths with its
    JSON operators — cross-engine JSON-array parity. Built-ins only; the
    exploded array comes from variant_get, not a lambda HOF (the Janino
    recompile trap documented in operators/dedup.py does not apply).

    Plan shape (the 4.4s -> ~0.6s lesson, r4): (a) extract ``k`` in its
    own projection BELOW the widening exchange — one props parse per row,
    and the exchange ships a small int instead of the raw JSON string;
    (b) keep the doc variant in an ALIASED intermediate select — referenced
    twice, it is not cheap, so CollapseProject materializes it once instead
    of inlining the parse into every consumer (the original inlined
    parse_json(props) six times); (c) posexplode_outer + a pos-not-null
    filter instead of posexplode — InferFiltersFromGenerate otherwise adds
    ``size(tags)>0 AND isnotnull(tags)``, which predicate pushdown sinks
    BELOW the exchange where it re-evaluates the entire doc pipeline
    inside the single pre-exchange scan task."""
    ev = events_v(spark, sf_dir).select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )
    ev = scan_parallel(ev)
    k = F.col("k")
    doc = F.format_string(
        '{"k": %d, "tags": [%d, %d, %d], "nest": {"vals": [%d, %d]}}',
        k, k % 7, k % 5, k % 3, k, k * 2,
    )
    v = ev.select("event_type", F.parse_json(doc).alias("v"))
    shred = v.select(
        "event_type",
        F.expr("variant_get(v, '$.tags', 'array<int>')").alias("tags"),
        F.expr("variant_get(v, '$.nest.vals[1]', 'bigint')").alias("val1"),
    )
    ex = shred.select(
        "event_type", F.posexplode_outer("tags").alias("pos", "tag"), "val1"
    ).filter(F.col("pos").isNotNull())
    return ex.groupBy("event_type", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tag").cast("bigint").alias("sum_tag"),
        F.max("val1").alias("max_val1"),
    )


@query(
    "variant_json_shred",
    oracle=with_events_v(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum, "
        "CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS k_max "
        "FROM events_v GROUP BY event_type"
    ),
)
def variant_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured tier (Spark 4): ``parse_json`` turns
    the raw JSON column into a binary variant ONCE, then typed
    ``variant_get`` paths shred it into columns feeding a plain hash
    aggregate. Against schema-on-read strings this is the 100 TB play:
    variant parse cost is paid once per row at ingest (or in the scan),
    every downstream path extraction is a cheap binary probe, and the
    extracted columns join the columnar pipeline like any other. The
    oracle reads the same paths via DuckDB's JSON operators — typed
    parity across two different semi-structured engines."""
    ev = events_v(spark, sf_dir)
    shredded = ev.select(
        "event_type",
        F.expr(
            "variant_get(parse_json(props), '$.k', 'int')"
        ).alias("k"),
    )
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.max("k").alias("k_max"),
    )
