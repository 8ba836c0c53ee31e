"""Python Data Source API connector units: partition planning, Arrow batch
emission, streaming offset bookkeeping, and the sink's two-phase manifest
commit (the parts the oracle hash can't isolate individually)."""

import json
import os

from multiomix_aws_emr_spark.sources.pydatasource import (
    _FeedStreamReader,
    _MatrixReader,
    _TsvShardWriter,
    register,
)


def test_matrix_reader_partition_planning():
    r = _MatrixReader({"n_samples": "10", "n_features": "20", "feature_block": "8"})
    parts = r.partitions()
    assert [(p.f_start, p.f_end) for p in parts] == [(0, 8), (8, 16), (16, 20)]
    # each partition emits one Arrow batch covering exactly its block
    batch = next(iter(r.read(parts[-1])))
    assert batch.num_rows == 4 * 10
    fids = set(batch.column("feature_id").to_pylist())
    assert fids == {16, 17, 18, 19}


def test_matrix_read_registers_and_parallelizes(spark):
    register(spark)
    m = (
        spark.read.format("omics_matrix")
        .option("n_samples", "50")
        .option("n_features", "16")
        .option("feature_block", "4")
        .load()
    )
    assert m.rdd.getNumPartitions() == 4
    assert m.count() == 50 * 16


def test_feed_stream_reader_offsets_and_replay():
    r = _FeedStreamReader({"n_total": "10", "rows_per_batch": "4"})
    off = r.initialOffset()
    seen = []
    for want_end in (4, 8, 10, 10):
        rows, off = r.read(off)
        seen.extend(rows)
        assert off == {"offset": want_end}
    assert [i for i, _ in seen] == list(range(10))
    # recovery replay must reproduce a committed range exactly
    replay = list(r.readBetweenOffsets({"offset": 4}, {"offset": 8}))
    assert replay == seen[4:8]


def test_sink_manifest_commit_and_abort(tmp_path):
    out = str(tmp_path / "sink")
    w = _TsvShardWriter({"path": out})
    m1 = w.write(iter([(1, "en", 10), (2, "de", 20)]))
    m2 = w.write(iter([(3, "fr", 30)]))
    orphan = w.write(iter([(9, "zz", 99)]))  # a zombie task's output
    # commit manifests only the rows the driver was told about
    w.commit([m1, m2])
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == 3
    assert sorted(manifest["shards"]) == sorted(
        os.path.basename(p) for p in (m1.path, m2.path)
    )
    assert os.path.basename(orphan.path) not in manifest["shards"]
    # abort removes staged shards
    w.abort([orphan])
    assert not os.path.exists(orphan.path)


def test_sink_roundtrip_escapes_adversarial_content(spark, tmp_path):
    """Tabs, quotes, embedded newlines, and NULLs must survive the
    write -> manifest -> readback hop losslessly (the csv.QUOTE_MINIMAL /
    read-option pairing)."""
    import json

    from multiomix_aws_emr_spark.sources.pydatasource import register_sink

    register_sink(spark)
    rows = [
        (1, "plain", 10),
        (2, "has\ttab", 20),
        (3, 'has"quote', 30),
        (4, "has\nnewline", 40),
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    out = str(tmp_path / "sink")
    df.write.format("tsv_shards").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == 5
    paths = [os.path.join(out, s) for s in manifest["shards"]]
    back = (
        spark.read.schema("doc_id bigint, lang string, n_chars bigint")
        .option("sep", "\t")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("nullValue", "")
        .csv(paths)
    )
    got = {r.doc_id: (r.lang, r.n_chars) for r in back.collect()}
    assert got == {i: (lang, n) for i, lang, n in rows}


def test_prewarm_datasource_api_idempotent(spark):
    """The bench's datasource prewarm (r15) must be repeatable on a
    shared session, never raise, and leave the connectors registered and
    usable afterwards."""
    from multiomix_aws_emr_spark.sources.pydatasource import (
        prewarm_datasource_api,
    )

    prewarm_datasource_api(spark)
    prewarm_datasource_api(spark)  # idempotent re-run
    m = (
        spark.read.format("omics_matrix")
        .option("n_samples", "3")
        .option("n_features", "2")
        .option("feature_block", "1")
        .load()
    )
    assert m.count() == 6
