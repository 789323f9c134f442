"""Python DataSource tests: determinism, partition-invariance, and
operator compatibility of the in-executor events generator."""

from __future__ import annotations

from pyspark.sql import functions as F


def _read(spark, **opts):
    from demo_etl_spark.sources import EventGenDataSource

    spark.dataSource.register(EventGenDataSource)
    r = spark.read.format("eventgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_eventgen_rowcount_schema_and_parallelism(spark):
    df = _read(spark, rows=10_000, partitions=8, seed=7)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 10_000
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    )
    assert df.select("event_id").distinct().count() == 10_000


def test_eventgen_partitioning_does_not_change_data(spark):
    """Counter-based generation: 2 partitions and 16 partitions must
    produce IDENTICAL rows (retry/speculation safety)."""
    a = _read(spark, rows=5_000, partitions=2, seed=11)
    b = _read(spark, rows=5_000, partitions=16, seed=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_eventgen_feeds_existing_operators(spark):
    from demo_etl_spark.operators.events import hourly_partials, props_breakdown

    df = _read(spark, rows=20_000, partitions=8, seed=3)
    hp = hourly_partials(df)
    agg = hp.agg(F.sum("n_events").alias("n")).first()
    assert agg["n"] == 20_000  # every generated event lands in a bucket
    pb = props_breakdown(df)
    # props parse as JSON: k in [0, 100) → deciles 0..9 only
    deciles = {r["k_decile"] for r in pb.select("k_decile").distinct().collect()}
    assert deciles <= set(range(10))


def test_auditsink_commit_protocol(spark, tmp_path):
    """The audit a sink commits must describe exactly the rows written —
    and be independent of how the write was partitioned."""
    import json

    from demo_etl_spark.sources import AuditSinkDataSource

    spark.dataSource.register(AuditSinkDataSource)
    df = spark.range(1_000).selectExpr("id", "id * 2 AS v")
    audits = []
    for parts in (3, 13):
        p = str(tmp_path / f"audit_{parts}.json")
        df.repartition(parts).write.format("auditsink").option(
            "path", p
        ).mode("append").save()
        audits.append(json.load(open(p)))
    assert audits[0]["rows"] == audits[1]["rows"] == 1_000
    assert audits[0]["checksum"] == audits[1]["checksum"]  # content-addressed
    assert audits[0]["partitions"] == 3 and audits[1]["partitions"] == 13


def test_eventgen_stream_equals_batch(spark, tmp_path):
    """The streaming reader over the same offset space must deliver
    exactly the batch dataset once drained (replayable offsets ==
    deterministic generation)."""
    from demo_etl_spark.sources import EventGenDataSource

    spark.dataSource.register(EventGenDataSource)
    opts = {"rows": 4_000, "partitions": 4, "seed": 5, "rowsPerBatch": 1500}
    reader = spark.readStream.format("eventgen")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName("evg_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # drain: 4000 rows / 1500-row batches → 3 micro-batches (offsets
    # saturate at rows; availableNow would stop at the FIRST offset
    # snapshot, so poll the sink instead)
    import time

    deadline = time.time() + 120
    while time.time() < deadline and spark.table("evg_stream").count() < 4_000:
        time.sleep(1)
    q.stop()
    stream_df = spark.table("evg_stream")
    batch = spark.read.format("eventgen").options(**{k: str(v) for k, v in opts.items()}).load()
    assert stream_df.count() == 4_000
    assert stream_df.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream_df).count() == 0
