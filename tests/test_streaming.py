"""Structured Streaming: the windowed agg over the events stream must agree
with its batch twin (SURVEY §2.10 — the engine is batch-first; this pins the
streaming analogue)."""

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_stream_window_agg_matches_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = batch.schema

    # stream source dir must contain only the events table
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP (with tz)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    batched = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            batch.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
            .collect()
        )
    }
    assert streamed == batched
    assert len(streamed) > 0
