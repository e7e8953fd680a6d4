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


def test_stream_seen_dedup_across_microbatches(spark, tmp_path):
    """Streaming twin of the URL-seen set (S13): dropDuplicates on
    url_hash holds the seen keys as streaming state, so a URL that
    re-arrives in a later micro-batch is suppressed — the readStream form
    of the loop's anti-join."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "dedup_src"
    src.mkdir()
    stream = spark.readStream.schema("url_hash long, iter int").parquet(str(src))
    out = stream.dropDuplicates(["url_hash"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("seen_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    try:
        # batch 0: hashes 0..99; batch 1: 50..149 (50 re-arrivals)
        for it, lo in enumerate((0, 50)):
            pdf = pd.DataFrame(
                {"url_hash": range(lo, lo + 100), "iter": [it] * 100}
            )
            pdf["iter"] = pdf["iter"].astype("int32")
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                str(src / f"b{it}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM seen_out").collect()
    assert len(rows) == 150  # 100 + only the 50 genuinely-new
    by_iter = {}
    for r in rows:
        by_iter.setdefault(r["iter"], set()).add(r["url_hash"])
    assert by_iter[0] == set(range(0, 100))
    assert by_iter[1] == set(range(100, 150))  # re-arrivals suppressed
