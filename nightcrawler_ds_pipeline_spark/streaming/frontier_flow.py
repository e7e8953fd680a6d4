"""End-to-end streaming frontier: discovery → seen-filter → politeness →
catalog — the batch crawl loop's front half as a continuous flow.

Two chained Structured Streaming queries, not one: Spark does not allow a
custom stateful operator (``applyInPandasWithState``) downstream of
another stateful operator (``dropDuplicatesWithinWatermark``) in a single
query, and the two-stage shape is what a production deployment wants
anyway — each stage restarts independently from its own checkpoint.

- **Stage A (admit)**: file-stream of discovered URLs →
  ``streaming_seen_filter`` (canonicalize→xxhash64 seen key, watermark-
  bounded state) → exactly-once parquet file sink (``_spark_metadata``
  commit log), which doubles as the replayable hand-off to stage B.
- **Stage B (dequeue)**: file-stream over stage A's sink →
  ``streaming_token_bucket_dequeue`` (per-host token buckets as group
  state, one micro-batch = one politeness window) →
  ``catalog_stream_writer`` commit into the SnapshotCatalog table
  ``dequeued`` (exactly-once via stream_batch_id replay skip).

Scale: stage A state ≈ arrival_rate × watermark horizon (SCALE.md §4c);
stage B state is one counter per live host. Both stages shuffle once, on
url_hash and host respectively — the same two shuffles the batch loop's
probe/dequeue stages pay per iteration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
from nightcrawler_ds_pipeline_spark.streaming.catalog_sink import (
    catalog_stream_writer,
)
from nightcrawler_ds_pipeline_spark.streaming.politeness_stream import (
    OVERFLOW_RANK,
    streaming_token_bucket_dequeue,
)
from nightcrawler_ds_pipeline_spark.streaming.seen_stream import (
    streaming_seen_filter,
)

DISCOVERY_SCHEMA = (
    "url string, event_ts timestamp_ntz, priority double, crawl_delay_ms long"
)
ADMITTED_SCHEMA = (
    "iter int, host string, url_hash long, priority double, "
    "crawl_delay_ms long, canonical_url string, event_ts timestamp"
)


def admitted_stream(
    spark: SparkSession,
    source_dir: str,
    delay: str,
    delay_lookup: DataFrame | None = None,
) -> DataFrame:
    """Stage A plan: discovery files → watermark-bounded seen filter.

    ``delay_lookup``: optional STATIC (host, crawl_delay_ms) table — the
    engine-owned politeness config (robots crawl-delay cache), same role
    as the batch loop's config lookup (J5). Joined BROADCAST after the
    seen filter (post-dedup, fewest rows; a stream-static equi-join is
    re-looked-up per micro-batch, so a refreshed cache takes effect on the
    next batch). Lookup wins over any feed-supplied delay; both absent →
    the dequeue operator's default.
    """
    stream = (
        spark.readStream.schema(DISCOVERY_SCHEMA)
        .parquet(source_dir)
        .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
    )
    admitted = streaming_seen_filter(stream, delay=delay)
    if delay_lookup is not None:
        lk = F.broadcast(
            delay_lookup.select(
                "host", F.col("crawl_delay_ms").alias("_lk_delay_ms")
            )
        )
        admitted = admitted.join(lk, "host", "left").withColumn(
            "crawl_delay_ms",
            F.coalesce(F.col("_lk_delay_ms"), F.col("crawl_delay_ms")),
        )
    return admitted.select(
        F.lit(0).alias("iter"),
        "host",
        "url_hash",
        "priority",
        "crawl_delay_ms",
        "canonical_url",
        "event_ts",
    )


def run_streaming_frontier(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    catalog: SnapshotCatalog,
    checkpoint_root: str,
    delay: str = "1 hour",
    window_ms: int | None = None,
    max_per_host: int | None = None,
    carry_over: bool = False,
    max_pending_per_host: int | None = None,
    delay_lookup: DataFrame | None = None,
) -> dict:
    """Drain both stages once (availableNow) and return counts
    (``admitted`` / ``dequeued`` / ``overflow``). With ``carry_over=True``
    pending-cap evictions are committed to the separate ``overflow`` table
    (candidates for re-discovery), never to ``dequeued``.

    Re-invoking with the same ``work_dir``/``checkpoint_root``/``catalog``
    resumes every piece of state exactly-once: seen keys (stage A state
    store), hand-off files (``_spark_metadata``), host token levels
    (stage B state store) and committed micro-batches (catalog manifest).
    """
    qa = (
        admitted_stream(spark, source_dir, delay, delay_lookup=delay_lookup)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", work_dir)
        .option("checkpointLocation", f"{checkpoint_root}/admit")
        .trigger(availableNow=True)
        .start()
    )
    qa.awaitTermination()

    # empty discovery source: the file sink only materializes work_dir on
    # its first committed batch, so there is nothing for stage B to read
    # (or count) yet — report state instead of crashing on a missing path
    def _count(table: str) -> int:
        return catalog.read(spark, table).count() if catalog.exists(table) else 0

    if not os.path.isdir(work_dir):
        return {
            "admitted": 0,
            "dequeued": _count("dequeued"),
            "overflow": _count("overflow"),
        }

    frontier = spark.readStream.schema(ADMITTED_SCHEMA).parquet(work_dir)
    kw = {"carry_over": carry_over}
    if window_ms is not None:
        kw["window_ms"] = window_ms
    if max_per_host is not None:
        kw["max_per_host"] = max_per_host
    if max_pending_per_host is not None:
        kw["max_pending_per_host"] = max_pending_per_host

    deq_writer = catalog_stream_writer(
        catalog, "dequeued", meta={"origin": "frontier"}
    )
    ovf_writer = catalog_stream_writer(
        catalog, "overflow", meta={"origin": "frontier"}
    )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        # pending-cap evictions (rank_in_host == OVERFLOW_RANK) are NOT
        # dequeues: route them to their own 'overflow' table so a consumer
        # fetching from 'dequeued' never crawls budget-evicted URLs. Each
        # table keeps its own stream_batch_id watermark, so a crash between
        # the two commits replays idempotently (dequeued skips, overflow
        # re-writes). Empty overflow batches are skipped — no manifest
        # bloat, and skipping cannot double-commit (only the LAST batch
        # replays and it would be empty again).
        if not carry_over:
            deq_writer(df, batch_id)
            return
        df = df.persist()
        try:
            deq_writer(df.filter(F.col("rank_in_host") != OVERFLOW_RANK), batch_id)
            ovf = df.filter(F.col("rank_in_host") == OVERFLOW_RANK)
            if not ovf.isEmpty():
                ovf_writer(ovf, batch_id)
        finally:
            df.unpersist()

    qb = (
        streaming_token_bucket_dequeue(frontier, **kw)
        .writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", f"{checkpoint_root}/dequeue")
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination()

    # explicit schema: a zero-row drain leaves _spark_metadata with no data
    # files, which a schemaless batch read cannot infer from
    admitted = spark.read.schema(ADMITTED_SCHEMA).parquet(work_dir).count()
    return {
        "admitted": admitted,
        "dequeued": _count("dequeued"),
        "overflow": _count("overflow"),
    }
