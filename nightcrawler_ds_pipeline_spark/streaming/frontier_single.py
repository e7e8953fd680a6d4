"""Single-query streaming frontier: discovery → seen-filter → politeness →
catalog in ONE Structured Streaming query (Spark 4 ``transformWithState``).

The two-query flow (frontier_flow.py) exists because
``applyInPandasWithState`` cannot run downstream of another stateful
operator. Spark 4's ``transformWithStateInPandas`` CAN: the chain

    file stream → dropDuplicatesWithinWatermark(url_hash)      [stateful]
               → groupBy(host).transformWithStateInPandas(...) [stateful]
               → foreachBatch catalog commit

plans and runs as one query — one checkpoint, no intermediate parquet
hand-off, a single restart domain. Politeness arithmetic is the SHARED
``compute_budget``/``emit_ranked`` from politeness_stream.py (one
definition for both streaming paths and the batch loop's pinned
semantics); state is a per-host value row (tokens + delay) plus, in
carry-over mode, a bounded pending ListState. Pending-cap evictions are
emitted with ``rank_in_host = OVERFLOW_RANK`` and the shared foreachBatch
split routes them to the 'overflow' table, exactly like the two-query
flow.

Requirements and fallback: transformWithState needs the RocksDB state
store provider (set per drain and restored after) and a worker-side
``google.protobuf`` (compat.ensure_tws_python_env — vendored-runtime
bootstrap). ``run_streaming_frontier_single`` raises a clear RuntimeError
when the env cannot support it; callers keep frontier_flow as the
fallback. Equivalence of the two flows (admitted set + carry-over
semantics across a restart) is pinned in tests/test_streaming_single.py.

Scale: same two shuffles per micro-batch as the two-query flow (url_hash
for the dedup, host for the dequeue), minus the intermediate sink's write
+ re-read; RocksDB keeps per-key state off-heap with incremental
checkpoints — the 10^7-live-host shape SCALE.md §4c sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
from nightcrawler_ds_pipeline_spark.streaming.catalog_sink import (
    catalog_stream_writer,
)
from nightcrawler_ds_pipeline_spark.streaming.frontier_flow import (
    admitted_stream,
)
from nightcrawler_ds_pipeline_spark.streaming.politeness_stream import (
    DEFAULT_CRAWL_DELAY_MS,
    DEFAULT_MAX_PER_HOST,
    DEFAULT_WINDOW_MS,
    OUT_SCHEMA,
    OVERFLOW_RANK,
    compute_budget,
    emit_ranked,
    first_nonnull_delay,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

_BUCKET_SCHEMA = "tokens_ms long, delay_ms long"
_PENDING_SCHEMA = "iter int, url_hash long, priority double"


class TwsPoliteness(StatefulProcessor):
    """Per-host token-bucket dequeue as a transformWithState processor.

    Identical arithmetic to ``streaming_token_bucket_dequeue`` (both call
    ``compute_budget``): one micro-batch = one politeness window. State:
    a (tokens_ms, delay_ms) value row per host; with ``carry_over`` also
    the bounded pending queue as a ListState (top ``max_pending_per_host``
    by dequeue order, evictions emitted with rank OVERFLOW_RANK).
    ``flush_interval_ms`` registers a processing-time timer whenever
    pending rows remain so they drain on refreshed budgets without a new
    arrival (timeMode must be "ProcessingTime")."""

    def __init__(
        self,
        window_ms: int = DEFAULT_WINDOW_MS,
        max_per_host: int = DEFAULT_MAX_PER_HOST,
        carry_over: bool = False,
        max_pending_per_host: int = 10_000,
        flush_interval_ms: int | None = None,
    ):
        self.window_ms = window_ms
        self.max_per_host = max_per_host
        self.carry_over = carry_over
        self.max_pending_per_host = max_pending_per_host
        self.flush_interval_ms = flush_interval_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.bucket = handle.getValueState("bucket", _BUCKET_SCHEMA)
        self.pending = handle.getListState("pending", _PENDING_SCHEMA)
        self.handle = handle

    def _load(self) -> tuple[int, int]:
        if self.bucket.exists():
            tokens, delay = self.bucket.get()
            return int(tokens), int(delay)
        return 0, DEFAULT_CRAWL_DELAY_MS

    def _load_pending(self) -> pd.DataFrame:
        rows = list(self.pending.get()) if self.carry_over else []
        return pd.DataFrame(
            {
                "iter": pd.array([r[0] for r in rows], dtype="int32"),
                "url_hash": pd.array([r[1] for r in rows], dtype="int64"),
                "priority": pd.array([r[2] for r in rows], dtype="float64"),
            }
        )

    def _window(
        self, host: str, fresh: pd.DataFrame, tokens: int, delay: int, now_ms: int
    ) -> Iterator[pd.DataFrame]:
        """One politeness window over pending + fresh rows (the shared
        batch-loop arithmetic); persists state and yields output frames."""
        merged = pd.concat(
            [self._load_pending(), fresh], ignore_index=True
        ).sort_values(["priority", "url_hash"], ascending=[False, True])
        available, budget = compute_budget(
            tokens, delay, self.window_ms, self.max_per_host
        )
        take = merged.head(int(budget))
        rest = merged.iloc[len(take):]
        if self.carry_over:
            keep = rest.head(self.max_pending_per_host)
            overflow = rest.iloc[len(keep):]
        else:  # pass-once contract: clipped rows are gone
            keep = rest.iloc[0:0]
            overflow = rest.iloc[0:0]
        spent = len(take) * delay if delay > 0 else 0
        self.bucket.update((available - spent, delay))
        if self.carry_over:
            self.pending.put(
                [
                    (int(r.iter), int(r.url_hash), float(r.priority))
                    for r in keep.itertuples()
                ]
            )
            if self.flush_interval_ms is not None and len(keep):
                self.handle.registerTimer(now_ms + self.flush_interval_ms)
        if len(take):
            yield emit_ranked(host, take)
        if len(overflow):
            out = emit_ranked(host, overflow)
            out["rank_in_host"] = OVERFLOW_RANK
            yield out

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        host = key[0]
        pdf = pd.concat(list(rows), ignore_index=True)
        tokens, delay = self._load()
        if len(pdf):
            delay = first_nonnull_delay(pdf, delay)
        fresh = pdf[["iter", "url_hash", "priority"]]
        yield from self._window(
            host, fresh, tokens, delay, timerValues.getCurrentProcessingTimeInMs()
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        host = key[0]
        tokens, delay = self._load()
        fresh = self._load_pending().iloc[0:0]
        yield from self._window(
            host, fresh, tokens, delay, timerValues.getCurrentProcessingTimeInMs()
        )


def streaming_frontier_single_plan(
    spark: SparkSession,
    source_dir: str,
    delay: str = "1 hour",
    window_ms: int = DEFAULT_WINDOW_MS,
    max_per_host: int = DEFAULT_MAX_PER_HOST,
    carry_over: bool = False,
    max_pending_per_host: int = 10_000,
    flush_interval_ms: int | None = None,
    delay_lookup: DataFrame | None = None,
) -> DataFrame:
    """The one-query plan: admit (watermarked seen filter + optional
    broadcast delay lookup — same stage-A builder as the two-query flow)
    chained directly into the stateful dequeue."""
    admitted = admitted_stream(spark, source_dir, delay, delay_lookup=delay_lookup)
    proc = TwsPoliteness(
        window_ms=window_ms,
        max_per_host=max_per_host,
        carry_over=carry_over,
        max_pending_per_host=max_pending_per_host,
        flush_interval_ms=flush_interval_ms,
    )
    time_mode = "ProcessingTime" if flush_interval_ms is not None else "None"
    return admitted.groupBy("host").transformWithStateInPandas(
        proc,
        outputStructType=OUT_SCHEMA,
        outputMode="Append",
        timeMode=time_mode,
    )


def run_streaming_frontier_single(
    spark: SparkSession,
    source_dir: str,
    catalog: SnapshotCatalog,
    checkpoint_dir: str,
    delay: str = "1 hour",
    window_ms: int | None = None,
    max_per_host: int | None = None,
    carry_over: bool = False,
    max_pending_per_host: int | None = None,
    delay_lookup: DataFrame | None = None,
) -> dict:
    """Drain the single-query frontier once (availableNow); exactly-once
    commits into 'dequeued'/'overflow' via the stream_batch_id skip.

    Raises RuntimeError when the env cannot run transformWithState (no
    protobuf anywhere) — callers fall back to run_streaming_frontier.
    Sets the RocksDB state store provider for the drain and restores the
    prior value after (do not run concurrent queries needing a different
    provider in this session; a checkpoint is bound to its provider)."""
    from nightcrawler_ds_pipeline_spark.compat import ensure_tws_python_env

    if not ensure_tws_python_env():
        raise RuntimeError(
            "transformWithState needs google.protobuf in the streaming "
            "python runner and none exists on disk — use "
            "run_streaming_frontier (two-query fallback)"
        )

    kw = {"carry_over": carry_over}
    if window_ms is not None:
        kw["window_ms"] = window_ms
    if max_per_host is not None:
        kw["max_per_host"] = max_per_host
    if max_pending_per_host is not None:
        kw["max_pending_per_host"] = max_pending_per_host

    deq_writer = catalog_stream_writer(
        catalog, "dequeued", meta={"origin": "frontier_single"}
    )
    ovf_writer = catalog_stream_writer(
        catalog, "overflow", meta={"origin": "frontier_single"}
    )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        # same eviction routing contract as frontier_flow.write_batch
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

    prior = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    try:
        q = (
            streaming_frontier_single_plan(
                spark, source_dir, delay, delay_lookup=delay_lookup, **kw
            )
            .writeStream.outputMode("append")
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prior)

    def _count(table: str) -> int:
        return catalog.read(spark, table).count() if catalog.exists(table) else 0

    return {"dequeued": _count("dequeued"), "overflow": _count("overflow")}
