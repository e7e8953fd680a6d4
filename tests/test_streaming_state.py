"""applyInPandasWithState token-bucket politeness: micro-batch streaming
must equal the batch dequeue + bucket accounting iteration-for-iteration."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.crawl import politeness
from nightcrawler_ds_pipeline_spark.streaming import (
    streaming_token_bucket_dequeue,
)

WINDOW_MS = 10_000
MAX_PER_HOST = 5
DELAYS = {"h-fast": 0, "h-mid": 3_000, "h-slow": 15_000}


def _iter_pdf(it: int) -> pd.DataFrame:
    rows = []
    for hi, (host, delay) in enumerate(sorted(DELAYS.items())):
        for j in range(10):
            rows.append(
                {
                    "iter": it,
                    "host": host,
                    "url_hash": it * 10_000 + hi * 100 + j,
                    "priority": float((j * 37) % 10),
                    "crawl_delay_ms": delay,
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["iter"] = pdf["iter"].astype("int32")
    pdf["crawl_delay_ms"] = pdf["crawl_delay_ms"].astype("int64")
    return pdf


def _batch_reference(spark):
    """The batch-loop semantics: dequeue_gated + next_bucket_state per
    iteration, token state threaded through."""
    out = set()
    state = None
    for it in range(2):
        gated = spark.createDataFrame(_iter_pdf(it))
        batch = politeness.dequeue_gated(
            gated,
            window_ms=WINDOW_MS,
            max_per_host=MAX_PER_HOST,
            bucket_state=state,
            assign_seq=False,
        )
        out |= {
            (r["iter"], r["host"], r["url_hash"]) for r in batch.collect()
        }
        state = politeness.next_bucket_state(
            gated.select("host", "crawl_delay_ms"),
            batch,
            state,
            window_ms=WINDOW_MS,
        )
        state = spark.createDataFrame(state.collect(), state.schema)  # pin
    return out


def test_streaming_token_bucket_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = (
        "iter int, host string, url_hash long, priority double, "
        "crawl_delay_ms long"
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_token_bucket_dequeue(
        stream, window_ms=WINDOW_MS, max_per_host=MAX_PER_HOST
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("polite_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # one file per micro-batch == one politeness window per batch
        for it in range(2):
            pq.write_table(
                pa.Table.from_pandas(_iter_pdf(it), preserve_index=False),
                str(src / f"iter{it}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()

    streamed_rows = spark.sql("SELECT * FROM polite_out").collect()
    streamed = {(r["iter"], r["host"], r["url_hash"]) for r in streamed_rows}
    expected = _batch_reference(spark)
    assert streamed == expected and len(streamed) > 0

    # the slow host (delay 15 s > 10 s window) must be budget-0 in iter 0
    # and dequeue exactly 1 in iter 1 (token accrual across micro-batches)
    slow = sorted(
        (r["iter"], r["url_hash"]) for r in streamed_rows if r["host"] == "h-slow"
    )
    assert [it for it, _ in slow] == [1]
    # the fast host gets max_per_host each window, ranked 1..K
    fast0 = [r for r in streamed_rows if r["host"] == "h-fast" and r["iter"] == 0]
    assert len(fast0) == MAX_PER_HOST
    assert sorted(r["rank_in_host"] for r in fast0) == list(
        range(1, MAX_PER_HOST + 1)
    )
