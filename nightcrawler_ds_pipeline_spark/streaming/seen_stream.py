"""Event-time-bounded streaming URL-seen filter.

The batch loop bounds its seen set with ``CrawlConfig.ttl_iters`` (iteration
TTL) and the stream-side image dedup bounds state with a processing-time TTL
(streaming/image_ingest.py).  This module adds the third, fully
Spark-native variant: ``dropDuplicatesWithinWatermark`` keyed on the SAME
canonicalize→xxhash64 seen key the batch loop uses (functions/urls.py:91,128
— the north-rule invariant), with state evicted by the EVENT-TIME watermark
instead of wall-clock.  At 10^10 URLs this is the shape you want for a
discovery firehose: state holds only the keys whose event time is within
the watermark horizon, the engine handles eviction (RocksDB-backed store at
scale), and a URL re-arriving after the horizon re-admits exactly like a
TTL-expired seen-set entry re-dequeues in the batch loop.

Semantics (pinned in tests/test_streaming.py):
- duplicates whose event times fall within ``delay`` of the key's first
  occurrence are suppressed — including same-micro-batch duplicates and
  tracking-param variants (they share a canonical form, hence a key);
- once the watermark passes ``first_seen_ts + delay`` the key's state is
  evicted and the next occurrence is emitted again (re-admission);
- rows arriving behind the watermark are dropped by the engine (late-data
  contract, same as any stateful streaming operator).

Reference analogue: the response-cache URL-seen set (SURVEY §2 S13) under a
freshness horizon, e.g. "re-crawl anything not seen for 7 days".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nightcrawler_ds_pipeline_spark.functions.urls import with_canonical


def streaming_seen_filter(
    url_stream: DataFrame,
    event_time_col: str = "event_ts",
    delay: str = "10 minutes",
    url_col: str = "url",
) -> DataFrame:
    """First-occurrence filter over a URL stream, state bounded by watermark.

    ``url_stream``: streaming DataFrame with at least (``url_col``,
    ``event_time_col``: timestamp).  Returns the input rows plus the
    frontier key triple (canonical_url, url_hash, host), keeping only the
    first occurrence of each ``url_hash`` within the watermark horizon.

    Scale note: ``dropDuplicatesWithinWatermark`` shuffles once on the
    dedup key and keeps one small state row per key with engine-managed
    eviction — no unbounded ``dropDuplicates`` state, no driver-side set.
    """
    keyed = with_canonical(url_stream, url_col=url_col)
    return keyed.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )
