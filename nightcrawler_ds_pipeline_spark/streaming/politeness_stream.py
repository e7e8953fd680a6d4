"""Streaming politeness: the token-bucket dequeue as a CUSTOM STATEFUL
Structured Streaming operator (``applyInPandasWithState``).

The batch loop treats one iteration as one politeness window
(crawl/politeness.py). The streaming form treats one MICRO-BATCH as one
window: per host, the operator keeps ``tokens_ms`` as group state across
micro-batches and emits exactly the rows the budget allows, by the same
deterministic (priority desc, url_hash asc) order. Identical arithmetic to
`dequeue_gated` + `next_bucket_state` (available = min(2·window, tokens +
window); budget = floor(available/delay) clamped to [0, max_per_host];
spent = n_allowed × delay) — pinned equal in tests/test_streaming_state.py.

This is the applyInPandasWithState pattern the engine would use for a
continuous frontier feed (readStream from the frontier table) instead of
iteration batch jobs; state is per-host (small), rows stream through.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nightcrawler_ds_pipeline_spark.crawl.politeness import (
    DEFAULT_CRAWL_DELAY_MS,
    DEFAULT_MAX_PER_HOST,
    DEFAULT_WINDOW_MS,
)

OUT_SCHEMA = (
    "iter int, host string, url_hash long, priority double, rank_in_host int"
)
STATE_SCHEMA = "tokens_ms long"


def streaming_token_bucket_dequeue(
    frontier_stream: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    max_per_host: int = DEFAULT_MAX_PER_HOST,
) -> DataFrame:
    """frontier_stream columns: iter, host, url_hash, priority,
    crawl_delay_ms. Returns the politeness-allowed rows per micro-batch
    with per-host rank; host token levels persist as group state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        tokens = int(state.get[0]) if state.exists else 0
        available = min(2 * window_ms, tokens + window_ms)
        delay = (
            int(pdf["crawl_delay_ms"].iloc[0])
            if pdf["crawl_delay_ms"].notna().any()
            else DEFAULT_CRAWL_DELAY_MS
        )
        if delay <= 0:
            budget = max_per_host
            spent = 0
        else:
            budget = max(0, min(max_per_host, available // delay))
        ordered = pdf.sort_values(
            ["priority", "url_hash"], ascending=[False, True]
        ).head(int(budget))
        if delay > 0:
            spent = len(ordered) * delay
        state.update((available - spent,))
        if len(ordered) == 0:
            return
        out = ordered[["iter", "url_hash", "priority"]].copy()
        out.insert(1, "host", host)
        out["rank_in_host"] = range(1, len(out) + 1)
        yield out[["iter", "host", "url_hash", "priority", "rank_in_host"]]

    return frontier_stream.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
