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
CARRY_STATE_SCHEMA = (
    "tokens_ms long, pending_iters array<int>, pending_hashes array<long>, "
    "pending_priorities array<double>, pending_delay_ms long"
)
OVERFLOW_RANK = 0  # rank_in_host sentinel: evicted from the pending cap,
# NOT dequeued — route these back to discovery instead of fetching them


# shared by this module's applyInPandasWithState operators AND the
# transformWithState single-query flow (frontier_single.py) — one
# definition so the two streaming politeness paths cannot drift from the
# batch loop's arithmetic (pinned in tests/test_streaming_state.py)
def compute_budget(
    tokens: int, delay: int, window_ms: int, max_per_host: int
) -> tuple[int, int]:
    """(available, budget) under the batch loop's token-bucket arithmetic:
    available = min(2*window, tokens + window); budget = floor(available /
    delay) clamped to [0, max_per_host] (unlimited-rate hosts get the
    hard cap)."""
    available = min(2 * window_ms, tokens + window_ms)
    if delay <= 0:
        return available, max_per_host
    return available, max(0, min(max_per_host, available // delay))


def emit_ranked(host, ordered: pd.DataFrame, start_rank: int = 1) -> pd.DataFrame:
    """Project dequeue output rows with per-host rank (OUT_SCHEMA order)."""
    out = ordered[["iter", "url_hash", "priority"]].copy()
    out.insert(1, "host", host)
    out["rank_in_host"] = range(start_rank, start_rank + len(out))
    return out[["iter", "host", "url_hash", "priority", "rank_in_host"]]


def first_nonnull_delay(pdf: pd.DataFrame, fallback: int) -> int:
    """First NON-NULL crawl_delay_ms in the batch (int(NaN) would raise
    inside a stateful UDF and fail the whole micro-batch)."""
    s = pdf["crawl_delay_ms"].dropna()
    return int(s.iloc[0]) if len(s) else fallback


def streaming_token_bucket_dequeue(
    frontier_stream: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    max_per_host: int = DEFAULT_MAX_PER_HOST,
    carry_over: bool = False,
    max_pending_per_host: int = 10_000,
    flush_interval_ms: int | None = None,
) -> DataFrame:
    """frontier_stream columns: iter, host, url_hash, priority,
    crawl_delay_ms. Returns the politeness-allowed rows per micro-batch
    with per-host rank; host token levels persist as group state.

    ``carry_over=False`` (default) keeps the original pass-once contract:
    budget-clipped rows are gone (batch-parity arithmetic pinned in
    test_streaming_state.py). ``carry_over=True`` closes the semantic gap
    with the batch loop, where un-dequeued rows STAY in the frontier: the
    clipped remainder is held in group state (a bounded per-host pending
    queue, top ``max_pending_per_host`` by the dequeue order) and competes
    with new arrivals in later micro-batches. Rows evicted from the cap
    are emitted with ``rank_in_host = 0`` (OVERFLOW_RANK) rather than
    silently dropped — the caller re-routes them to discovery. State per
    host is O(max_pending_per_host) scalars; at 10^7 live hosts keep the
    cap small and the store on RocksDB (SCALE.md §4b/4c).

    ``flush_interval_ms`` (carry-over only) arms a ProcessingTimeTimeout
    so pending rows drain on a refreshed budget even when no new row for
    the host arrives — needed for CONTINUOUS triggers; in availableNow
    drains the query terminates before zero-data batches fire, so pending
    drains on the next invocation or arrival (same caveat as the ingest
    TTL: drive continuous queries with a periodic trigger and poll).
    """

    _emit = emit_ranked

    def _budget(tokens: int, delay: int) -> tuple[int, int]:
        return compute_budget(tokens, delay, window_ms, max_per_host)

    _first_delay = first_nonnull_delay

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        tokens = int(state.get[0]) if state.exists else 0
        delay = _first_delay(pdf, DEFAULT_CRAWL_DELAY_MS)
        available, budget = _budget(tokens, delay)
        ordered = pdf.sort_values(
            ["priority", "url_hash"], ascending=[False, True]
        ).head(int(budget))
        spent = len(ordered) * delay if delay > 0 else 0
        state.update((available - spent,))
        if len(ordered) == 0:
            return
        yield _emit(host, ordered)

    def fn_carry(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            tokens, p_iters, p_hashes, p_prios, p_delay = state.get
            pending = pd.DataFrame(
                {
                    "iter": pd.array(p_iters or [], dtype="int32"),
                    "url_hash": pd.array(p_hashes or [], dtype="int64"),
                    "priority": pd.array(p_prios or [], dtype="float64"),
                }
            )
            tokens = int(tokens)
            delay = int(p_delay)
        else:
            tokens, pending, delay = 0, pd.DataFrame(
                columns=["iter", "url_hash", "priority"]
            ), DEFAULT_CRAWL_DELAY_MS
        if state.hasTimedOut:
            fresh = pending.iloc[0:0]
        else:
            fresh = pd.concat(list(pdfs), ignore_index=True)
            if len(fresh):
                delay = _first_delay(fresh, delay)
            fresh = fresh[["iter", "url_hash", "priority"]]
        merged = pd.concat([pending, fresh], ignore_index=True).sort_values(
            ["priority", "url_hash"], ascending=[False, True]
        )
        available, budget = _budget(tokens, delay)
        take = merged.head(int(budget))
        rest = merged.iloc[len(take):]
        keep = rest.head(max_pending_per_host)
        overflow = rest.iloc[len(keep):]
        spent = len(take) * delay if delay > 0 else 0
        state.update(
            (
                available - spent,
                [int(x) for x in keep["iter"]],
                [int(x) for x in keep["url_hash"]],
                [float(x) for x in keep["priority"]],
                int(delay),
            )
        )
        if flush_interval_ms is not None and len(keep):
            state.setTimeoutDuration(flush_interval_ms)
        if len(take):
            yield _emit(host, take)
        if len(overflow):
            out = _emit(host, overflow)
            out["rank_in_host"] = OVERFLOW_RANK
            yield out

    if carry_over:
        return frontier_stream.groupBy("host").applyInPandasWithState(
            fn_carry,
            outputStructType=OUT_SCHEMA,
            stateStructType=CARRY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if flush_interval_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    return frontier_stream.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
