"""Stream-stream interval join: fetch results ⋈ extraction results.

In the batch loop, fetch and extract are stages of one iteration
(pipeline/stages.py) so their rows meet in an ordinary equi-join. In a
continuous deployment they arrive as two independent streams (the fetch
fleet and the extractor fleet ack at different latencies), and matching
them is Spark's watermarked stream-stream join: state on BOTH sides,
bounded by the watermarks plus an event-time interval condition, so a
fetch row is held only until its extract partner can no longer arrive
(and vice versa).

Scale: state per side ≈ arrival_rate × (watermark + interval) rows — the
join key (image_id) and event times shuffle once per side onto the same
partitioning, payload-free if the caller projects first (the fetch
stream's binary column should be dropped or sunk before the join, same
rule as the batch loop: bytes never enter a shuffle).

Semantics pinned in tests/test_streaming.py: pairs within the interval
match exactly once; an extract arriving outside the interval does not
match; with ``how="leftOuter"`` an unmatched fetch row emits with NULL
extract columns once the watermark proves no partner can come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_fetch_extract_streams(
    fetch_stream: DataFrame,
    extract_stream: DataFrame,
    key: str = "image_id",
    fetch_ts: str = "fetch_ts",
    extract_ts: str = "extract_ts",
    watermark: str = "10 minutes",
    max_lag: str = "interval 5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the extract event lands
    within ``[fetch_ts, fetch_ts + max_lag]``.

    Both inputs must carry their event-time column; both get
    ``withWatermark(…, watermark)`` — required for the engine to evict
    join state and (for outer joins) to emit NULL-padded rows. ``how``:
    ``"inner"`` or ``"leftOuter"`` (fetch side preserved).
    """
    f = fetch_stream.withWatermark(fetch_ts, watermark)
    e = extract_stream.withWatermark(extract_ts, watermark)
    cond = (
        (f[key] == e[key])
        & (F.col(extract_ts) >= F.col(fetch_ts))
        & (F.col(extract_ts) <= F.col(fetch_ts) + F.expr(max_lag))
    )
    return f.join(e, cond, how).drop(e[key])
