"""Single-query streaming frontier (transformWithState): equivalence with
the two-query flow, carry-over semantics across a restart, and overflow
routing — VERDICT r4 #3 (one query = one checkpoint = no intermediate
sink; the two-query flow stays as the documented fallback)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nightcrawler_ds_pipeline_spark.compat import ensure_tws_python_env

pytestmark = pytest.mark.skipif(
    not ensure_tws_python_env(),
    reason="no google.protobuf runtime on disk — transformWithState "
    "unavailable; two-query flow covers the semantics",
)


def _write_disc(src, name, rows):
    """rows: (url, ts, priority, delay_ms)"""
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "event_ts": pa.array(
                    pd.to_datetime([r[1] for r in rows]), type=pa.timestamp("us")
                ),
                "priority": pa.array([float(r[2]) for r in rows]),
                "crawl_delay_ms": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        ),
        src / name,
    )


WORKLOAD = (
    [
        (f"https://hot.example/p/{i}", "2024-01-01 10:00", i, 1000)
        for i in range(1, 9)
    ]
    + [
        ("https://other.example/a", "2024-01-01 10:00", 1.0, 100),
        ("https://other.example/b", "2024-01-01 10:00", 2.0, 100),
    ]
    + [  # tracking-param variants of hot/p/1 — one canonical seen key
        ("https://hot.example/p/1?utm_source=x", "2024-01-01 10:01", 9.0, 1000),
        ("https://hot.example/p/1?utm_source=y", "2024-01-01 10:02", 9.0, 1000),
    ]
)


def test_single_query_flow_matches_two_query(spark, tmp_path):
    """Identical workload through the one-query chain and the two-query
    flow: the committed dequeue sets (host, url_hash, rank_in_host) must
    be identical — same seen suppression, same budget arithmetic."""
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.streaming import (
        run_streaming_frontier,
        run_streaming_frontier_single,
    )

    src = tmp_path / "disc"
    src.mkdir()
    _write_disc(src, "d1.parquet", WORKLOAD)

    cat_two = SnapshotCatalog(str(tmp_path / "cat_two"))
    two = run_streaming_frontier(
        spark,
        str(src),
        str(tmp_path / "work_two"),
        cat_two,
        str(tmp_path / "ck_two"),
        delay="1 hour",
        window_ms=3000,
        max_per_host=100,
    )
    cat_one = SnapshotCatalog(str(tmp_path / "cat_one"))
    one = run_streaming_frontier_single(
        spark,
        str(src),
        cat_one,
        str(tmp_path / "ck_one"),
        delay="1 hour",
        window_ms=3000,
        max_per_host=100,
    )
    assert one["dequeued"] == two["dequeued"] > 0

    def dequeue_set(cat):
        pdf = cat.read(spark, "dequeued").toPandas()
        return set(
            zip(pdf["host"], pdf["url_hash"], pdf["rank_in_host"])
        )

    assert dequeue_set(cat_one) == dequeue_set(cat_two)
    # budget shape: hot clipped to 3000//1000 = 3, other 3000//100 -> both
    pdf = cat_one.read(spark, "dequeued").toPandas()
    per_host = pdf.groupby("host").size().to_dict()
    assert per_host == {"hot.example": 3, "other.example": 2}


def test_single_query_carry_over_restart(spark, tmp_path):
    """carry_over=True across a RESTART of the same checkpoint: pending
    rows held in ListState compete with (and outrank) new arrivals on the
    next drain — the batch loop's rows-stay-in-frontier semantics in one
    query."""
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.streaming import (
        run_streaming_frontier_single,
    )

    src = tmp_path / "co_disc"
    src.mkdir()
    catalog = SnapshotCatalog(str(tmp_path / "co_cat"))

    def drain():
        return run_streaming_frontier_single(
            spark,
            str(src),
            catalog,
            str(tmp_path / "co_ck"),
            delay="1 hour",
            window_ms=3000,
            max_per_host=100,
            carry_over=True,
        )

    _write_disc(
        src,
        "d1.parquet",
        [
            (f"https://hot.example/p/{i}", "2024-01-01 10:00", i, 1000)
            for i in range(1, 9)
        ],
    )
    c1 = drain()
    assert c1 == {"dequeued": 3, "overflow": 0}  # budget 3000//1000
    deq1 = catalog.read(spark, "dequeued").toPandas()
    assert sorted(deq1["priority"], reverse=True) == [8.0, 7.0, 6.0]

    # restart: one low-priority arrival wakes the host; carried pending
    # (5,4,3,2,1) outranks it — budget dequeues 5,4,3
    _write_disc(
        src,
        "d2.parquet",
        [("https://hot.example/p/99", "2024-01-01 11:30", 0.5, 1000)],
    )
    c2 = drain()
    assert c2["dequeued"] == 6
    deq2 = catalog.read(spark, "dequeued").toPandas()
    new = deq2[~deq2["url_hash"].isin(deq1["url_hash"])]
    assert sorted(new["priority"], reverse=True) == [5.0, 4.0, 3.0]


def test_single_query_overflow_routed(spark, tmp_path):
    """Pending-cap evictions commit to 'overflow', never 'dequeued' —
    same routing contract as the two-query flow."""
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.streaming import (
        run_streaming_frontier_single,
    )

    src = tmp_path / "ov_disc"
    src.mkdir()
    catalog = SnapshotCatalog(str(tmp_path / "ov_cat"))
    _write_disc(
        src,
        "d1.parquet",
        [
            (f"https://hot.example/p/{i}", "2024-01-01 10:00", i, 1000)
            for i in range(1, 11)
        ],
    )
    counts = run_streaming_frontier_single(
        spark,
        str(src),
        catalog,
        str(tmp_path / "ov_ck"),
        delay="1 hour",
        window_ms=3000,
        max_per_host=100,
        carry_over=True,
        max_pending_per_host=2,
    )
    # 10 urls, budget 3, cap 2 -> 3 dequeued, 2 pending, 5 overflow
    assert counts == {"dequeued": 3, "overflow": 5}
    ovf = catalog.read(spark, "overflow").toPandas()
    assert set(ovf["rank_in_host"]) == {0}
    assert sorted(ovf["priority"]) == [1.0, 2.0, 3.0, 4.0, 5.0]
