"""Streaming image ingest (decode → phash → stateful dedup flag) must
equal the batch loop's `_phash_dedup` semantics micro-batch-for-micro-batch:
a row is a dup iff its decoded phash is in the static history, was seen in
an earlier micro-batch, or appears earlier (by image_id) in the same
micro-batch. Corrupt rows bypass the stateful operator with dup=False."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nightcrawler_ds_pipeline_spark.fixtures.generate import gen_images_pdf
from nightcrawler_ds_pipeline_spark.streaming import streaming_image_ingest

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _reference(batches: list[pd.DataFrame], history: set) -> dict:
    """Pure-python twin: {image_id: (in_history, is_phash_dup)}."""
    out = {}
    seen = set()
    for pdf in batches:
        for _, row in pdf.sort_values("image_id").iterrows():
            ph = int(row["phash"])
            if ph == 0:
                out[row["image_id"]] = (False, False)
                continue
            inh = ph in history
            out[row["image_id"]] = (inh, inh or ph in seen)
            seen.add(ph)
    return out


def test_streaming_ingest_matches_batch_semantics(spark, tmp_path):
    # 120 fixture images: exact dups at i=57,107; corrupt at i=13,113
    full = gen_images_pdf(120)
    batches = [full.iloc[:60].copy(), full.iloc[60:].copy()]
    # static history: the phashes of the first two images
    hist_phs = {int(full["phash"].iloc[0]), int(full["phash"].iloc[1])}
    history = spark.createDataFrame(
        [(p,) for p in hist_phs], "phash long"
    )

    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = streaming_image_ingest(stream, history_phash=history)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("img_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for i, pdf in enumerate(batches):
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                str(src / f"batch{i}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM img_ingest").collect()
    got = {r["image_id"]: (r["in_history"], r["is_phash_dup"]) for r in rows}
    expect = _reference(batches, hist_phs)
    assert len(rows) == 120  # every input row exactly once
    assert got == expect
    # the scenario actually exercises every path:
    n_dup = sum(1 for _, d in got.values() if d)
    n_hist = sum(1 for h, _ in got.values() if h)
    assert n_dup >= 4  # 2 planted dups + 2 history hits at minimum
    assert n_hist == 2
    corrupt = [full["image_id"].iloc[13], full["image_id"].iloc[113]]
    assert all(got[c] == (False, False) for c in corrupt)
    # decoded phash equals the stored truth for every ok row (same codec)
    ph_by_id = {r["image_id"]: r["phash_decoded"] for r in rows}
    truth = dict(zip(full["image_id"], full["phash"]))
    ok_ids = [i for i in truth if i not in corrupt]
    assert all(ph_by_id[i] == truth[i] for i in ok_ids)


def test_streaming_ingest_state_survives_restart(spark, tmp_path):
    """Kill the query between micro-batches and restart from the SAME
    checkpoint: the per-phash state store must recover, so a phash first
    seen before the crash still flags as dup after it — the streaming
    analogue of the batch loop's crash-resume invariant (lineage +
    rollback_above). The restarted query only emits the new batch
    (committed offsets are not replayed)."""
    full = gen_images_pdf(120)
    batches = [full.iloc[:60].copy(), full.iloc[60:].copy()]
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")  # file sink: the recoverable one

    def run_one(i, pdf):
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        out = streaming_image_ingest(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                str(src / f"batch{i}.parquet"),
            )
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(sink).collect()

    rows0 = run_one(0, batches[0])
    rows_all = run_one(1, batches[1])
    assert len(rows0) == 60
    assert len(rows_all) == 120  # batch 1 appended, batch 0 NOT replayed
    got = {
        r["image_id"]: (r["in_history"], r["is_phash_dup"])
        for r in rows_all
    }
    expect = _reference(batches, set())
    assert got == expect
    # the discriminating rows: batch-1 dups of batch-0 sources (i%50==7)
    cross = [
        full["image_id"].iloc[i]
        for i in range(60, 120)
        if int(full["phash"].iloc[i]) != 0
        and int(full["phash"].iloc[i])
        in set(full["phash"].iloc[:60].astype(int))
    ]
    assert cross, "fixture must plant at least one cross-restart dup"
    assert all(got[c][1] for c in cross)


def _wait_rows(spark, table, n, deadline_s=90.0):
    import time

    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        if spark.sql(f"SELECT count(*) AS n FROM {table}").collect()[0]["n"] >= n:
            return
        time.sleep(0.2)
    raise AssertionError(f"{table} never reached {n} rows")


def test_streaming_ingest_ttl_readmits(spark, tmp_path):
    """ttl_ms is the streaming twin of CrawlConfig.ttl_iters: a phash whose
    state outlives the TTL is evicted on a later (possibly zero-data)
    micro-batch's timeout callback, and its NEXT occurrence is re-admitted
    as a keeper, not a dup. With ProcessingTimeTimeout the engine schedules
    continuous batches just to fire timeouts, so processAllAvailable never
    settles — the test uses a periodic trigger + row-count polling."""
    import time

    full = gen_images_pdf(3)
    a = full.iloc[[0]].copy()
    a_dup = full.iloc[[0]].copy()
    a_dup["image_id"] = "img_dup_of_0"

    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = streaming_image_ingest(stream, ttl_ms=500)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("img_ttl")
        .trigger(processingTime="250 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        pq.write_table(
            pa.Table.from_pandas(a, preserve_index=False),
            str(src / "batch0.parquet"),
        )
        _wait_rows(spark, "img_ttl", 1)
        time.sleep(3.0)  # > TTL: empty trigger batches evict A's state
        pq.write_table(
            pa.Table.from_pandas(a_dup, preserve_index=False),
            str(src / "batch1.parquet"),
        )
        _wait_rows(spark, "img_ttl", 2)
    finally:
        q.stop()
    got = {
        r["image_id"]: r["is_phash_dup"]
        for r in spark.sql("SELECT * FROM img_ttl").collect()
    }
    assert got[a["image_id"].iloc[0]] is False
    # the dup arrives AFTER eviction → re-admitted, exactly like a
    # TTL-expired seen-set entry re-dequeues in the batch loop
    assert got["img_dup_of_0"] is False

    # control: same two batches, no TTL → the dup IS flagged
    src2 = tmp_path / "src2"
    src2.mkdir()
    stream2 = spark.readStream.schema(SCHEMA).parquet(str(src2))
    out2 = streaming_image_ingest(stream2)
    q2 = (
        out2.writeStream.outputMode("append")
        .format("memory")
        .queryName("img_ttl_ctrl")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        for i, pdf in enumerate([a, a_dup]):
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                str(src2 / f"batch{i}.parquet"),
            )
            q2.processAllAvailable()
    finally:
        q2.stop()
    ctrl = {
        r["image_id"]: r["is_phash_dup"]
        for r in spark.sql("SELECT * FROM img_ttl_ctrl").collect()
    }
    assert ctrl["img_dup_of_0"] is True


def test_streaming_ingest_rocksdb_state(spark, tmp_path):
    """SCALE.md §4b sizes the 10^10-phash state store for RocksDB — prove
    the provider actually works in this env: same ingest, same results,
    and the checkpoint's state dir carries RocksDB zip snapshots instead
    of the default HDFS-backed .delta files."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        full = gen_images_pdf(60)
        src = tmp_path / "src"
        src.mkdir()
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        out = streaming_image_ingest(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("img_rocksdb")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            pq.write_table(
                pa.Table.from_pandas(full, preserve_index=False),
                str(src / "b0.parquet"),
            )
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM img_rocksdb").collect()
        got = {
            r["image_id"]: (r["in_history"], r["is_phash_dup"]) for r in rows
        }
        assert got == _reference([full], set())
        state_files = [
            p for p in (tmp_path / "ckpt" / "state").rglob("*") if p.is_file()
        ]
        assert any(p.suffix == ".zip" for p in state_files), state_files
        assert not any(p.suffix == ".delta" for p in state_files)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_ingest_no_history(spark, tmp_path):
    full = gen_images_pdf(60)
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = streaming_image_ingest(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("img_ingest_nohist")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        pq.write_table(
            pa.Table.from_pandas(full, preserve_index=False),
            str(src / "b0.parquet"),
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM img_ingest_nohist").collect()
    expect = _reference([full], set())
    got = {r["image_id"]: (r["in_history"], r["is_phash_dup"]) for r in rows}
    assert len(rows) == 60
    assert got == expect
    assert not any(h for h, _ in got.values())
    # dup at i=57 flagged, its source not
    assert sum(1 for _, d in got.values() if d) == 1
