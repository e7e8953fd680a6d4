#!/usr/bin/env python
"""spark-submit entry point for the STREAMING image ingest (north_rule:
decode → phash → dedup as a continuously-running flow; the streaming twin
of the batch crawl loop's fetch/decode/dedup stage).

Local sandbox:
    spark-submit --master 'local[32]' \
        --py-files <(cd /root/repo && zip -r - nightcrawler_ds_pipeline_spark) \
        jobs/run_stream_ingest_job.py --source /tmp/img_in \
        --sink /tmp/img_out --checkpoint /tmp/img_ckpt

Drop parquet files matching the BASELINE.json input_hint schema
(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash long) into --source; flagged rows (in_history / is_phash_dup) append
to --sink. Default trigger is availableNow (drain everything then exit, a
batch-shaped run); --follow keeps the query alive for incremental files.
Restart with the same --checkpoint resumes the per-phash state store
exactly-once (memory-sink debugging cannot do this — file sink only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="nightcrawler-ds-pipeline-spark streaming image ingest"
    )
    ap.add_argument("--source", required=True,
                    help="watched dir of input parquet files")
    ap.add_argument("--sink", required=True, help="output parquet dir")
    ap.add_argument("--catalog", action="store_true",
                    help="treat --sink as a SnapshotCatalog root and commit "
                         "each micro-batch as one snapshot (exactly-once via "
                         "stream_batch_id replay skip) into table "
                         "'stream_results' — the resumable-table world the "
                         "batch loop reads")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (state store + offsets; reuse to "
                         "resume exactly-once)")
    ap.add_argument("--history-parquet", default=None,
                    help="optional static parquet with a phash column "
                         "(e.g. a prior run's results) joined as the "
                         "already-seen history")
    ap.add_argument("--max-files-per-trigger", type=int, default=None,
                    help="bound files per micro-batch (default: all "
                         "available)")
    ap.add_argument("--follow", action="store_true",
                    help="keep running for new files instead of draining "
                         "once (availableNow) and exiting")
    ap.add_argument("--timeout-s", type=int, default=None,
                    help="with --follow: stop after this many seconds")
    args = ap.parse_args()

    from nightcrawler_ds_pipeline_spark.session import get_spark
    from nightcrawler_ds_pipeline_spark.streaming import streaming_image_ingest

    # same low-heap guard as the batch crawl job: the source carries a
    # ~20 KB binary column per row
    os.environ.setdefault("SPARK_GRAFT_COLUMNAR_BATCH", "512")
    spark = get_spark(app_name="ncds-stream-ingest-job")

    reader = spark.readStream.schema(INPUT_SCHEMA)
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    stream = reader.parquet(args.source)

    history = None
    if args.history_parquet:
        history = spark.read.parquet(args.history_parquet).select("phash")

    out = streaming_image_ingest(stream, history_phash=history)
    if args.catalog:
        from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
        from nightcrawler_ds_pipeline_spark.streaming import catalog_stream_writer

        catalog = SnapshotCatalog(args.sink)
        writer = (
            out.writeStream.outputMode("append")
            .foreachBatch(
                catalog_stream_writer(
                    catalog, "stream_results", meta={"origin": "stream_ingest"}
                )
            )
            .option("checkpointLocation", args.checkpoint)
        )
    else:
        writer = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", args.sink)
            .option("checkpointLocation", args.checkpoint)
        )
    if not args.follow:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    try:
        if args.follow:
            q.awaitTermination(args.timeout_s)
        else:
            q.awaitTermination()
    finally:
        q.stop()

    if args.catalog:
        n_out = (
            catalog.read(spark, "stream_results").count()
            if catalog.exists("stream_results")
            else 0
        )
    else:
        n_out = (
            spark.read.parquet(args.sink).count() if os.path.isdir(args.sink) else 0
        )
    print(json.dumps({"sink_rows": n_out, "sink": args.sink}))


if __name__ == "__main__":
    main()
