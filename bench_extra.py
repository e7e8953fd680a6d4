#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN — extra
benchmarks live here, per the optimization-round rules).

Modes:
  python bench_extra.py queries [name ...]   noop-sink per-query timing
      (reps via SPARK_GRAFT_HEADLINE_REPS, default 3) + writes
      plans/r06/<name>_<tag>.txt explain("formatted") captures
      (tag via SPARK_GRAFT_PLAN_TAG, default none = no plan capture)
  python bench_extra.py crawl                one t2 crawl run with per-phase
      wall timings (monkeypatched catalog.write / actions)
  python bench_extra.py crawl-reps           median-of-3 t2 crawl like bench.py

Environment mirrors bench.py: $SPARK_GRAFT_SF_DIR (default sf0.1),
$SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _spark():
    from nightcrawler_ds_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ncds-bench-extra", cpus=CPUS)
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(1000).collect()
    return spark


def run_queries(names: list[str] | None = None) -> None:
    import __spark_entry__ as e

    spark = _spark()
    qs = e.queries()
    from bench import HEADLINE

    targets = names or HEADLINE
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "3")))
    out: dict[str, dict] = {}
    for name in targets:
        if name not in qs:
            print(f"## {name}: not in registry", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        if tag:
            import contextlib
            import io

            os.makedirs(PLANS_DIR, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(runs)[len(runs) // 2], "runs": runs}
        print(f"{name}: {out[name]['median']} {runs}", flush=True)
    print(json.dumps({k: v["median"] for k, v in out.items()}))


def run_crawl_profile() -> None:
    """One t2 crawl with per-action wall timings: monkeypatch
    SnapshotCatalog.write and DataFrame actions used by the loop."""
    import shutil

    from nightcrawler_ds_pipeline_spark.crawl import loop as loop_mod
    from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    spark = _spark()
    fx = write_fixture_parquet("t2")

    events: list[tuple[str, float]] = []
    orig_write = SnapshotCatalog.write
    orig_read = SnapshotCatalog.read

    def timed_write(self, df, table, mode="append", meta=None, **kw):
        t0 = time.time()
        r = orig_write(self, df, table, mode=mode, meta=meta, **kw)
        events.append((f"write:{table}", time.time() - t0))
        return r

    def timed_read(self, spark_, table, **kw):
        t0 = time.time()
        r = orig_read(self, spark_, table, **kw)
        events.append((f"read:{table}", time.time() - t0))
        return r

    SnapshotCatalog.write = timed_write
    SnapshotCatalog.read = timed_read

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    orig_count = DataFrame.count
    orig_collect = DataFrame.collect

    def timed_count(self):
        t0 = time.time()
        r = orig_count(self)
        events.append(("action:count", time.time() - t0))
        return r

    def timed_collect(self):
        t0 = time.time()
        r = orig_collect(self)
        events.append(("action:collect", time.time() - t0))
        return r

    DataFrame.count = timed_count
    DataFrame.collect = timed_collect

    # time the whole run plus a coarse per-iteration trace via events
    cat_dir = tempfile.mkdtemp(prefix="ncds_prof_cat_")
    try:
        catalog = SnapshotCatalog(cat_dir)
        cfg = CrawlConfig(iterations=3, max_per_host=100, window_ms=100_000)
        t0 = time.time()
        summary = run_crawl(spark, catalog, fx, cfg)
        wall = time.time() - t0
    finally:
        SnapshotCatalog.write = orig_write
        SnapshotCatalog.read = orig_read
        DataFrame.count = orig_count
        DataFrame.collect = orig_collect
        shutil.rmtree(cat_dir, ignore_errors=True)
    total_urls = sum(i["dequeued"] for i in summary["iterations"])
    agg: dict[str, float] = {}
    for k, dt in events:
        agg[k] = agg.get(k, 0.0) + dt
    print(json.dumps({
        "wall": round(wall, 2),
        "urls": total_urls,
        "urls_per_sec": round(total_urls / wall, 2),
        "events_sum": {k: round(v, 2) for k, v in sorted(agg.items(), key=lambda x: -x[1])},
        "accounted": round(sum(agg.values()), 2),
    }, indent=1))


def run_crawl_reps() -> None:
    from bench import crawl_throughput

    spark = _spark()
    print(json.dumps(crawl_throughput(spark, tier="t2", iterations=3)))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        run_queries(sys.argv[2:] or None)
    elif mode == "crawl":
        run_crawl_profile()
    elif mode == "crawl-reps":
        run_crawl_reps()
    else:
        raise SystemExit(f"unknown mode {mode}")
