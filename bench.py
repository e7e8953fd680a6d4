#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {...}, "scaling": {...}}

- headline operator queries run at $SPARK_GRAFT_SF_DIR (default sf0.1) on
  local[$SPARK_GRAFT_CPUS] (default 32); each query reports the warm
  median of $SPARK_GRAFT_HEADLINE_REPS (default 3) full re-executions
  (noop sink, no caching) — single-run numbers swing 1.2-1.9× with host
  contention on this box (BASELINE.md); per-rep detail in
  "queries_all_runs"
- crawl throughput (URLs fetched+deduped/sec, the BASELINE.json metric) runs
  the full crawl loop on the t2 fixture tier, median of
  $SPARK_GRAFT_CRAWL_REPS (default 3) complete runs on fresh catalogs
- scaling: the same crawl job at local[8] and local[32] (sandbox stand-in
  for N vs 4N executors; BASELINE.json requires efficiency ≥ 0.8) — run in
  subprocesses so each gets a fresh JVM. Skipped when SPARK_GRAFT_BENCH_FAST=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "agg_pricing_summary",
    "agg_url_traffic",
    "window_ctr_volume",
    "window_host_dequeue",
    "filter_swiss_flags",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_embedding_pairs",
    "sim_topk_bruteforce",
    "sim_ann_suite",
    "text_token_counts",
    "text_lang_quality",
    "robots_parse",
    # round 4: the flagship end-to-end curation chain (lang → quality →
    # Gopher → exact dedup → span-dup gate → LSH → CC); ~10-16 s at sf0.1
    "corpus_curation",
    # round 4: the image-axis path — exact phash dedup + Manku 28-combo
    # hamming-band near-dup + CC groups over the t1 image fixture
    "image_phash_suite",
    # late round 4: span-dup stats + benchmark decontamination (two
    # shingle passes over documents) and the normalize composite that
    # now carries PII masking + line-level boilerplate reassembly
    "text_dup_decontam_suite",
    "text_normalize",
]


def crawl_throughput(spark, tier: str = "t2", iterations: int = 3) -> dict:
    """URLs fetched+deduped/sec over a full crawl-loop run — median of
    $SPARK_GRAFT_CRAWL_REPS (default 3) complete runs, each on a fresh
    catalog. Same methodology as the headline queries: the single-pass
    number historically swung 34-92 urls/s round-to-round on identical
    code purely with host contention (BASELINE.md); per-rep detail in
    "all_urls_per_sec"."""
    import shutil
    import statistics
    import tempfile

    from nightcrawler_ds_pipeline_spark.crawl.loop import CrawlConfig, run_crawl
    from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    fx = write_fixture_parquet(tier)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_CRAWL_REPS", "3")))
    runs = []
    for _ in range(reps):
        cat_dir = tempfile.mkdtemp(prefix="ncds_bench_cat_")
        try:
            catalog = SnapshotCatalog(cat_dir)
            cfg = CrawlConfig(
                iterations=iterations, max_per_host=100, window_ms=100_000
            )
            t0 = time.time()
            summary = run_crawl(spark, catalog, fx, cfg)
            wall = time.time() - t0
            total_urls = sum(i["dequeued"] for i in summary["iterations"])
            runs.append(
                {
                    "iterations": len(summary["iterations"]),
                    "urls": total_urls,
                    "sec": round(wall, 2),
                    "urls_per_sec": round(total_urls / wall, 2) if wall else None,
                }
            )
        finally:
            shutil.rmtree(cat_dir, ignore_errors=True)
    # median_low: always an actual run, so the rep detail stays coherent
    med = statistics.median_low(r["urls_per_sec"] for r in runs)
    rep = next(r for r in runs if r["urls_per_sec"] == med)
    return {
        "tier": tier,
        **rep,
        "all_urls_per_sec": [r["urls_per_sec"] for r in runs],
    }


def run_worker(cpus: str) -> dict:
    """Scaling subprocess: the steady-state crawl mega-batch (probe →
    anti-join → dequeue → decode+phash → edge canonicalize) at
    local[cpus], reading pre-materialized parquet inputs (built untimed on
    first use, identical bytes at every parallelism level). One warmup
    pass (JIT + page cache) then the measured runs; per-stage profile
    after the reps attributes where the time goes."""
    import os

    from nightcrawler_ds_pipeline_spark.crawl.scaling import (
        hw_ceiling_probe,
        profile_scaling_stages,
        run_scaling_workload,
    )
    from nightcrawler_ds_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    n = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "2000000"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    # shuffle to tmpfs when available: one box shares ONE disk across all
    # cores (4× cores → 4× contention on the same spindle), while a real
    # N→4N cluster adds a local NVMe per node; tmpfs mirrors the per-node
    # independence the cluster actually has.
    extra = {}
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        extra["spark.local.dir"] = f"/dev/shm/ncds_spark_{cpus}"
    # experiment knob (VERDICT r2 #3): Arrow batch size for the
    # mapInPandas fetch+decode stage — measured at both levels to test
    # whether batch granularity shifts the 8→32 curve (see BASELINE.md)
    ab = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    if ab:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = ab
    # the sandbox VM has time-varying host contention: take the median of
    # several measured runs in one warm JVM, and probe raw capacity before
    # AND after (max = closest to true capacity at this level)
    hw_before = hw_ceiling_probe((int(cpus),))[int(cpus)]
    spark = get_spark(app_name=f"ncds-bench-{cpus}", cpus=cpus, extra_conf=extra)
    # FULL-SIZE warmup: a single n/10 pass leaves codegen/JIT + python
    # workers + input page cache cold enough that the first measured reps
    # read ~15% slow (observed: the same job re-measured at the end of a
    # warm JVM ran 110.6 s vs a 126.6 s rep-median at local[8])
    run_scaling_workload(spark, n_urls=n)
    runs = [run_scaling_workload(spark, n_urls=n) for _ in range(reps)]
    profile = profile_scaling_stages(spark, n_urls=n)
    spark.stop()
    if "spark.local.dir" in extra:
        import shutil

        # Spark empties its own blockmgr dirs on stop; this catches the
        # crashed-run case so tmpfs (RAM) never accumulates across rounds
        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)
    hw_after = hw_ceiling_probe((int(cpus),))[int(cpus)]
    runs.sort(key=lambda r: r["urls_per_sec"])
    out = dict(runs[len(runs) // 2])  # median by throughput
    out["all_urls_per_sec"] = [r["urls_per_sec"] for r in runs]
    out["hw_units_per_sec"] = max(hw_before, hw_after)
    out["stage_profile"] = profile
    return out


def scaling_runs() -> dict:
    """Same job, same input, two parallelism levels → scaling efficiency."""
    results = {}
    for cpus in ("8", "32"):
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", cpus],
            capture_output=True,
            text=True,
            timeout=2400,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            parsed = json.loads(line)
        except ValueError:
            parsed = {}
        if not parsed:
            # a silently-dead worker must be attributable, not a row of nulls
            parsed = {
                "error": f"worker rc={proc.returncode}",
                "stderr_tail": (proc.stderr or "")[-400:],
            }
        results[f"local[{cpus}]"] = parsed
    t8 = results["local[8]"].get("urls_per_sec") or 0
    t32 = results["local[32]"].get("urls_per_sec") or 0
    # N → 4N cores on identical input; efficiency = speedup / 4 (target ≥0.8)
    speedup = (t32 / t8) if t8 else None
    eff = speedup / 4.0 if speedup else None
    # single-box hardware ceiling: same kernel under plain multiprocessing,
    # measured INSIDE each worker (colocated with that level's noise).
    # One box can't add memory bandwidth with cores the way a cluster adds
    # machines; spark_layer_efficiency = how much of the box's achievable
    # scaling the engine captures (the number that transfers to N→4N nodes).
    hw = {
        8: results["local[8]"].get("hw_units_per_sec"),
        32: results["local[32]"].get("hw_units_per_sec"),
    }
    hw_speedup = hw[32] / hw[8] if hw.get(8) and hw.get(32) else None
    return {
        "throughput_local8": t8,
        "throughput_local32": t32,
        "speedup_8_to_32": round(speedup, 3) if speedup else None,
        "efficiency_vs_4x": round(eff, 3) if eff is not None else None,
        "hw_ceiling_units_per_sec": hw,
        "hw_speedup_8_to_32": round(hw_speedup, 3) if hw_speedup else None,
        "spark_layer_efficiency": (
            round(speedup / hw_speedup, 3) if speedup and hw_speedup else None
        ),
        "detail": results,
    }


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(run_worker(sys.argv[2])))
        return

    from nightcrawler_ds_pipeline_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="ncds-bench", cpus=CPUS)
    qs = e.queries()
    # JIT/codegen + parquet-footer warmup so the first headline query isn't
    # charged the session's cold-start (measured ~1-2 s on query 1)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(1000).collect()
    # Per-query warm median-of-REPS: the box has time-varying host
    # contention (BASELINE.md "variance methodology"), and single-run
    # headline numbers drifted 1.2-1.9× between rounds for identical
    # plans. noop-write re-executes the full plan each rep (no caching),
    # so the median is a real warm re-execution, matching the
    # median-of-N methodology already used for the scaling legs.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_HEADLINE_REPS", "3")))
    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        runs = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        timings[name] = sorted(runs)[len(runs) // 2]
        runs_detail[name] = runs
        total += timings[name]

    crawl = crawl_throughput(spark, tier="t2", iterations=3)
    total += crawl["sec"]

    scaling = {}
    if os.environ.get("SPARK_GRAFT_BENCH_FAST", "0") != "1":
        # the scaling subprocesses need the whole box: stop this session's
        # JVM first so its heap/GC doesn't pollute the measurement
        spark.stop()
        try:
            scaling = scaling_runs()
        except Exception as ex:  # never fail the bench line
            scaling = {"error": str(ex)[:200]}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline queries + crawl loop (URLs fetched+deduped/sec)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": timings,
                "queries_all_runs": runs_detail,
                "queries_reps": reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
