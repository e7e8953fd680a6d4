#!/usr/bin/env python
"""Benchmark harness. Prints ONE compact JSON line (the driver captures only
the last ~2000 chars of stdout — r4's line overflowed it and parsed null):
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {...}, "scaling": {...}, "detail_file": "BENCH_DETAIL.json"}
Per-rep detail (queries_all_runs, crawl reps, per-pair scaling traces, stage
profiles) goes to the BENCH_DETAIL.json sidecar next to this file.

- headline operator queries run at $SPARK_GRAFT_SF_DIR (default sf0.1) on
  local[$SPARK_GRAFT_CPUS] (default 32); each query reports the warm
  median of $SPARK_GRAFT_HEADLINE_REPS (default 3) full re-executions
  (noop sink, no caching) — single-run numbers swing 1.2-1.9× with host
  contention on this box (BASELINE.md)
- crawl throughput (URLs fetched+deduped/sec, the BASELINE.json metric) runs
  the full crawl loop on the t2 fixture tier, median of
  $SPARK_GRAFT_CRAWL_REPS (default 3) complete runs on fresh catalogs
- scaling: the same crawl mega-batch at local[8] and local[32] (sandbox
  stand-in for N vs 4N executors; BASELINE.json requires efficiency ≥ 0.8).
  Both levels run as PERSISTENT warm-JVM subprocesses and the reps
  INTERLEAVE (probe8,run8,probe8',probe32,run32,probe32')×REPS so each pair
  samples the same host-contention window — r4's gate miss traced to the two
  legs running minutes apart under drifting contention, and r5 window 21 to
  a single pre-probe sampling a different window than its own 170 s run
  (probes now BRACKET each run; the pair value is the pre/post mean). The
  gate numbers are ratios of per-leg medians. Skipped when
  SPARK_GRAFT_BENCH_FAST=1.
"""

from __future__ import annotations

import json
import os
import selectors
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DETAIL_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")

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
    # Gopher → exact dedup → span-dup gate → LSH → CC); ~7-16 s at sf0.1
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


def worker_serve(cpus: str) -> None:
    """Persistent scaling worker: one warm JVM + materialized inputs, then
    newline-delimited commands on stdin (probe / run / profile / quit), one
    JSON line on stdout per command. Persistence lets the coordinator
    interleave the 8- and 32-leg reps — the r4 cross-leg host-drift fix —
    while keeping the FULL-SIZE warmup (removing it re-introduces a ~15%
    cold-rep bias, BASELINE.md)."""
    from nightcrawler_ds_pipeline_spark.crawl.scaling import (
        hw_ceiling_probe,
        profile_scaling_stages,
        run_scaling_workload,
    )
    from nightcrawler_ds_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    n = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "2000000"))
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
    spark = get_spark(app_name=f"ncds-bench-{cpus}", cpus=cpus, extra_conf=extra)
    # FULL-SIZE warmup for the crawl workload: codegen/JIT + python
    # workers + input page cache. The curation workload warms lazily on
    # its first "curate" command (skipped entirely in crawl-only runs).
    warmup = os.environ.get("SPARK_GRAFT_WORKER_WARMUP", "crawl")
    if warmup == "crawl":
        run_scaling_workload(spark, n_urls=n)
    curate_warm = False
    n_docs = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "1000000"))
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "run":
            r = run_scaling_workload(spark, n_urls=n)
            # release this run's shuffle files BEFORE handing the window
            # to the other leg: spark.local.dir is tmpfs (RAM), and the
            # ContextCleaner only drops shuffle blocks after a JVM GC —
            # leftover blocks from the 8-run otherwise squeeze the page
            # cache during the interleaved 32-run (untimed here; the
            # coordinator is idle until this line prints)
            spark.sparkContext._jvm.System.gc()
            print(json.dumps(r), flush=True)
        elif cmd == "curate":
            from nightcrawler_ds_pipeline_spark.operators.curation_scaling import (
                run_curation_scaling_workload,
            )

            if not curate_warm:  # full-size warmup, same contract as crawl
                run_curation_scaling_workload(spark, n_docs=n_docs)
                curate_warm = True
            r = run_curation_scaling_workload(spark, n_docs=n_docs)
            # same post-run hygiene as the crawl branch, and MORE load-
            # bearing here: each curate run leaves ~5 GB of shuffle files
            # in tmpfs AND the chain's localCheckpoint blocks (1M-doc
            # text columns, MEMORY_AND_DISK) pinned until ContextCleaner
            # runs after a JVM GC; without the explicit collect+gc the
            # worker's later reps run inside a heap/tmpfs squeeze that a
            # fresh-JVM run never sees (r5: 32-leg rep segments swung
            # 26-120 s on an idle box until this was added)
            import gc as _pygc

            _pygc.collect()
            spark.sparkContext._jvm.System.gc()
            print(json.dumps(r), flush=True)
        elif cmd == "probe":
            # colocated capacity probe: plain-multiprocessing fetch+decode
            # kernel at this level, measured inside this leg's window
            p = hw_ceiling_probe((int(cpus),))[int(cpus)]
            print(json.dumps({"hw_units_per_sec": p}), flush=True)
        elif cmd == "profile":
            print(json.dumps(profile_scaling_stages(spark, n_urls=n)), flush=True)
        else:
            break
    spark.stop()
    if "spark.local.dir" in extra:
        import shutil

        # Spark empties its own blockmgr dirs on stop; this catches the
        # crashed-run case so tmpfs (RAM) never accumulates across rounds
        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)


class _ScalingWorker:
    """Coordinator-side handle on one persistent --worker-serve subprocess.

    Each leg is CPU-PINNED to exactly its core count (taskset -c 0-(N-1),
    inherited by the JVM, the python workers and the in-process hw probe).
    Without pinning, local[8]'s 8 JVM task threads + 8 python workers
    spread over ~16 of the box's 32 cores, flattering the 8-leg and
    deflating the measured 8→32 speedup (r4/r5 windows: fetch_decode
    scaled 2.3× while the unpinned probe scaled 3.9×). Pinning makes the
    8-leg an honest 8-core measurement — the single-box analogue of an
    N-node vs 4N-node cluster, where N nodes never borrow the other
    3N nodes' cores."""

    def __init__(self, cpus: str, extra_env: dict | None = None):
        self.cpus = cpus
        self.errlog = tempfile.NamedTemporaryFile(
            mode="w+", prefix=f"ncds_scaling_err_{cpus}_", suffix=".log", delete=False
        )
        pin = []
        if shutil.which("taskset") and int(cpus) <= os.cpu_count():
            pin = ["taskset", "-c", f"0-{int(cpus) - 1}"]
        self.proc = subprocess.Popen(
            pin + [sys.executable, os.path.abspath(__file__), "--worker-serve", cpus],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self.errlog,
            text=True,
            env={**os.environ, **(extra_env or {})},
        )
        self.sel = selectors.DefaultSelector()
        self.sel.register(self.proc.stdout, selectors.EVENT_READ)

    def _fail(self, what: str) -> RuntimeError:
        self.errlog.flush()
        try:
            with open(self.errlog.name) as f:
                tail = f.read()[-400:]
        except OSError:
            tail = ""
        return RuntimeError(
            f"scaling worker local[{self.cpus}] {what} "
            f"(rc={self.proc.poll()}); stderr tail: {tail}"
        )

    def read_json(self, timeout: float) -> dict:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if not self.sel.select(timeout=min(5.0, deadline - time.time())):
                if self.proc.poll() is not None:
                    raise self._fail("died")
                continue
            line = self.proc.stdout.readline()
            if not line:
                raise self._fail("closed stdout")
            line = line.strip()
            if not line:
                continue
            try:
                return json.loads(line)
            except ValueError:
                continue  # stray non-JSON stdout line; keep waiting
        raise self._fail(f"timed out after {timeout}s")

    def cmd(self, command: str, timeout: float) -> dict:
        self.proc.stdin.write(command + "\n")
        self.proc.stdin.flush()
        return self.read_json(timeout)

    def quit(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()
        self.sel.close()
        self.errlog.close()
        try:
            os.unlink(self.errlog.name)
        except OSError:
            pass


def _probe_band_deviation(pair: dict, p8_median: float, p32_median: float) -> float:
    """How far a pair's bracketed probe means sit from the cross-pair
    medians — the worse of the two legs, as a relative deviation."""
    return max(
        abs(pair["probe8"] / p8_median - 1.0),
        abs(pair["probe32"] / p32_median - 1.0),
    )


def _rerun_out_of_band_pairs(pairs: list, rerun_fn, reruns: int) -> list:
    """OUT-OF-BAND PAIR RE-RUN (VERDICT r4 #2: "re-run a leg whose
    colocated probe lands outside the healthy band, keeping the
    matched-probe window"). A pair whose bracketed probe mean sits >20%
    from the cross-pair median on either leg ran in a different contention
    regime than its siblings (r5 window 22: pair-1 probe32 244 vs 380/403
    — its 32-run hit a host stall and still contaminated the per-leg
    medians through cross-pair mixing). Re-run the worst offender once per
    allowance; adopt the re-run only if ITS probes land in band, else keep
    the original. Mutates ``pairs`` in place; returns the displaced pairs
    (kept for attribution). Needs ≥3 pairs for the median to be a band."""
    import statistics

    displaced: list[dict] = []
    if len(pairs) < 3:
        return displaced
    for _ in range(reruns):
        p8m = statistics.median(p["probe8"] for p in pairs)
        p32m = statistics.median(p["probe32"] for p in pairs)
        worst = max(pairs, key=lambda p: _probe_band_deviation(p, p8m, p32m))
        if _probe_band_deviation(worst, p8m, p32m) <= 0.20:
            break
        fresh = rerun_fn()
        if _probe_band_deviation(fresh, p8m, p32m) <= 0.20:
            displaced.append(worst)
            pairs[pairs.index(worst)] = fresh
        else:
            # both windows disagree with the session median — record the
            # attempt, keep the original, stop burning time
            displaced.append({**fresh, "rerun_rejected": True})
            break
    return displaced


def _paired_runs(
    cmd: str,
    tp_key: str,
    extra_env: dict | None = None,
    with_profile: bool = False,
    run_timeout: float = 1800,
) -> dict:
    """Interleaved-pair scaling harness shared by the crawl ("run") and
    curation ("curate") workloads: (probe8, cmd8, probe8', probe32, cmd32,
    probe32') × REPS against warm persistent workers, so both legs of each
    pair sample the same host-contention window and each run's probe value
    is the mean of a pre/post bracket (a run is 15-20× longer than a probe;
    a single-sided probe measurably samples a different window — r5 w21). The gate fields are RATIOS OF PER-LEG
    MEDIANS: pairing bounds slow drift (minutes-scale contention shifts),
    but the residual error is per-CALL probe noise (a ~9 s probe can land
    in a transient stall — r5 window: probe8 68.1 vs 87.1/88.8 siblings,
    turning a 0.92 spark-layer into a per-pair 0.67), and a median of
    per-pair ratios AMPLIFIES that, while medianing each quantity first
    rejects the outlier. Per-pair ratios stay in the detail for drift
    attribution."""
    import statistics

    reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3")))
    # SEQUENTIAL startup: the 8-leg's first pass materializes the shared
    # input dir; starting both at once races two generators on the same
    # parquet paths and kills a worker mid-read.
    w8 = _ScalingWorker("8", extra_env)
    pairs, detail = [], {"local[8]": {"runs": []}, "local[32]": {"runs": []}}
    w32 = None
    try:
        w8.read_json(timeout=1800)
        # lazily-warmed workloads (curate) do their full-size warmup on the
        # first command — issue it to the 8-leg BEFORE the 32-leg starts so
        # input materialization is done and the pairs stay back-to-back
        if cmd != "run":
            w8.cmd(cmd, run_timeout * 2)
        w32 = _ScalingWorker("32", extra_env)
        w32.read_json(timeout=1800)
        if cmd != "run":
            w32.cmd(cmd, run_timeout * 2)  # 32-leg lazy warmup
        # One UNTIMED sacrificial pair in the same cadence as the timed
        # ones: the startup warmups run minutes before the first timed
        # 32-rep (idle JVM, page-cache churn from the interleaved 8-runs),
        # and the first timed 32-run measured 2× slower than its warm
        # reps in the r5 window that motivated this (BENCH_DETAIL pair 1:
        # 124.3 s vs 60.5/52.6 s). The sacrifice re-establishes steady
        # state under the exact probe/run rhythm the timed pairs use.
        seen_probes: dict[str, list[float]] = {"8": [], "32": []}
        probe_retries: list[dict] = []

        def _probe(worker, leg: str) -> float:
            """One probe reading with a single out-of-band retry: a ~9 s
            probe can land in a transient host stall that the adjacent
            200 s Spark run averages over; if the reading deviates >20%
            from the median of this session's prior readings on the same
            leg, re-probe once and keep the value closer to that median
            (both are recorded)."""
            v = worker.cmd("probe", 600)["hw_units_per_sec"]
            prior = seen_probes[leg]
            if prior:
                m = statistics.median(prior)
                if not (0.8 * m <= v <= 1.25 * m):
                    v2 = worker.cmd("probe", 600)["hw_units_per_sec"]
                    probe_retries.append({"leg": leg, "first": v, "retry": v2})
                    v = min((v, v2), key=lambda x: abs(x - m))
            seen_probes[leg].append(v)
            return v

        _probe(w8, "8")
        w8.cmd(cmd, run_timeout)
        _probe(w32, "32")
        w32.cmd(cmd, run_timeout)
        # BRACKETED probes (r5 window 21): a ~9 s probe before a 140-170 s
        # run samples a different contention window than the run itself —
        # window 21 pair 2 probed its 8-leg at the session HIGH while the
        # adjacent 8-run landed at the session LOW, reading spark-layer
        # 1.27 against siblings at 0.74-0.76. Probe each timed run on BOTH
        # sides and use the mean (a trapezoid estimate of the contention
        # the run actually saw); both raw readings stay in the pair record.
        def _timed_pair() -> dict:
            p8a = _probe(w8, "8")
            r8 = w8.cmd(cmd, run_timeout)
            p8b = _probe(w8, "8")
            p32a = _probe(w32, "32")
            r32 = w32.cmd(cmd, run_timeout)
            p32b = _probe(w32, "32")
            p8 = round((p8a + p8b) / 2, 2)
            p32 = round((p32a + p32b) / 2, 2)
            t8, t32 = r8[tp_key], r32[tp_key]
            speedup = t32 / t8
            hw_speedup = p32 / p8
            detail["local[8]"]["runs"].append(r8)
            detail["local[32]"]["runs"].append(r32)
            return {
                "t8": t8,
                "t32": t32,
                "probe8": p8,
                "probe32": p32,
                "probe8_pre_post": [p8a, p8b],
                "probe32_pre_post": [p32a, p32b],
                "speedup": round(speedup, 3),
                "efficiency_vs_4x": round(speedup / 4.0, 3),
                "hw_speedup": round(hw_speedup, 3),
                "spark_layer_efficiency": round(speedup / hw_speedup, 3),
            }

        for _ in range(reps):
            pairs.append(_timed_pair())
        reruns = max(0, int(os.environ.get("SPARK_GRAFT_SCALING_RERUNS", "2")))
        detail["displaced_pairs"] = _rerun_out_of_band_pairs(
            pairs, _timed_pair, reruns
        )
        if with_profile:
            detail["local[8]"]["stage_profile"] = w8.cmd("profile", 1800)
            detail["local[32]"]["stage_profile"] = w32.cmd("profile", 1800)
    finally:
        w8.quit()
        if w32 is not None:
            w32.quit()
    med = lambda k: statistics.median(p[k] for p in pairs)
    t8m, t32m = med("t8"), med("t32")
    p8m, p32m = med("probe8"), med("probe32")
    speedup, hw_speedup = t32m / t8m, p32m / p8m
    detail["probe_retries"] = probe_retries
    return {
        "throughput_local8": round(t8m, 3),
        "throughput_local32": round(t32m, 3),
        "speedup_8_to_32": round(speedup, 3),
        "efficiency_vs_4x": round(speedup / 4.0, 3),
        "hw_probe_8": [p["probe8"] for p in pairs],
        "hw_probe_32": [p["probe32"] for p in pairs],
        "hw_speedup_8_to_32": round(hw_speedup, 3),
        "spark_layer_efficiency": round(speedup / hw_speedup, 3),
        "pair_efficiencies": [p["efficiency_vs_4x"] for p in pairs],
        "pair_spark_layer": [p["spark_layer_efficiency"] for p in pairs],
        "pairs": pairs,
        "detail": detail,
    }


def scaling_runs() -> dict:
    """Crawl mega-batch at local[8] vs local[32] (the BASELINE.json gate)."""
    return _paired_runs("run", "urls_per_sec", with_profile=True)


def curation_scaling_runs() -> dict:
    """The corpus-curation chain under the same harness (VERDICT r4 #5):
    ~10^6 synthetic docs through lang→quality→Gopher→dedup→span-dup→LSH→CC
    at both levels. Opt-in (SPARK_GRAFT_CURATION_SCALING=1) — it adds
    ~20 min; numbers recorded in BASELINE.md."""
    return _paired_runs(
        "curate",
        "docs_per_sec",
        extra_env={"SPARK_GRAFT_WORKER_WARMUP": "none"},
        run_timeout=2400,
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker-serve":
        worker_serve(sys.argv[2])
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
            scaling = {"error": str(ex)[:400]}

    curation_scaling = {}
    if os.environ.get("SPARK_GRAFT_CURATION_SCALING", "0") == "1":
        try:
            curation_scaling = curation_scaling_runs()
        except Exception as ex:
            curation_scaling = {"error": str(ex)[:400]}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # full per-rep detail → sidecar (the driver captures only the last
    # ~2000 chars of stdout; r4's all-in-one line overflowed it)
    crawl_compact = {k: v for k, v in crawl.items() if k != "all_urls_per_sec"}

    def _compact(s: dict) -> dict:
        return {k: v for k, v in s.items() if k not in ("pairs", "detail")}

    detail_doc = {
        "sf": sf_val,
        "queries": timings,
        "queries_all_runs": runs_detail,
        "queries_reps": reps,
        "crawl": crawl,
        "scaling": scaling,
    }
    line = {
        "metric": "headline queries + crawl loop (URLs fetched+deduped/sec)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": timings,
        "queries_reps": reps,
        "sf": sf_val,
        "crawl": crawl_compact,
        "scaling": _compact(scaling),
        "detail_file": os.path.basename(DETAIL_FILE),
    }
    if curation_scaling:
        detail_doc["curation_scaling"] = curation_scaling
        line["curation_scaling"] = {
            k: curation_scaling.get(k)
            for k in (
                "throughput_local8",
                "throughput_local32",
                "efficiency_vs_4x",
                "spark_layer_efficiency",
                "error",
            )
            if k in curation_scaling
        }
    with open(DETAIL_FILE, "w") as f:
        json.dump(detail_doc, f, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
