"""The crawl loop: iterative batch jobs over snapshot tables (north_rule).

Each iteration is one batch job:
  1. read frontier (committed state only) → not-seen filter (Bloom pre-pass
     + exact anti-join, `seen.filter_unseen`)
  2. robots gate + per-host token-bucket priority dequeue (`politeness.dequeue`)
     → deterministic (priority desc, url_hash asc) crawl order `seq`
  3. fetch + decode + phash (`fetch.fetch_batch`)
  4. phash dedup: exact-duplicate images flagged against both the historical
     results and earlier rows of the same batch
  5. append results + seen rows + new frontier edges; overwrite the merged
     Bloom and the remaining frontier
  6. append per-partition lineage rows LAST — the lineage commit finalizes
     the iteration; resume replays from the last finalized iteration and
     ignores any newer uncommitted snapshots (exact resume).

The reference's analogue of this loop is the fixed 11-stage chain in
cli/full_pipeline.py:84-215 with a JSON checkpoint after every stage and
file-based resume (cli/extractor.py:63-114); here stage boundaries are
snapshot commits and the "cache hit suppresses re-fetch" behavior
(api_caller.py:48-80) is the seen-set membership test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark import schemas
from nightcrawler_ds_pipeline_spark.crawl import politeness
from nightcrawler_ds_pipeline_spark.crawl.fetch import fetch_batch
from nightcrawler_ds_pipeline_spark.crawl.seen import (
    DEFAULT_NUM_PARTITIONS,
    build_bloom_partitions,
    build_cuckoo_partitions,
    filter_unseen,
    merge_bloom_tables,
    update_cuckoo_tables,
)
from nightcrawler_ds_pipeline_spark.crawl.tables import SnapshotCatalog
from nightcrawler_ds_pipeline_spark.functions.urls import with_canonical

# CTR click-share prior for seed priorities — the reference's rank-based
# traffic model (single shared definition, see constants.py).
from nightcrawler_ds_pipeline_spark.constants import RANK_CLICK_SHARES  # noqa: E402


@dataclass
class CrawlConfig:
    iterations: int = 3
    window_ms: int = politeness.DEFAULT_WINDOW_MS
    max_per_host: int = politeness.DEFAULT_MAX_PER_HOST
    num_salts: int = politeness.DEFAULT_NUM_SALTS
    bloom_partitions: int = DEFAULT_NUM_PARTITIONS
    outlink_priority_decay: float = 0.5
    run_ts: str = "1970-01-01_00-00-00"  # injected, never wall-clock
    frontier_shuffle_partitions: int | None = None
    # TTL re-crawl (reference cache_duration, api_caller.py:24,74: an
    # expired cache entry no longer suppresses the re-fetch). A seen entry
    # older than ttl_iters iterations stops suppressing: the URL re-enters
    # the frontier when rediscovered and is re-dequeued exactly once. None
    # = seen forever. The Bloom keeps ALL historical keys (it cannot
    # delete — expired entries only cost false positives, and the Bloom
    # never decides); the cuckoo filter (crawl/cuckoo.py) is the
    # deletion-capable sketch for TTL-heavy workloads.
    ttl_iters: int | None = None
    # Bloom pre-pass size gate: while the seen set has fewer rows than this,
    # skip building/merging/probing sketches entirely — `filter_unseen`
    # degrades to the exact anti-join (the decider either way), which is
    # strictly cheaper at small scale (the P=256 sketch build/merge/probe is
    # 3 fixed ~256-task stages per iteration, pure overhead for a few-k-row
    # batch; measured 1.8× t2 crawl slowdown). Crossing the threshold
    # rebuilds the sketches once from the full seen table.
    bloom_min_seen: int = 100_000
    # which pre-pass sketch to maintain above the gate: "bloom" (OR-merge,
    # keeps history — cannot delete) or "cuckoo" (multiset insert/delete —
    # TTL expiries are pruned, so the sketch tracks the ACTIVE seen set;
    # north_rule "bloom/cuckoo URL-seen"). Either way the sketch never
    # decides: the exact anti-join against the active seen table does.
    sketch: str = "bloom"
    # cuckoo capacity per partition (slots = 4 × buckets; ~95% fillable).
    # Size for the ACTIVE seen set: buckets × 4 × bloom_partitions ≥
    # active URLs / 0.95, or the per-partition insert raises loudly.
    cuckoo_buckets: int = 1 << 14
    # robots.txt cache TTL (north_rule "robots.txt cache"): entries older
    # than this many iterations are re-fetched from the robots source and
    # re-stamped; the cache lives in the catalog ("robots" table) with the
    # same commit/rollback semantics as the rest of the state. None
    # (default) = read the source directly each iteration (always fresh —
    # the reference-parity behavior on static fixtures).
    robots_max_age_iters: int | None = None
    # compact the append-mode state tables (seen/results) every k committed
    # iterations — bounds the small-file count the next iteration scans
    # (SnapshotCatalog.compact; the Iceberg rewrite_data_files analogue)
    compact_every: int | None = None
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.sketch not in ("bloom", "cuckoo"):
            # fail at construction, not as a missing-column AnalysisException
            # three stages into the first iteration
            raise ValueError(
                f"CrawlConfig.sketch must be 'bloom' or 'cuckoo', got "
                f"{self.sketch!r}"
            )


FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]


def seed_frontier(serp: DataFrame) -> DataFrame:
    """Seed the frontier from search-result fixtures (the reference's S1-S4
    scans): canonicalize, CTR-share × volume priority, dedup by url_hash."""
    shares = F.array(*[F.lit(s) for s in RANK_CLICK_SHARES])
    share = F.element_at(shares, F.least(F.col("position"), F.lit(20)))
    volume = F.greatest(F.coalesce(F.col("keyword_volume"), F.lit(1.0)), F.lit(1.0))
    seeded = (
        with_canonical(serp, "url")
        .withColumn("priority", (share * volume).cast("double"))
        .withColumn("discovered_iter", F.lit(0).cast("int"))
        .withColumn("parent_url_hash", F.lit(None).cast("long"))
    )
    # one frontier row per canonical url: max priority wins, deterministic
    w = Window.partitionBy("url_hash").orderBy(
        F.col("priority").desc(), F.col("url").asc()
    )
    return (
        seeded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*FRONTIER_COLS)
    )


def _phash_dedup(fetched: DataFrame, history_phash: DataFrame | None) -> DataFrame:
    """is_phash_dup: exact phash already in history, or an earlier row (by
    deterministic seq) of this batch.

    Only decode_ok rows enter the phash window/join: failed/imageless rows
    all share phash=0 and would pile into ONE window partition (a straggler
    task at scale); their is_phash_dup is False by definition."""
    ok = fetched.filter(F.col("decode_ok"))
    ko = fetched.filter(~F.col("decode_ok")).withColumn(
        "is_phash_dup", F.lit(False)
    )
    w = Window.partitionBy("phash").orderBy(F.col("seq").asc())
    out = ok.withColumn("__batch_dup", F.row_number().over(w) > 1)
    if history_phash is not None:
        # no broadcast hint: the phash history grows without bound across
        # iterations — AQE broadcasts while it's small and falls back to a
        # shuffle join once it isn't.
        hist = history_phash.select(F.col("phash").alias("__hist_phash")).distinct()
        out = out.join(
            hist, out["phash"] == hist["__hist_phash"], "left"
        ).withColumn("__hist_dup", F.col("__hist_phash").isNotNull()).drop(
            "__hist_phash"
        )
    else:
        out = out.withColumn("__hist_dup", F.lit(False))
    out = out.withColumn(
        "is_phash_dup", F.col("__batch_dup") | F.col("__hist_dup")
    ).drop("__batch_dup", "__hist_dup")
    return out.unionByName(ko.select(*out.columns))


def committed_iter(catalog: SnapshotCatalog, spark: SparkSession) -> int:
    """Last finalized iteration = max iter in the lineage table, else -1."""
    lineage = catalog.read(spark, "lineage")
    if lineage is None:
        return -1
    row = lineage.agg(F.max("iter").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1


def run_crawl(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    fixtures_dir: str,
    config: CrawlConfig | None = None,
) -> dict:
    """Run (or resume) the crawl loop against fixture tables.

    Returns a summary dict with per-iteration metrics.
    """
    cfg = config or CrawlConfig()
    serp = spark.read.parquet(f"{fixtures_dir}/serp_results.parquet")
    responses = spark.read.parquet(f"{fixtures_dir}/fetch_responses.parquet")
    robots = spark.read.parquet(f"{fixtures_dir}/robots.parquet")
    images = spark.read.parquet(f"{fixtures_dir}/images.parquet")

    start_iter = committed_iter(catalog, spark) + 1
    # exact resume: drop any snapshots a crash left behind for iterations
    # whose lineage never committed — otherwise re-running the iteration
    # would append a second copy of its rows
    catalog.rollback_above(start_iter - 1)
    summary: list[dict] = []

    # seen-set size for the Bloom gate: one count at (re)start, then
    # maintained incrementally (+= n_batch per committed iteration) — no
    # extra action inside the loop
    seen0 = catalog.read(spark, "seen", max_iter=start_iter - 1)
    seen_count = seen0.count() if seen0 is not None else 0

    for it in range(start_iter, cfg.iterations):
        committed = it - 1

        frontier = catalog.read(spark, "frontier", max_iter=committed)
        if frontier is None:
            frontier = seed_frontier(serp)
        seen_full = catalog.read(spark, "seen", max_iter=committed)
        # TTL: only still-fresh seen rows suppress a re-fetch — the exact
        # anti-join against the ACTIVE set decides, so an expired URL
        # passes and gets re-dequeued (cfg.ttl_iters docstring). seen_full
        # keeps the history for sketch rebuilds.
        seen = seen_full
        if seen_full is not None and cfg.ttl_iters is not None:
            seen = seen_full.filter(F.col("seen_iter") > it - cfg.ttl_iters)

        use_sketch = seen_count >= cfg.bloom_min_seen
        sketch_table = "bloom" if cfg.sketch == "bloom" else "cuckoo"
        sketch = (
            catalog.read(spark, sketch_table, max_iter=committed)
            if use_sketch
            else None
        )
        # The probe-side sketches must OVER-approximate the active seen set
        # (a "definitely not seen" verdict bypasses the exact anti-join),
        # so a stored sketch is usable only if it is both FRESH — written
        # at the same iteration as the newest seen snapshot; an
        # accrual-only or below-gate iteration commits lineage without a
        # sketch write — and GEOMETRY-compatible (same modulus as this
        # run's bloom_partitions; probing across moduli mis-places keys).
        # Checked every iteration: the staleness check is manifest-only and
        # the modulus check is one .first() on the small sketch table. On
        # any mismatch the seen table is the source of truth: the Bloom
        # rebuilds from the UNFILTERED set (it keeps TTL-expired history on
        # purpose — it cannot delete), the cuckoo from the ACTIVE set (its
        # whole point is pruning expiries).
        sketch_cached = None
        if use_sketch and seen is not None:
            rebuild = sketch is None or catalog.latest_iter(
                sketch_table, max_iter=committed
            ) < catalog.latest_iter("seen", max_iter=committed)
            if not rebuild and cfg.sketch == "cuckoo":
                # the cuckoo's stored content depends on the TTL it was
                # maintained under: a resume with a LONGER (or no) TTL
                # re-activates generations the old sketch already deleted —
                # probing it would under-approximate the active set and
                # silently re-crawl seen URLs. The maintenance TTL is
                # persisted in the snapshot meta; any mismatch (including
                # pre-upgrade catalogs without the key) rebuilds.
                stored_ttl = catalog.latest_meta(
                    sketch_table, max_iter=committed
                ).get("ttl_iters", "__absent__")
                rebuild = stored_ttl != cfg.ttl_iters
            if not rebuild:
                first = sketch.select("num_partitions").first()
                rebuild = first is None or int(first[0]) != cfg.bloom_partitions
            if rebuild:
                if cfg.sketch == "bloom":
                    sketch = build_bloom_partitions(
                        seen_full, num_partitions=cfg.bloom_partitions
                    )
                else:
                    sketch = build_cuckoo_partitions(
                        seen,
                        num_partitions=cfg.bloom_partitions,
                        num_buckets=cfg.cuckoo_buckets,
                    )
                # cache: the rebuilt sketch (a full-seen-set applyInPandas
                # pass) feeds BOTH the probe and the 5b merge/update write —
                # uncached it would execute twice
                sketch = sketch.cache()
                sketch_cached = sketch

        # 1. not-seen filter (sketch pre-pass via the map-side
        # co-partitioned probe — sketches never visit the driver; exact
        # anti-join decider). Not cached: its only consumer is `gated`,
        # which is itself cached — a second cache layer here was one extra
        # memory-write pass per iteration (r6).
        candidates = filter_unseen(
            spark,
            frontier,
            seen,
            sketch,
            num_partitions=cfg.bloom_partitions,
            sketch=cfg.sketch,
        )

        # 2. robots gate ONCE (dequeue, remaining-frontier rewrite and
        # bucket accounting all reuse it), then the token-bucket dequeue —
        # unspent time rolls over so skipped slow hosts catch up later
        bucket_state = catalog.read(spark, "politeness", max_iter=committed)
        # robots cache with TTL refresh (opt-in): stale entries re-fetch
        # from the source and the refreshed cache snapshots into the
        # catalog — written pre-commit like the other state tables, so a
        # crash before the lineage finalizer rolls it back with the rest
        if cfg.robots_max_age_iters is not None:
            robots_cur = politeness.refresh_robots(
                catalog.read(spark, "robots", max_iter=committed),
                robots,
                it,
                cfg.robots_max_age_iters,
            )
            catalog.write(
                robots_cur, "robots", mode="overwrite", meta={"iter": it}
            )
            robots_cur = catalog.read(spark, "robots", max_iter=it)
        else:
            robots_cur = robots
        gated = politeness.robots_filter(candidates, robots_cur).cache()
        # dequeue WITHOUT seq, cache, count — then number with known_count so
        # big batches take the range-partitioned two-pass path (no global
        # single-partition window anywhere in the loop)
        pre_batch = politeness.dequeue_gated(
            gated,
            window_ms=cfg.window_ms,
            max_per_host=cfg.max_per_host,
            num_salts=cfg.num_salts,
            bucket_state=bucket_state,
            assign_seq=False,
        ).cache()
        n_batch = pre_batch.count()
        batch = politeness.assign_global_seq(
            pre_batch, known_count=n_batch
        ).cache()
        gated_hosts = gated.select("host", "crawl_delay_ms")
        if n_batch == 0:
            # nothing dequeuable. If the gated frontier is empty the crawl
            # is done; otherwise slow hosts are merely out of tokens — commit
            # an accrual-only iteration so their buckets refill (without
            # this, hosts with crawl_delay > window starve forever).
            if gated.limit(1).count() == 0:
                batch.unpersist()
                pre_batch.unpersist()
                gated.unpersist()
                if sketch_cached is not None:
                    sketch_cached.unpersist()
                break
            meta = {"iter": it}
            accrued = politeness.next_bucket_state(
                gated_hosts, batch, bucket_state, window_ms=cfg.window_ms
            )
            catalog.write(accrued, "politeness", mode="overwrite", meta=meta)
            # sketch maintenance cannot skip an accrual iteration: each
            # seen generation is deleted from the cuckoo exactly once, at
            # exactly its expiry iteration (a skipped deletion lingers
            # forever — and catching up later with <= would double-delete
            # keys re-seen since). Also persists any freshness/geometry
            # rebuild done at the top of the loop so consecutive accrual
            # iterations don't re-derive it.
            if use_sketch and sketch is not None:
                sk_meta = {"iter": it}
                if cfg.sketch == "cuckoo":
                    sk_meta["ttl_iters"] = cfg.ttl_iters
                    applied_deletes = False
                    if seen_full is not None and cfg.ttl_iters is not None:
                        expiring = seen_full.filter(
                            F.col("seen_iter") == it + 1 - cfg.ttl_iters
                        )
                        sketch = update_cuckoo_tables(
                            sketch,
                            None,
                            expiring,
                            num_partitions=cfg.bloom_partitions,
                            num_buckets=cfg.cuckoo_buckets,
                        )
                        applied_deletes = True
                    # with no TTL there are no deletions: rewriting the
                    # unchanged multi-MB snapshot every token-starved
                    # iteration only grows the manifest — skip unless a
                    # rebuild happened this iteration (mirrors the bloom
                    # branch's sketch_cached guard)
                    if applied_deletes or sketch_cached is not None:
                        catalog.write(
                            sketch, sketch_table, mode="overwrite", meta=sk_meta
                        )
                elif sketch_cached is not None:
                    catalog.write(
                        sketch, sketch_table, mode="overwrite", meta=sk_meta
                    )
            empty_lineage = spark.createDataFrame(
                [(it, -1, "empty", 0, 0, cfg.run_ts)], schema=schemas.LINEAGE
            )
            catalog.write(empty_lineage, "lineage", mode="append", meta=meta)
            summary.append(
                {"iter": it, "dequeued": 0, "results": 0,
                 "new_unique_images": 0, "errors": 0}
            )
            batch.unpersist()
            pre_batch.unpersist()
            gated.unpersist()
            if sketch_cached is not None:
                sketch_cached.unpersist()
            continue

        # 3. fetch + decode + phash (n_batch proves the broadcast-size gate)
        fetched = fetch_batch(batch, responses, images, batch_count=n_batch)

        # 4. phash dedup vs history + within-batch
        history = catalog.read(spark, "results", max_iter=committed)
        hist_phash = (
            history.filter(F.col("decode_ok") & ~F.col("is_phash_dup")).select("phash")
            if history is not None
            else None
        )
        # Cached: deduped feeds results AND the outlink edge derivation —
        # without the cache the frontier write re-runs the whole
        # fetch+decode chain (measured 2× the fetch cost per iteration).
        deduped = _phash_dedup(fetched, hist_phash).cache()

        results = deduped.select(
            F.lit(it).cast("int").alias("iter"),
            F.col("seq"),
            F.col("url"),
            F.col("canonical_url"),
            F.col("url_hash"),
            F.col("host"),
            F.col("error"),
            F.col("image_id"),
            F.col("w"),
            F.col("h"),
            F.col("fmt"),
            F.col("caption"),
            F.col("phash"),
            F.col("decode_ok"),
            F.col("is_phash_dup"),
        )

        # 5a. new seen rows = everything dequeued this iteration
        new_seen = batch.select(
            "url_hash", "canonical_url", F.lit(it).cast("int").alias("seen_iter")
        )

        # 5b. merged sketch (overwrite snapshot) — only above the size
        # gate; below it no sketches are maintained at all, and the first
        # above-gate iteration rebuilds them from the seen table via the
        # freshness check at the top of the loop. Bloom: OR-merge the new
        # keys in. Cuckoo: insert the new keys AND delete the rows expiring
        # at the NEXT iteration (the oldest still-active generation), so
        # the stored sketch matches the active set the next probe runs
        # against.
        if use_sketch:
            if cfg.sketch == "bloom":
                new_bloom = build_bloom_partitions(
                    new_seen, num_partitions=cfg.bloom_partitions
                )
                merged_sketch = (
                    merge_bloom_tables(sketch, new_bloom)
                    if sketch is not None
                    else new_bloom
                )
            else:
                # deletions = the generation becoming inactive at the NEXT
                # iteration (seen_iter == it+1-ttl). Must include new_seen:
                # at ttl_iters=1 this iteration's own rows expire
                # immediately (insert+delete nets to zero copies).
                expiring = None
                if cfg.ttl_iters is not None:
                    all_seen = (
                        new_seen
                        if seen_full is None
                        else seen_full.select(*new_seen.columns).unionByName(
                            new_seen
                        )
                    )
                    expiring = all_seen.filter(
                        F.col("seen_iter") == it + 1 - cfg.ttl_iters
                    )
                merged_sketch = update_cuckoo_tables(
                    sketch,
                    new_seen,
                    expiring,
                    num_partitions=cfg.bloom_partitions,
                    num_buckets=cfg.cuckoo_buckets,
                )

        # 5c. frontier edges from outlinks; remaining = gated - dequeued + new
        remaining = gated.select(*FRONTIER_COLS).join(
            batch.select("url_hash"), "url_hash", "left_anti"
        )

        # edges come only from successful fetches (the parity oracle skips
        # error responses; an error page's partial outlinks are not crawled)
        outlinks = (
            deduped.filter(~F.col("error") & F.col("outlinks").isNotNull())
            .select(
                F.col("url_hash").alias("parent_url_hash"),
                (F.col("priority") * cfg.outlink_priority_decay).alias("priority"),
                F.explode("outlinks").alias("url"),
            )
        )
        edges = (
            with_canonical(outlinks, "url")
            .withColumn("discovered_iter", F.lit(it + 1).cast("int"))
            .select(*FRONTIER_COLS)
        )
        # drop edges already seen/dequeued; dedup within edges deterministically
        w_edge = Window.partitionBy("url_hash").orderBy(
            F.col("priority").desc(), F.col("url").asc()
        )
        # one combined anti-join instead of three sequential ones: the
        # excluded key sets (this batch, still-active seen, remaining
        # frontier) union into a single bare-key frame first — same result,
        # two fewer join stages per iteration (an anti-join needs no
        # distinct on its right side)
        exclude = new_seen.select("url_hash").unionByName(
            remaining.select("url_hash")
        )
        if seen is not None:
            exclude = exclude.unionByName(seen.select("url_hash"))
        edges = (
            edges.withColumn("__rn", F.row_number().over(w_edge))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .join(exclude, "url_hash", "left_anti")
        )

        next_frontier = remaining.unionByName(edges.select(*FRONTIER_COLS))
        if cfg.frontier_shuffle_partitions:
            next_frontier = next_frontier.repartition(
                cfg.frontier_shuffle_partitions, "host"
            )

        # 5d. token-bucket accounting for the next iteration
        new_buckets = politeness.next_bucket_state(
            gated_hosts, batch, bucket_state, window_ms=cfg.window_ms
        )

        # 6. commit snapshots — lineage strictly last (the commit point).
        # The five non-lineage snapshots are mutually independent once the
        # shared caches are materialized, and each is a small job whose
        # stragglers leave most of local[N] idle — so materialize the shared
        # lineage ONCE (batch via a cheap count on the cached dequeue,
        # deduped via the one-pass metrics aggregate, which runs the whole
        # fetch+decode chain), then run the writes CONCURRENTLY from a small
        # thread pool (guide §2.6: actions are only sequential because the
        # driver calls them sequentially; concurrent jobs back-fill each
        # other's task tails). Crash semantics are unchanged: any subset of
        # these snapshots without the lineage finalizer is rolled back by
        # rollback_above on resume, in whatever order it was written.
        meta = {"iter": it}
        batch.count()  # materialize the cached dequeue before fan-out

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            # EARLY writes — depend only on the just-materialized batch /
            # gated caches, so they overlap the metrics aggregate below
            # (which runs the whole fetch+decode chain)
            futures = [
                pool.submit(
                    catalog.write, new_buckets, "politeness",
                    mode="overwrite", meta=meta,
                ),
                pool.submit(
                    catalog.write, new_seen, "seen", mode="append", meta=meta
                ),
            ]
            if use_sketch:
                sk_meta = dict(meta)
                if cfg.sketch == "cuckoo":
                    # the maintenance TTL travels with the snapshot: a
                    # resume under a different ttl_iters must rebuild (see
                    # the freshness check at the top of the loop)
                    sk_meta["ttl_iters"] = cfg.ttl_iters
                futures.append(
                    pool.submit(
                        catalog.write, merged_sketch, sketch_table,
                        mode="overwrite", meta=sk_meta,
                    )
                )

            # one-pass metrics aggregate (vs one action per counter); also
            # materializes the deduped cache that results/frontier read —
            # it must run BEFORE those writes are submitted (two concurrent
            # consumers of a not-yet-materialized cache would both compute)
            mrow = deduped.agg(
                F.count("*").alias("n_results"),
                F.sum(
                    F.when(
                        F.col("decode_ok") & ~F.col("is_phash_dup"), 1
                    ).otherwise(0)
                ).alias("n_new_images"),
                F.sum(
                    F.when(F.col("error") | ~F.col("decode_ok"), 1).otherwise(0)
                ).alias("n_errors"),
            ).collect()[0]
            n_results = int(mrow["n_results"])
            n_new_images = int(mrow["n_new_images"] or 0)
            n_errors = int(mrow["n_errors"] or 0)
            metrics = spark.createDataFrame(
                [
                    (it, "dequeued", n_batch, None),
                    (it, "results", n_results, None),
                    (it, "new_unique_images", n_new_images, None),
                    (it, "errors", n_errors, None),
                ],
                schema=schemas.METRICS,
            )
            futures += [
                pool.submit(
                    catalog.write, results, "results", mode="append", meta=meta
                ),
                pool.submit(
                    catalog.write, next_frontier, "frontier",
                    mode="overwrite", meta=meta,
                ),
                pool.submit(
                    catalog.write, metrics, "metrics", mode="append", meta=meta
                ),
            ]
            for f in futures:
                f.result()  # surface any write error BEFORE the commit point

        lineage = (
            deduped.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .select(
                F.lit(it).cast("int").alias("iter"),
                F.col("partition_id").cast("int"),
                F.lit("fetch").alias("stage"),
                F.lit(n_batch).cast("long").alias("rows_in"),
                F.col("rows_out").cast("long"),
                F.lit(cfg.run_ts).alias("run_ts"),
            )
        )
        catalog.write(lineage, "lineage", mode="append", meta=meta)  # COMMIT

        # post-commit maintenance: compaction rewrites only FINALIZED state
        # (its snapshot carries meta.iter = it, so crash-resume semantics
        # are unchanged — see SnapshotCatalog.compact)
        if cfg.compact_every and (it + 1) % cfg.compact_every == 0:
            catalog.compact(spark, "seen")
            catalog.compact(spark, "results")

        seen_count += n_batch
        summary.append(
            {
                "iter": it,
                "dequeued": n_batch,
                "results": n_results,
                "new_unique_images": n_new_images,
                "errors": n_errors,
            }
        )
        batch.unpersist()
        pre_batch.unpersist()
        deduped.unpersist()
        gated.unpersist()
        if sketch_cached is not None:
            sketch_cached.unpersist()

    return {"start_iter": start_iter, "iterations": summary}
