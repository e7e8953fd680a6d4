"""Snapshot table layer — Iceberg-semantics state store on parquet.

The crawl loop's state (frontier, seen-set, Bloom sketches, robots cache,
results, lineage) lives in tables with **atomic snapshot commits**: a writer
stages parquet files into a new snapshot directory, then commits by
atomically replacing the table's manifest (``os.replace``). Readers only see
committed snapshots, so a crash mid-iteration leaves no partial state — this
is what makes resume *exact* (north_rule: per-partition lineage + resumable
checkpoints; reference analogue: the per-stage JSON checkpoints at
base.py:285-309 and file resume at helpers/utils_io.py:20-51).

On a real cluster this layer is Apache Iceberg (append / overwrite
snapshots, metadata-level partition pruning); the jars are not in this
container, so ``IcebergCatalog`` raises unless the runtime has them, and
``SnapshotCatalog`` provides the same commit semantics on plain parquet.
Every snapshot carries a ``meta`` dict — the crawl loop tags snapshots with
their iteration id and readers filter ``meta["iter"] <= committed_iter``,
which is how un-finalized iterations are rolled back for free.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    """Minimal ACID-ish table catalog: append/overwrite snapshots on parquet."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_snapshots.json")

    def _load_manifest(self, table: str) -> list[dict]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, table: str, snapshots: list[dict]) -> None:
        path = self._manifest_path(table)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snapshots, f, indent=1)
        os.replace(tmp, path)  # atomic commit point

    # -- public API ---------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        meta: dict | None = None,
        partition_by: list[str] | None = None,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Stage parquet for ``df`` then atomically commit a snapshot.

        ``stats_cols`` opts the snapshot into manifest-level column stats
        (the Iceberg manifest min/max analogue): after the write, per-column
        global min/max are harvested from the already-written parquet
        FOOTERS (pyarrow metadata only — no data scan, no extra Spark job)
        and stored in the manifest entry, enabling snapshot-level pruning in
        ``read(prune=...)``."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"bad mode {mode!r}")
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        snapshots = self._load_manifest(table)
        snap_id = (snapshots[-1]["id"] + 1) if snapshots else 0
        data_dir = os.path.join(tdir, f"snap-{snap_id:06d}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        entry = {"id": snap_id, "dir": data_dir, "mode": mode, "meta": meta or {}}
        if stats_cols:
            stats = _footer_stats(data_dir, stats_cols)
            if stats:
                entry["stats"] = stats
        snapshots.append(entry)
        self._commit_manifest(table, snapshots)
        return snap_id

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)

    def latest_iter(self, table: str, max_iter: int | None = None) -> int:
        """Max ``meta.iter`` among committed snapshots (``<= max_iter`` when
        given), or -1 if none — manifest-only, no data scan. Used by the
        crawl loop to detect a stale Bloom snapshot (older than the seen
        table it must over-approximate)."""
        snaps = self._load_manifest(table)
        if max_iter is not None:
            snaps = [s for s in snaps if s["meta"].get("iter", -1) <= max_iter]
        return max((s["meta"].get("iter", -1) for s in snaps), default=-1)

    def latest_meta(self, table: str, max_iter: int | None = None) -> dict:
        """Meta dict of the newest committed snapshot (``<= max_iter`` when
        given), or {} — manifest-only. The crawl loop stores sketch-validity
        config (e.g. the cuckoo's ttl_iters) here so a resume under a
        different config can detect and rebuild."""
        snaps = self._load_manifest(table)
        if max_iter is not None:
            snaps = [s for s in snaps if s["meta"].get("iter", -1) <= max_iter]
        return dict(snaps[-1]["meta"]) if snaps else {}

    def exists(self, table: str) -> bool:
        return bool(self._load_manifest(table))

    def read(
        self,
        spark: SparkSession,
        table: str,
        max_iter: int | None = None,
        merge_schema: bool = False,
        as_of: int | None = None,
        prune: tuple | None = None,
    ) -> DataFrame | None:
        """Union of live snapshots: everything since the last overwrite,
        optionally restricted to snapshots with ``meta['iter'] <= max_iter``
        (exact-resume rollback of un-finalized iterations).

        ``merge_schema=True`` enables additive schema evolution (the
        Iceberg add-column analogue): snapshots written with a superset
        schema union cleanly, old rows read NULL for the new columns.
        Off by default — the footer-merge pass costs one extra file
        round per read, and the crawl loop's own tables have fixed
        schemas within a run.

        ``as_of`` is snapshot-id time travel (Iceberg ``VERSION AS OF``):
        the live set is computed as if no snapshot with ``id > as_of`` had
        ever been committed — an overwrite or compaction after that point
        is invisible.

        ``prune=(col, lo, hi)`` is manifest-level scan pruning (the Iceberg
        metadata-pruning analogue): live snapshots whose stored footer
        min/max for ``col`` (see ``write(stats_cols=...)``) provably miss
        the ``[lo, hi]`` window (either bound may be None = unbounded) are
        dropped WITHOUT opening their files. Snapshots without stats for
        ``col`` are conservatively kept. Returns None when every live
        snapshot prunes away."""
        snaps = self._load_manifest(table)
        if as_of is not None:
            snaps = [s for s in snaps if s["id"] <= as_of]
        if max_iter is not None:
            snaps = [s for s in snaps if s["meta"].get("iter", -1) <= max_iter]
        if not snaps:
            return None
        live: list[dict] = []
        for s in snaps:
            if s["mode"] == "overwrite":
                live = [s]
            else:
                live.append(s)
        if prune is not None:
            col, lo, hi = prune
            live = [s for s in live if _stats_may_match(s, col, lo, hi)]
            if not live:
                return None
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[s["dir"] for s in live])
        return df

    def read_incremental(
        self,
        spark: SparkSession,
        table: str,
        after_iter: int,
        until_iter: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame | None:
        """Incremental consumption (the Iceberg incremental-read analogue):
        only the APPEND snapshots with ``after_iter < meta.iter``
        (``<= until_iter`` when given). Downstream consumers — e.g. a
        training-data pipeline ingesting each iteration's new results —
        read just the delta instead of rescanning the whole table (at the
        10^10 design point the results table is TBs; one iteration's
        appends are GBs). Raises if an OVERWRITE snapshot lands inside the
        requested window: an overwrite breaks append-delta semantics, and
        consuming across it silently would replay rows.

        When ``until_iter`` is None the window is capped at the last
        LINEAGE-COMMITTED iteration (same discipline as ``read(max_iter=
        committed)``): a crash can leave an append whose finalizer never
        landed, and ``rollback_above`` will delete it on resume — a
        consumer that ingested it would hold rows that no longer exist and
        a cursor already past the re-run iteration. Catalogs without a
        lineage table (raw use outside the loop) stay unbounded; a lineage
        table that EXISTS but has no committed snapshot (crash before the
        first finalizer, or a resume rollback) caps the window at -1 — an
        unbounded window there would ingest exactly the orphan appends
        ``rollback_above`` is about to delete."""
        if until_iter is None:
            if os.path.isdir(self._table_dir("lineage")):
                lineage = self._load_manifest("lineage")
                until_iter = max(
                    (s["meta"].get("iter", -1) for s in lineage), default=-1
                )
        snaps = self._load_manifest(table)
        window = [
            s
            for s in snaps
            if s["meta"].get("iter", -1) > after_iter
            and (until_iter is None or s["meta"].get("iter", -1) <= until_iter)
        ]
        bad = [s for s in window if s["mode"] != "append"]
        if bad:
            raise ValueError(
                f"incremental read of {table!r} after iter {after_iter}: "
                f"snapshot {bad[0]['id']} (iter {bad[0]['meta'].get('iter')}) "
                "is an overwrite — delta semantics end at an overwrite; "
                "re-baseline from read() instead"
            )
        if not window:
            return None
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[s["dir"] for s in window])

    def rollback_above(self, max_iter: int) -> None:
        """Drop snapshots from un-finalized iterations (meta.iter > max_iter)
        across ALL tables. Called on resume: a crash can leave committed
        snapshots for an iteration whose lineage (the finalizer) never
        landed; without this, re-running the iteration would append a second
        copy and duplicate rows forever."""
        import os as _os

        for table in list(_os.listdir(self.root)):
            if not _os.path.isdir(self._table_dir(table)):
                continue
            snaps = self._load_manifest(table)
            keep = [s for s in snaps if s["meta"].get("iter", -1) <= max_iter]
            if len(keep) != len(snaps):
                self._commit_manifest(table, keep)

    def truncate(self, table: str) -> None:
        tdir = self._table_dir(table)
        if os.path.exists(tdir):
            shutil.rmtree(tdir)

    def expire_snapshots(self, table: str, keep_from_id: int | None = None) -> int:
        """Drop snapshots superseded by a later overwrite (the Iceberg
        ``expire_snapshots`` analogue): manifest entries that no current
        read path can reach — every snapshot before the last overwrite —
        are removed and their data dirs deleted. ``keep_from_id`` retains
        superseded snapshots with ``id >= keep_from_id`` so time travel
        (``read(as_of=...)``) keeps working back to that point; the default
        expires all of them (trading time travel below the overwrite for
        reclaimed disk, same trade as ``compact(vacuum=True)``). Live
        snapshots are never touched. Returns the number expired.

        A later ``rollback_above`` below the overwrite's iteration cannot
        re-expose expired snapshots — run expiration only on lineage-
        committed history (the crawl loop's finalized iterations)."""
        snaps = self._load_manifest(table)
        live: list[dict] = []
        for s in snaps:
            live = [s] if s["mode"] == "overwrite" else live + [s]
        live_ids = {s["id"] for s in live}

        def _expired(s: dict) -> bool:
            return s["id"] not in live_ids and (
                keep_from_id is None or s["id"] < keep_from_id
            )

        dead = [s for s in snaps if _expired(s)]
        if not dead:
            return 0
        kept = [s for s in snaps if not _expired(s)]
        # preserve the streaming exactly-once watermark (see compact): if an
        # expired snapshot held the max stream_batch_id, stamp it onto the
        # newest surviving snapshot before the dead entries vanish.
        dead_sb = max((s["meta"].get("stream_batch_id", -1) for s in dead), default=-1)
        if dead_sb >= 0 and kept:
            kept_sb = max(
                (s["meta"].get("stream_batch_id", -1) for s in kept), default=-1
            )
            if dead_sb > kept_sb:
                kept[-1] = {
                    **kept[-1],
                    "meta": {**kept[-1]["meta"], "stream_batch_id": dead_sb},
                }
        self._commit_manifest(table, kept)
        for s in dead:
            shutil.rmtree(s["dir"], ignore_errors=True)
        return len(dead)

    def remove_orphans(self, table: str, grace_s: float = 3600.0) -> int:
        """Delete ``snap-*`` data dirs not referenced by the manifest (the
        Iceberg ``remove_orphan_files`` analogue). Orphans accrue from two
        real paths: ``rollback_above`` (drops manifest entries, keeps dirs)
        and a writer that crashed after staging parquet but before its
        manifest commit. ``grace_s`` skips dirs younger than the grace
        window so an IN-FLIGHT writer's staging dir is never swept — same
        caveat as Iceberg's ``older_than`` retention (pass 0 only when no
        writer can be active). Returns the number of dirs removed."""
        import time as _time

        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return 0
        referenced = {
            os.path.basename(s["dir"]) for s in self._load_manifest(table)
        }
        now = _time.time()
        removed = 0
        for name in os.listdir(tdir):
            path = os.path.join(tdir, name)
            if (
                name.startswith("snap-")
                and os.path.isdir(path)
                and name not in referenced
                and now - os.path.getmtime(path) >= grace_s
            ):
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        return removed

    def compact(
        self,
        spark: SparkSession,
        table: str,
        num_files: int | None = None,
        vacuum: bool = False,
        merge_schema: bool = False,
    ) -> int | None:
        """Rewrite the table's LIVE state as one overwrite snapshot (the
        Iceberg `rewrite_data_files` analogue). Append-mode tables grow one
        snapshot per iteration — at 10^10 scale thousands of small files
        per table — so periodic compaction keeps the scan-side file count
        bounded. The compacted snapshot carries the max iter seen, so
        exact resume at or above that iteration is unaffected; resuming
        BELOW it still works because the superseded snapshots stay in the
        manifest (``rollback_above`` drops the compaction and re-exposes
        them) — unless ``vacuum=True``, which trades that time travel for
        reclaimed disk (prunes superseded manifest entries + dirs).

        Returns the new snapshot id, or None if there is nothing to do.
        """
        snaps = self._load_manifest(table)
        live: list[dict] = []
        for s in snaps:
            live = [s] if s["mode"] == "overwrite" else live + [s]
        if len(live) <= 1:
            return None
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[s["dir"] for s in live])
        if num_files is None:
            num_files = max(1, spark.sparkContext.defaultParallelism)
        max_it = max(s["meta"].get("iter", -1) for s in snaps)
        meta = {"iter": max_it, "compacted_from": [s["id"] for s in live]}
        # exactly-once streaming sinks (streaming/catalog_sink.py) key their
        # replay skip off max(meta.stream_batch_id) over the manifest; carry
        # it through the overwrite so vacuum/expire of the absorbed append
        # snapshots cannot reset the watermark and re-admit a replayed
        # micro-batch after a crash between sink commit and checkpoint.
        max_sb = max((s["meta"].get("stream_batch_id", -1) for s in snaps), default=-1)
        if max_sb >= 0:
            meta["stream_batch_id"] = max_sb
        snap_id = self.write(
            df.coalesce(num_files),
            table,
            mode="overwrite",
            meta=meta,
        )
        if vacuum:
            snaps = self._load_manifest(table)
            keep = [s for s in snaps if s["id"] == snap_id]
            dead = [s for s in snaps if s["id"] != snap_id]
            self._commit_manifest(table, keep)
            for s in dead:
                shutil.rmtree(s["dir"], ignore_errors=True)
        return snap_id


def _footer_stats(data_dir: str, cols: list[str]) -> dict:
    """Global min/max per requested column, harvested from parquet footer
    row-group statistics (pyarrow metadata — never reads data pages).
    Columns with any stat-less row group, or with non-JSON-scalar stat
    values (e.g. timestamps, binary), are omitted — pruning treats a
    missing column as "may match" so omission is always safe."""
    import pyarrow.parquet as pq

    mins: dict = {}
    maxs: dict = {}
    bad: set = set()
    wanted = set(cols)
    for root_, _dirs, files in os.walk(data_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root_, fn)).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name not in wanted or name in bad:
                        continue
                    st = col.statistics
                    if (
                        st is None
                        or not st.has_min_max
                        or not isinstance(st.min, (bool, int, float, str))
                        or not isinstance(st.max, (bool, int, float, str))
                    ):
                        bad.add(name)
                        continue
                    mins[name] = st.min if name not in mins else min(mins[name], st.min)
                    maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
    return {c: [mins[c], maxs[c]] for c in mins if c not in bad and c in maxs}


def _stats_may_match(snap: dict, col: str, lo, hi) -> bool:
    """Conservative overlap test of a snapshot's stored [min, max] for
    ``col`` against the [lo, hi] window; no stats → may match."""
    st = (snap.get("stats") or {}).get(col)
    if not st:
        return True
    mn, mx = st
    if lo is not None and mx is not None and mx < lo:
        return False
    if hi is not None and mn is not None and mn > hi:
        return False
    return True


class IcebergCatalog:  # pragma: no cover - requires iceberg jars
    """Real Iceberg-backed catalog — same interface, used on clusters where
    ``org.apache.iceberg.spark.SparkCatalog`` is on the classpath."""

    def __init__(self, root: str):
        raise NotImplementedError(
            "Iceberg runtime jars are not available in this environment; "
            "use SnapshotCatalog (same commit semantics on parquet)."
        )


def get_catalog(root: str, impl: str = "snapshot"):
    if impl == "iceberg":
        return IcebergCatalog(root)
    return SnapshotCatalog(root)
