"""Curation-chain scaling workload (VERDICT r4 #5).

SCALE.md argues the lang → quality → Gopher → exact-dedup → span-dup →
LSH → CC chain holds at 10^10 docs, but round 4 only measured it at sf0.1
(6.9 s). This module gives the chain the same treatment the crawl loop
gets in crawl/scaling.py: a deterministic ~10^6-doc synthetic corpus,
materialized ONCE as parquet (untimed), and a timed run of the REAL
``curate()`` chain over it at two parallelism levels → scaling
efficiency with a colocated hardware probe for attribution.

Corpus shape (all JVM expressions — sequence/transform + xxhash64, no
python in the generation path):

- a 50k-word synthetic vocab ("w" + hash id — distinct word SETS per doc,
  the property MinHash needs; a small literal vocab makes every doc's set
  identical and collapses LSH into one giant component);
- docs of 50-199 words drawn via xxhash64(seed, position); every doc
  opens with the lang/Gopher marker words so the gates keep it (gate
  discrimination is pinned elsewhere — tests/test_textstats_real.py);
- per 50-doc group: slots 45-46 are EXACT copies of slot 0 (exact-dedup
  load); slots 47-49 re-draw slot 0's word sequence with every 9th word
  replaced per-doc — word-set Jaccard ≈ 0.8 within {0,47,48,49} (the
  4-band×2-row LSH catches ≈0.98 of such pairs) while the shared-shingle
  fraction stays ≈ 2/9 ≪ the 0.8 span-dup gate, so the planted clusters
  SURVIVE to LSH+CC under the DEFAULT config (contiguous-copy near-dups
  would be span-gated away first — CLAUDE.md round-4 note).

The chain's scale-sensitive stages are the shingle groupBy (span-dup
gate), the MinHash partial-agg shuffle, the LSH band equi-join and the
CC fixpoint (fixed ~2 s/round driver latency — the Amdahl term this
workload is sized to dominate).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50_000
INPUT_FILES = 128  # materialized corpus files (see prepare_curation_inputs)
GROUP = 50  # docs per planted-duplicate group
_EXACT_SLOTS = (45, 46)  # exact copies of slot 0
_NEAR_SLOTS = (47, 48, 49)  # slot-0 draws, every 9th word re-drawn per doc
_CHANGE_EVERY = 9


def synth_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """Deterministic (doc_id, text) corpus, generated distributedly."""
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    slot = F.col("doc_id") % GROUP
    is_near = slot.isin(*_NEAR_SLOTS)
    base = F.when(
        slot.isin(*_EXACT_SLOTS) | is_near,
        F.col("doc_id") - slot,  # slot 0 of the group
    ).otherwise(F.col("doc_id"))
    n_words = (F.pmod(F.xxhash64(base), F.lit(150)) + 50).cast("int")

    def word(seed_col, i):
        # "w" + hash id: alpha-marked (Gopher frac_alpha), mean length ~5
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(seed_col, i), F.lit(VOCAB_SIZE)).cast("string"),
        )

    doc_id = F.col("doc_id")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.when(
                is_near & (i % _CHANGE_EVERY == 0), word(doc_id, i)
            ).otherwise(word(base, i)),
        ),
        " ",
    )
    # marker prefix: en lang markers + Gopher stopwords so the gates keep
    # the doc; their discrimination is pinned by handcrafted-doc tests
    text = F.concat(F.lit("the a fast slow offer of and that "), body)
    return df.select("doc_id", text.alias("text"))


def prepare_curation_inputs(
    spark: SparkSession, n_docs: int, out_dir: str
) -> str:
    """One-time UNTIMED materialization (identical bytes at every
    parallelism level — the crawl-scaling input contract)."""
    import os

    fingerprint = (
        f"v3 files={INPUT_FILES} n={n_docs} group={GROUP} "
        f"vocab={VOCAB_SIZE} chg={_CHANGE_EVERY}\n"
    )
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:
                return out_dir
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
    # INPUT_FILES files (not the generating session's core count): the
    # first 1M-doc measurement wrote 32×17 MB files, and Spark's split
    # packing (128 MB maxPartitionBytes + 4 MB openCostInBytes) binned
    # them into ~6 scan splits — the ENTIRE per-doc map side (metric
    # columns, shingle explode, MinHash partial aggs) ran 6-wide at both
    # parallelism levels, capping the 8→32 speedup at 1.35× (spark-layer
    # 0.39). At 100 TB a scan has thousands of ≥128 MB splits per node
    # and this never happens; many small files + the split sizing below
    # recreate that splits ≫ cores regime at bench scale.
    synth_documents(spark, n_docs).repartition(INPUT_FILES).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    with open(marker, "w") as f:
        f.write(fingerprint)
    return out_dir


def run_curation_scaling_workload(
    spark: SparkSession,
    n_docs: int = 1_000_000,
    input_dir: str | None = None,
) -> dict:
    """One full curate() pass over the materialized corpus; throughput."""
    import os
    import tempfile

    from nightcrawler_ds_pipeline_spark.operators.curation import (
        DEFAULT_CURATION,
        curate,
    )

    if input_dir is None:
        input_dir = os.path.join(
            tempfile.gettempdir(), f"ncds_curation_{n_docs}"
        )
    os.makedirs(input_dir, exist_ok=True)
    prepare_curation_inputs(spark, n_docs, input_dir)

    # Split sizing: the timed chain's per-doc cost is front-loaded in the
    # scan stage (metric columns, shingle explode, MinHash partial aggs
    # all pipeline into it), so scan splits must outnumber cores at BOTH
    # levels or the map side is the Amdahl term (measured: 6 splits ⇒
    # 8→32 speedup 1.35×). ~4 MB target splits turn the 128 × ~4 MB
    # input files into one split each — splits ≫ cores, the regime a
    # real ≥128 MB-split-per-task 100 TB scan is always in. Runtime SQL
    # confs, scoped to this workload and restored after.
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
    try:
        docs = spark.read.parquet(f"{input_dir}/documents.parquet")
        segs: dict = {}
        t0 = time.time()
        out = curate(docs, DEFAULT_CURATION, timings=segs)
        agg = out.agg(
            F.count("*").alias("kept"),
            F.count_distinct("group_id").alias("groups"),
            F.sum(
                F.when(F.col("is_canonical"), 1).otherwise(0)
            ).alias("canonical"),
        ).collect()[0]
        wall = time.time() - t0
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    segs["final_join_agg"] = round(
        wall
        - sum(v for v in segs.values() if isinstance(v, (int, float))),
        2,
    )
    return {
        "n_docs": n_docs,
        "kept": int(agg["kept"]),
        "groups": int(agg["groups"]),
        "canonical": int(agg["canonical"]),
        "sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "segments": segs,
    }
