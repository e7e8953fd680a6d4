"""Configurable MinHash-LSH banding (CurationConfig.lsh_num_hashes /
lsh_band_size — dedup.py module comment).

Two things are pinned here:

1. Spark↔DuckDB parity holds at NON-default banding parameters — the
   parameterized ``minhash_pairs_sql`` twin stays composed with the same
   (num_hashes, band_size), so an override cannot silently desync an
   oracle built from it.

2. The scale motivation is real and the knob fixes it: at r=2 rows/band
   the per-pair false-positive rate is j^2, and candidate edges grow with
   C(n,2)·b·j^2 — a birthday effect measured at 1M synthetic docs as 2.2M
   candidate edges collapsing 20k planted clusters into 3.2k giant
   components. On the same synthetic corpus at test scale, default 4×2
   banding emits hundreds of cross-group (false-positive) edges while
   16-hash × 4-row banding emits none AND still connects the planted
   near-duplicate clusters (word-set Jaccard ≈ 0.8 ≫ the (1/4)^(1/4) ≈
   0.71 knee).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.operators.components import (
    connected_components,
)
from nightcrawler_ds_pipeline_spark.operators.curation import CurationConfig
from nightcrawler_ds_pipeline_spark.operators.curation_scaling import (
    GROUP,
    synth_documents,
)
from nightcrawler_ds_pipeline_spark.operators.dedup import (
    minhash_band_pairs_df,
    minhash_band_star_edges_df,
    minhash_pairs_sql,
)

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 10_000  # 200 planted groups of GROUP=50 (curation_scaling shape)


def test_nondefault_banding_matches_duckdb_twin(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_band_pairs_df(docs, 16, 4).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    sql = minhash_pairs_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 200)", 16, 4
    )
    want = sorted(
        (a, b)
        for a, b in con.sql(
            f"WITH {sql} SELECT id_a, id_b FROM pairs"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_strong_banding_kills_birthday_false_positives(spark):
    docs = synth_documents(spark, N_DOCS)
    grp = (F.col("id_a") / GROUP).cast("long") != (
        F.col("id_b") / GROUP
    ).cast("long")

    def cross_and_total(num_hashes, band_size):
        e = minhash_band_star_edges_df(docs, num_hashes, band_size)
        row = e.agg(
            F.count("*").alias("total"),
            F.sum(F.when(grp, 1).otherwise(0)).alias("cross"),
        ).collect()[0]
        return int(row["cross"]), int(row["total"])

    cross_default, total_default = cross_and_total(8, 2)
    cross_strong, total_strong = cross_and_total(16, 4)
    # default banding: the quadratic false-positive regime is present even
    # at 10k docs (hundreds of cross-group edges); strong banding collapses
    # it by an order of magnitude+. Not to zero: every synthetic doc shares
    # the 8-word lang/Gopher marker prefix, so two ~58-word docs have a
    # TRUE background Jaccard ≈ 0.07 (j^4 leaves a ~17-edge tail at this
    # size) — the same stopword-overlap floor a real corpus has.
    assert cross_default > 100, (cross_default, total_default)
    assert cross_strong * 10 < cross_default, (cross_strong, cross_default)
    # ...while still catching the planted near-dups (within-group edges)
    assert total_strong - cross_strong > 0


def test_strong_banding_still_groups_planted_near_dups(spark):
    docs = synth_documents(spark, N_DOCS)
    edges = minhash_band_star_edges_df(docs, 16, 4)
    cc = connected_components(
        edges.withColumnRenamed("id_a", "u").withColumnRenamed("id_b", "v")
    )
    # a planted group is "recovered" when its base doc (slot 0) and all
    # three near-dup slots (47-49) share one component
    slot = F.col("node") % GROUP
    members = cc.filter(slot.isin(0, 47, 48, 49)).select(
        (F.col("node") / GROUP).cast("long").alias("g"),
        "component",
    )
    recovered = (
        members.groupBy("g")
        .agg(
            F.count_distinct("component").alias("ncomp"),
            F.count("*").alias("n"),
        )
        .filter((F.col("ncomp") == 1) & (F.col("n") == 4))
        .count()
    )
    n_groups = N_DOCS // GROUP
    # per-pair detection at j≈0.8 is 1-(1-0.8^4)^4 ≈ 0.88; with 6 pairs
    # per 4-doc cluster the full-cluster connectivity rate is far higher —
    # require 70% as a loose deterministic floor (hashes are seed-free
    # deterministic md5s, so this does not flake)
    assert recovered >= 0.7 * n_groups, (recovered, n_groups)


def test_curation_config_validates_banding():
    with pytest.raises(ValueError, match="lsh_num_hashes"):
        CurationConfig(lsh_num_hashes=10, lsh_band_size=4)
    with pytest.raises(ValueError, match="lsh_num_hashes"):
        CurationConfig(lsh_num_hashes=0)
    cfg = CurationConfig(lsh_num_hashes=16, lsh_band_size=4)
    assert cfg.lsh_num_hashes == 16
