"""Plan-quality gates for the dedup-group / curation chain: the scale story
is 'key-partitioned shuffles only' — no cartesian products, no unpartitioned
windows, no Python evaluation anywhere in the corpus-curation plan."""

import contextlib
import io

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_curation_plan_is_jvm_only_no_cartesian(spark):
    from nightcrawler_ds_pipeline_spark.operators.curation import corpus_curation

    plan = _plan(corpus_curation(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the exact-dedup keep-min is a hash-agg + join, never a global window
    assert "Window" not in plan


def test_cc_round_plan_shape(spark):
    """One star round = ONE exchange keyed on the node id feeding a
    per-node window min — no cartesian, no Python, and crucially NO JOIN:
    the r5 groupBy+join-back formulation referenced the incident-edge
    frame in two subplans and re-executed its lineage twice (exchange
    reuse does not fire across a partial agg). The window must carry a
    partition spec (u) — never a global window."""
    from nightcrawler_ds_pipeline_spark.operators.components import (
        _large_star,
        _small_star,
    )

    edges = spark.range(0, 1000).select(
        F.col("id").alias("u"), ((F.col("id") * 7) % 1000).alias("v")
    )
    for step in (_large_star, _small_star):
        plan = _plan(step(edges))
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Join" not in plan  # no join-back: single-exchange star
        # windowed min, partitioned on the node id (never a global window)
        assert "Window" in plan
        assert "windowspecdefinition(u#" in plan


def test_cc_driver_sees_only_scalars(spark):
    """The convergence probe must never collect edges: connected_components
    on a graph with a poisoned column would throw at collect-time if rows
    crossed the driver. Proxy gate: the fingerprint helper returns exactly
    two ints for an arbitrarily wide edge set."""
    from nightcrawler_ds_pipeline_spark.operators.components import (
        _edge_fingerprint,
    )

    edges = spark.range(0, 10_000).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    n, h = _edge_fingerprint(edges)
    assert n == 10_000 and isinstance(h, int)


def test_star_join_dims_broadcast(spark):
    """The dim chain (customer -> nation -> region) must broadcast; a
    sort-merge join on a 25-row dim would be the classic anti-pattern."""
    from nightcrawler_ds_pipeline_spark.operators.joins import (
        join_star_region_revenue,
    )

    plan = _plan(join_star_region_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def _neardup_corpus(spark):
    """Mixed corpus: an identical 8-doc cluster, a near-dup pair sharing
    most tokens, and unique docs — enough bucket structure to make the
    clique/star comparison non-trivial."""
    base = "the quick brown fox jumps over the lazy dog near the old river"
    docs = [(i, base) for i in range(8)]
    docs += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    docs += [(200 + i, f"unique document number {i} about topic {i * 7}")
             for i in range(5)]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_star_edges_components_equal_clique_pairs(spark):
    """The curation chain's star-edge LSH formulation must label components
    IDENTICALLY to the oracle's clique-pair formulation — the equivalence
    that lets the chain run O(k) edges per bucket against an O(k^2) oracle."""
    from nightcrawler_ds_pipeline_spark.operators.components import (
        connected_components,
    )
    from nightcrawler_ds_pipeline_spark.operators.dedup import (
        minhash_band_pairs_df,
        minhash_band_star_edges_df,
    )

    docs = _neardup_corpus(spark)
    nodes = docs.select("doc_id")
    via_pairs = {
        (r["node"], r["component"])
        for r in connected_components(
            minhash_band_pairs_df(docs), nodes=nodes
        ).collect()
    }
    via_star = {
        (r["node"], r["component"])
        for r in connected_components(
            minhash_band_star_edges_df(docs), nodes=nodes
        ).collect()
    }
    assert via_star == via_pairs
    # sanity: the identical cluster actually grouped (all 8 under min id 0)
    assert {(i, 0) for i in range(8)} <= via_star


def test_star_edges_linear_in_bucket_size(spark):
    """A k-doc identical cluster collides in every band: clique pairs are
    k(k-1)/2, star edges exactly k-1 — the at-scale reason the chain uses
    the star formulation."""
    from nightcrawler_ds_pipeline_spark.operators.dedup import (
        minhash_band_pairs_df,
        minhash_band_star_edges_df,
    )

    k = 40
    docs = spark.createDataFrame(
        [(i, "same text every time for this whole cluster") for i in range(k)]
        + [(900, "completely different content standing alone")],
        "doc_id long, text string",
    )
    assert minhash_band_pairs_df(docs).count() == k * (k - 1) // 2
    star = minhash_band_star_edges_df(docs).collect()
    assert len(star) == k - 1
    assert all(r["id_a"] == 0 for r in star)


def test_minhash_signatures_single_shuffle(spark):
    """Signature generation must be explode -> partial agg -> ONE exchange
    on doc_id. A second exchange means someone reintroduced the redundant
    (doc_id, token) distinct (min over a multiset == min over the set)."""
    from nightcrawler_ds_pipeline_spark.operators.dedup import (
        minhash_signatures_df,
    )

    docs = spark.createDataFrame(
        [(0, "a b c a"), (1, "d e f")], "doc_id long, text string"
    )
    import re

    plan = _plan(minhash_signatures_df(docs))
    # formatted output lists each node twice (tree + detail) — count the
    # numbered detail entries: one shuffle for the final agg, no distinct
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_span_dup_stats_exact_under_planted_skew(spark):
    """Correctness under the skew the span-dup shuffle sees at corpus scale:
    half the docs share ONE boilerplate 8-gram (a single shingle key holding
    half the corpus), the rest are all-unique. Every per-doc count must be
    exact — the hot key must neither drop nor double-count rows."""
    from nightcrawler_ds_pipeline_spark.operators.dedup import (
        ngram_dup_stats_df,
    )

    n = 10_000
    boiler = " ".join(f"b{j}" for j in range(8))
    rows = []
    for i in range(n):
        uniq = " ".join(f"u{i}w{j}" for j in range(7))
        # even docs: boilerplate + unique tail -> 15 words, 8 shingles, of
        # which exactly one (the pure-boilerplate 8-gram) is cross-doc dup
        # odd docs: 15 unique words -> 8 shingles, none duplicated
        text = f"{boiler} {uniq}" if i % 2 == 0 else f"{uniq} " + " ".join(
            f"x{i}y{j}" for j in range(8)
        )
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_dup"])
           for r in ngram_dup_stats_df(docs).collect()}
    assert len(got) == n
    for i in range(n):
        assert got[i] == (8, 1 if i % 2 == 0 else 0), (i, got[i])
