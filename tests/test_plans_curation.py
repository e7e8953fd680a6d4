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
    """One star round = shuffles keyed on the node id — no cartesian, no
    Python, no window; the join is an equi-join (hash or sort-merge)."""
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
        assert "Window" not in plan
        assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
            "ShuffledHashJoin" in plan
        )


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
