"""Connected-components (large-star/small-star) vs a pure-Python union-find.

The union-find oracle is framework-independent, so these tests pin the
operator's semantics — min-id labeling, isolated nodes, transitive closure —
not its implementation.
"""

import random

import pytest
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.operators.components import (
    connected_components,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(spark, nodes, edges, **kw):
    edf = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges] or [(0, 0)], "u long, v long"
    )
    if not edges:
        edf = edf.filter(F.lit(False))
    ndf = spark.createDataFrame([(int(n),) for n in nodes], "node long")
    got = connected_components(edf, nodes=ndf, **kw).collect()
    return {r["node"]: r["component"] for r in got}


# local_edges_max=0 forces the distributed star fixpoint; the default takes
# the size-gated driver union-find path for these toy graphs — both must
# match the framework-independent oracle
@pytest.mark.parametrize("lmax", [None, 0], ids=["local", "distributed"])
def test_random_graphs_match_union_find(spark, lmax):
    kw = {} if lmax is None else {"local_edges_max": lmax}
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 60)
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(0, 2 * n))
        ]
        expect = _union_find(nodes, edges)
        got = _run(spark, nodes, edges, **kw)
        assert got == expect, f"trial {trial} n={n}"


@pytest.mark.parametrize("lmax", [None, 0], ids=["local", "distributed"])
def test_long_chain_converges_logarithmically(spark, lmax):
    # a 64-node path exercises multi-round convergence (diameter ≫ rounds)
    kw = {} if lmax is None else {"local_edges_max": lmax}
    nodes = list(range(64))
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, nodes, edges, **kw)
    assert got == {i: 0 for i in nodes}


def test_local_path_taken_below_threshold_and_matches_distributed(spark):
    # the gate reads the exact deduped edge count: below the threshold the
    # stats carry local_edges + rounds=0; forcing the distributed path on
    # the same input yields the identical labeling
    edges = [(i, i + 7) for i in range(0, 190, 3)] + [(5, 90), (1, 181)]
    nodes = list(range(200))
    s_local, s_dist = {}, {}
    got_local = _run(spark, nodes, edges, stats=s_local)
    got_dist = _run(spark, nodes, edges, stats=s_dist, local_edges_max=0)
    assert s_local["rounds"] == 0 and s_local["local_edges"] > 0
    assert s_dist["rounds"] > 0 and "local_edges" not in s_dist
    assert got_local == got_dist == _union_find(nodes, edges)


def test_isolated_nodes_label_themselves(spark):
    got = _run(spark, [1, 2, 3, 10], [(1, 2)])
    assert got == {1: 1, 2: 1, 3: 3, 10: 10}


def test_empty_edges(spark):
    got = _run(spark, [4, 5], [])
    assert got == {4: 4, 5: 5}


def test_self_loops_and_duplicate_edges(spark):
    got = _run(spark, [0, 1, 2], [(1, 1), (2, 1), (1, 2), (2, 1)])
    assert got == {0: 0, 1: 1, 2: 1}


@pytest.mark.parametrize("lmax", [None, 0], ids=["local", "distributed"])
def test_string_ids(spark, lmax):
    kw = {} if lmax is None else {"local_edges_max": lmax}
    edf = spark.createDataFrame(
        [("img_b", "img_c"), ("img_a", "img_b")], "u string, v string"
    )
    ndf = spark.createDataFrame([("img_a",), ("img_b",), ("img_c",), ("img_z",)], "node string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, nodes=ndf, **kw).collect()
    }
    assert got == {
        "img_a": "img_a",
        "img_b": "img_a",
        "img_c": "img_a",
        "img_z": "img_z",
    }


def test_phash_groups_cluster_planted_dups(spark):
    # planted: 3 images sharing a phash band within hamming 6 → one group
    from nightcrawler_ds_pipeline_spark.operators.components import (
        image_phash_groups,
    )

    out = image_phash_groups(spark, "/root/testdata/sf0.001").collect()
    groups = {}
    for r in out:
        groups.setdefault(r["group_id"], set()).add(r["image_id"])
    # every group has ≥2 members (singletons never appear: nodes come from pairs)
    assert all(len(m) >= 2 for m in groups.values())
    # group id is the minimum member id
    assert all(gid == min(m) for gid, m in groups.items())


def test_phash_neardup_banding_complete(spark):
    """Pigeonhole completeness of the Manku 28-combo banding: the operator
    must find EXACTLY the all-pairs brute-force hamming ≤ 6 set over the t1
    image corpus (500 images, planted exact dups). The pre-round-4
    single-band (top-16-bit) key would fail this: any pair differing inside
    the key band was silently dropped."""
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet
    from nightcrawler_ds_pipeline_spark.operators.multimodal import (
        image_phash_neardup,
    )

    fx = write_fixture_parquet("t1")
    rows = (
        spark.read.parquet(f"{fx}/images.parquet")
        .select("image_id", "phash")
        .where(F.col("phash") != 0)
        .collect()
    )
    ph = [(r["image_id"], r["phash"] & 0xFFFFFFFFFFFFFFFF) for r in rows]
    expect = set()
    for i in range(len(ph)):
        for j in range(i + 1, len(ph)):
            d = bin(ph[i][1] ^ ph[j][1]).count("1")
            if d <= 6:
                pa, pb = sorted((ph[i][0], ph[j][0]))
                expect.add((pa, pb, d))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_phash_neardup(spark, None).collect()
    }
    assert expect, "fixture must plant at least one near-dup pair"
    assert got == expect


def test_cc_hypothesis_random_graphs(spark):
    """Property: CC labels equal union-find min-labels on arbitrary edge
    lists (hypothesis-driven, deterministic derandomized profile)."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        n=st.integers(min_value=1, max_value=40),
        edges=st.lists(
            st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=60
        ),
    )
    def prop(n, edges):
        edges = [(u % n, v % n) for u, v in edges]
        nodes = list(range(n))
        assert _run(spark, nodes, edges) == _union_find(nodes, edges)

    prop()
