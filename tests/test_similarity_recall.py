"""ANN quality + output-parity writer tests."""

from nightcrawler_ds_pipeline_spark.operators.similarity import (
    sim_ann_lsh,
    sim_topk_bruteforce,
)
from nightcrawler_ds_pipeline_spark.pipeline.output import elide_nullish

SF_DIR = "/root/testdata/sf0.001"


def test_ann_lsh_recall_vs_bruteforce(spark):
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ann_lsh(spark, SF_DIR).collect()
    }
    # 16 tables × 6 hyperplanes on 500 random 64-d vecs → measured ~0.66
    assert approx, "LSH returned nothing"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} too low"
    # every approx neighbor must at least share the query's bucket semantics
    # (sanity: no self-pairs, valid ids)
    assert all(q != n for q, n in approx)


def test_ann_ivf_recall_vs_bruteforce(spark):
    from nightcrawler_ds_pipeline_spark.operators.similarity import sim_ann_ivf

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_ann_ivf(spark, SF_DIR).collect()
    }
    assert approx, "IVF returned nothing"
    # nprobe 8/16 on isotropic 64-d vectors: probing half the inverted
    # lists recovers well over half of the true top-10
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} too low"
    assert all(q != n for q, n in approx)


def test_embedding_lsh_pairs_recall_vs_exact(spark):
    """Semantic-dedup scale path: LSH-bucketed pairs must recover ≥0.9 of
    the exact all-pairs cosine≥0.9 set on a corpus with PLANTED near-dups
    (random 64-d vectors almost never exceed 0.9, so plant perturbed
    copies: cos(v, v+0.05·noise) ≈ 0.999)."""
    import numpy as np

    from nightcrawler_ds_pipeline_spark.operators.similarity import (
        embedding_lsh_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # plant a near-duplicate of every 3rd vector
        if i % 3 == 0:
            w = v + 0.05 * rng.standard_normal(64)
            rows.append((1000 + i, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_lsh_pairs(spark, emb, threshold=0.9).collect()
    }
    # exact all-pairs ground truth, computed driver-side in numpy
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    exact = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.9
    }
    assert len(exact) >= 30  # the planted dups are actually there
    assert not (lsh - exact)  # no false positives (exact cosine re-check)
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} too low"


def test_elide_nullish_reference_semantics():
    d = {
        "a": None, "b": -1, "c": "", "d": 0, "e": False, "f": -1.0,
        "g": "x", "h": 0.0,
    }
    out = elide_nullish(d)
    assert out == {"d": 0, "e": False, "g": "x", "h": 0.0}
