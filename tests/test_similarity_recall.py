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


def test_elide_nullish_reference_semantics():
    d = {
        "a": None, "b": -1, "c": "", "d": 0, "e": False, "f": -1.0,
        "g": "x", "h": 0.0,
    }
    out = elide_nullish(d)
    assert out == {"d": 0, "e": False, "g": "x", "h": 0.0}
