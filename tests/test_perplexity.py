"""CCNet-style bigram-LM perplexity: the quality signal must rank fluent
in-domain text below (better than) gibberish, and the registered bucket
query must partition the corpus consistently with its own thresholds."""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.functions.ngram_lm import (
    perplexity,
    train_bigram_lm,
)

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


REFERENCE = [
    "the quick brown fox jumps over the lazy dog in the green field",
    "the dog runs over the field and the fox sleeps under the tree",
    "a fox and a dog play in the field near the old tree every day",
    "the tree stands in the field where the quick fox runs with the dog",
]


def test_fluent_text_scores_below_gibberish():
    model = train_bigram_lm(REFERENCE)
    fluent = "the quick fox runs over the field near the tree"
    # same vocabulary, bigram structure destroyed
    gibberish = "tree the over field quick the runs near fox the"
    assert perplexity(fluent, model) < perplexity(gibberish, model)
    # out-of-domain words map to <unk> and score worse than in-domain
    oov = "zymurgy quux flibber wombat zorp glib snark fizzle"
    assert perplexity(fluent, model) < perplexity(oov, model)


def test_perplexity_edge_cases():
    model = train_bigram_lm(REFERENCE)
    # empty / None / tokenless text scores finite (worst-case <unk>)
    for t in ("", None, "!!! ???"):
        p = perplexity(t, model)
        assert p > 0 and p == p  # finite, not NaN
    # deterministic
    assert perplexity("the fox", model) == perplexity("the fox", model)
    # training is deterministic for the same input
    m2 = train_bigram_lm(REFERENCE)
    assert m2["bigram"] == model["bigram"] and m2["vocab"] == model["vocab"]


def test_bucket_query_partitions_by_threshold(spark):
    from nightcrawler_ds_pipeline_spark.operators.textstats import (
        text_perplexity_buckets,
    )

    df = text_perplexity_buckets(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    n = len(rows)
    assert n > 0
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["ppl"])
    assert set(by_bucket) <= {"head", "middle", "tail"}
    # bucket boundaries are consistent: every head ppl ≤ every middle ppl
    # ≤ every tail ppl (tertile split on the same scored column)
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # tertiles are roughly balanced (approx-percentile, synthetic ties)
    assert all(len(v) >= n * 0.1 for v in by_bucket.values())


def test_curation_ppl_gate_drops_gibberish(spark):
    """curate(..., ppl_drop='tail') must drop the shuffled-word doc (worst
    bigram perplexity) and keep fluent docs; without the gate all pass.
    Other gates relaxed so perplexity is the only discriminator."""
    from nightcrawler_ds_pipeline_spark.operators.curation import (
        CurationConfig,
        curate,
    )

    fluent = [
        (i, t)
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog in the field",
                "the dog runs over the field and the fox sleeps under the tree",
                "a fox and a dog play in the field near the old tree today",
                "the tree stands in the field where the fox runs with the dog",
                "the fox and the dog rest under the tree in the green field",
            ]
        )
    ]
    # same stopword-heavy vocabulary (passes the lang marker gate), word
    # order shuffled so every bigram is unseen
    gibberish = (9, "tree the and dog of field the fox over runs the under to")
    corpus = _docs(spark, fluent + [gibberish])

    base = CurationConfig(quality_min=0.0, gopher=False, max_dup_fraction=None)
    kept_all = {r["doc_id"] for r in curate(corpus, base).collect()}
    assert 9 in kept_all and kept_all >= {0, 1, 2, 3, 4}

    gated_cfg = CurationConfig(
        quality_min=0.0, gopher=False, max_dup_fraction=None, ppl_drop="tail"
    )
    kept = {r["doc_id"] for r in curate(corpus, gated_cfg).collect()}
    assert 9 not in kept
    assert len(kept) >= 3  # head+middle survive

    import pytest

    with pytest.raises(ValueError):
        CurationConfig(ppl_drop="everything")


def test_real_models_composite_one_row_per_doc(spark):
    from nightcrawler_ds_pipeline_spark.operators.textstats import (
        text_real_models,
    )

    df = text_real_models(spark, "/root/testdata/sf0.001")
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert df.count() == n_docs
    assert {"doc_id", "n_bpe_real", "lang_pred_ngram"} <= set(df.columns)
    assert df.select("doc_id").distinct().count() == n_docs
