"""Benchmark decontamination: handcrafted docs with known n-gram overlap.

The synthetic mod-23 split in the registered suite is oracle-checked in
test_oracle_parity; these tests pin the operator's SEMANTICS on documents
built to discriminate: a single shared 8-gram flags a training doc, a
rewording does not, and sub-8-word docs are vacuously clean.
"""

import pyspark.sql.functions as F

from nightcrawler_ds_pipeline_spark.operators.dedup import (
    _NGRAM_N,
    decontaminate_df,
    hashed_shingles_df,
)

# one benchmark question, 12 words → 5 distinct 8-gram shingles
BENCH_TEXT = (
    "what is the capital of the country france answer paris of course"
)
# verbatim leak: the benchmark's first 8 words embedded mid-document
LEAK_TEXT = (
    "quiz night dump follows what is the capital of the country france"
    " and more filler text here"
)
# same topic, no 8-gram in common (reworded)
CLEAN_TEXT = (
    "france has paris as its capital city which everyone surely knows already"
)
SHORT_TEXT = "too few words to shingle"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_ngram_overlap(spark):
    bench = _docs(spark, [(0, BENCH_TEXT)])
    train = _docs(spark, [(1, LEAK_TEXT), (2, CLEAN_TEXT), (3, SHORT_TEXT)])
    out = {r["doc_id"]: r.asDict() for r in decontaminate_df(train, bench).collect()}

    assert out[1]["contaminated"] == 1 and out[1]["n_overlap"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_overlap"] == 0
    # < _NGRAM_N words → no shingles → excluded (vacuously clean)
    assert 3 not in out
    # benchmark docs themselves never appear in the training output
    assert 0 not in out


def test_decontaminate_overlap_counts_distinct_shingles(spark):
    # training doc = benchmark doc verbatim → every shingle overlaps
    bench = _docs(spark, [(0, BENCH_TEXT)])
    train = _docs(spark, [(7, BENCH_TEXT)])
    row = decontaminate_df(train, bench).collect()[0]
    n_bench_shingles = hashed_shingles_df(bench).count()
    assert row["n_shingles"] == n_bench_shingles
    assert row["n_overlap"] == n_bench_shingles
    assert row["contaminated"] == 1


def test_decontaminate_plan_stays_equi_join(spark):
    """No all-pairs: the flagging join must be an equi-join (hash-join
    family), never CartesianProduct/BroadcastNestedLoopJoin, and the
    per-doc rollup a partial+final hash aggregate."""
    bench = _docs(spark, [(0, BENCH_TEXT)])
    train = _docs(spark, [(1, LEAK_TEXT), (2, CLEAN_TEXT)])
    df = decontaminate_df(train, bench)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_curation_decontam_gate_end_to_end(spark):
    """curate(..., bench_docs=...) drops exactly the leaked doc; the same
    corpus without a benchmark keeps it. Quality/Gopher/span gates relaxed
    so the decontamination gate is the only discriminator."""
    from nightcrawler_ds_pipeline_spark.operators.curation import (
        CurationConfig,
        curate,
    )

    cfg = CurationConfig(quality_min=0.0, gopher=False, max_dup_fraction=None)
    corpus = _docs(spark, [(1, LEAK_TEXT), (2, CLEAN_TEXT)])
    bench = _docs(spark, [(0, BENCH_TEXT)])

    no_gate = {r["doc_id"] for r in curate(corpus, cfg).collect()}
    assert no_gate == {1, 2}

    gated = {r["doc_id"] for r in curate(corpus, cfg, bench_docs=bench).collect()}
    assert gated == {2}


def test_ngram_n_is_eight(spark):
    # the decontamination n-gram IS the span-dup n-gram (shared builder);
    # a drift here silently changes both signals
    assert _NGRAM_N == 8
    one_shingle = _docs(spark, [(1, "a b c d e f g h")])
    assert hashed_shingles_df(one_shingle).count() == 1
