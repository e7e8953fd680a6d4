"""Curation scaling workload (operators/curation_scaling.py): the
synthetic corpus is deterministic and its planted duplicate structure
survives the DEFAULT curation config — exact copies removed by exact
dedup, permuted near-dups pass the span-dup gate (shared-shingle fraction
≈ 2/9) and land in one LSH+CC group (word-set Jaccard ≈ 0.8)."""

import pyspark.sql.functions as F


def test_synth_documents_deterministic(spark):
    from nightcrawler_ds_pipeline_spark.operators.curation_scaling import (
        synth_documents,
    )

    a = synth_documents(spark, 200).orderBy("doc_id").collect()
    b = synth_documents(spark, 200).orderBy("doc_id").collect()
    assert [r["text"] for r in a] == [r["text"] for r in b]
    texts = {r["doc_id"]: r["text"] for r in a}
    # exact slots are byte-identical to slot 0; near slots differ but
    # share ~8/9 of the word sequence
    assert texts[45] == texts[0] and texts[46] == texts[0]
    for s in (47, 48, 49):
        assert texts[s] != texts[0]
        w0, ws = texts[0].split(), texts[s].split()
        assert len(w0) == len(ws)
        same = sum(x == y for x, y in zip(w0, ws))
        assert same / len(w0) > 0.8


def test_planted_clusters_survive_default_config(spark):
    from nightcrawler_ds_pipeline_spark.operators.curation import (
        DEFAULT_CURATION,
        curate,
    )
    from nightcrawler_ds_pipeline_spark.operators.curation_scaling import (
        GROUP,
        synth_documents,
    )

    n = 2000  # 40 planted groups
    out = curate(synth_documents(spark, n), DEFAULT_CURATION).toPandas()
    by_id = out.set_index("doc_id")
    # exact copies (slots 45, 46) are deduped away; one representative kept
    assert len(out) == n - 2 * (n // GROUP)
    for g in (0, 7, 23, 39):
        base = g * GROUP
        assert base + 45 not in by_id.index
        assert base + 46 not in by_id.index
        # the planted near-dup cluster {0, 47, 48, 49} shares a component
        gids = {by_id.loc[base + s, "group_id"] for s in (0, 47, 48, 49)}
        assert len(gids) == 1, gids
        # exactly one canonical representative in the planted cluster
        assert (
            sum(bool(by_id.loc[base + s, "is_canonical"]) for s in (0, 47, 48, 49))
            <= 1  # canonical may sit elsewhere if a hot bucket widened it
        )
        # near-dups pass the span-dup gate with room to spare
        assert by_id.loc[base + 47, "dup_fraction"] < 0.5
