"""CurationConfig behavior on handcrafted discriminating documents: each
gate of the widened curation chain (lang → quality → Gopher → exact dedup →
span-dup → LSH/CC) removes exactly its target doc, and the real-model
switches (trigram langid, real-BPE token floor) change the outcome in the
way only the real models can. The synthetic driver corpus can't
discriminate these (see test_textstats_real.py's Gopher note) — this file
is where the gates are proven honest."""

import pytest
from pyspark.sql import functions as F

from nightcrawler_ds_pipeline_spark.operators.curation import (
    CurationConfig,
    curate,
)

# ≥ 500 chars (quality length term saturates), ≥ 50 words (Gopher), contains
# the markers 'the'/'a'/'fast' and several Gopher stopwords.
GOOD = (
    "the quick brown fox jumps over a lazy dog and runs to the forest "
    "with great speed because it wants to be home before dark and that "
    "is why it hurries along the winding path past the old mill and the "
    "quiet river where children have played for many years during the "
    "long warm summer evenings and the fast wind carries the scent of "
    "pine across the meadow while a farmer walks slowly back to the "
    "village thinking about the harvest that must be gathered soon "
    "before the first frost of the season arrives with the north wind"
)

COMMON = (
    "every morning the baker walks to the old market square with a "
    "basket of fresh bread and the people of the town gather there to "
    "buy what they need for the day while children play near the "
    "fountain and the church bells ring across the rooftops of the "
    "quiet little town in the valley by the river where the fast water "
    "turns the wheel of the mill"
)


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_default_chain_gates_discriminate(spark):
    docs = [
        (0, GOOD),                                          # kept, canonical
        (1, GOOD),                                          # exact dup of 0
        (2, " ".join(["data query table scan"] * 30)),      # lang gate (qd)
        (3, "gamma delta epsilon zeta eta theta"),           # quality gate
        (4, "the a fast slow " + " ".join(["word"] * 40)),   # gopher: 44 words
        (5, COMMON + " unique ending words here"),           # span-dup pair a
        (6, COMMON + " different closing phrase instead"),   # span-dup pair b
    ]
    out = {r["doc_id"]: r.asDict() for r in curate(_df(spark, docs)).collect()}
    assert set(out) == {0}, out
    assert out[0]["is_canonical"] is True
    assert out[0]["dup_fraction"] == 0.0


def test_near_dup_grouping_with_span_gate_disabled(spark):
    """Near-dup docs share >80% of their shingles, so the span-dup gate
    removes them before LSH; with the gate off the LSH/CC leg groups them
    and keeps the min-id doc canonical."""
    near = GOOD.replace("harvest", "apples", 1)
    assert near != GOOD
    docs = [(10, GOOD), (11, near), (12, COMMON)]
    cfg = CurationConfig(max_dup_fraction=None)
    out = {r["doc_id"]: r.asDict() for r in curate(_df(spark, docs), cfg).collect()}
    assert set(out) == {10, 11, 12}
    assert out[10]["group_id"] == out[11]["group_id"] == 10
    assert out[10]["is_canonical"] is True
    assert out[11]["is_canonical"] is False
    assert out[12]["group_id"] == 12 and out[12]["is_canonical"] is True
    # the span-dup signal is reported even when not gating
    assert out[10]["dup_fraction"] > 0.8
    assert out[11]["dup_fraction"] > 0.8


# German paragraph, padded ≥ 500 chars, with two embedded English function
# words so it passes the marker heuristic AND the Gopher stopword rule —
# only the real trigram model can tell it is not English.
GERMAN = (
    "jeden morgen geht der baecker with the korb voller frischem brot "
    "zum alten marktplatz und die menschen der kleinen stadt kommen "
    "dorthin um alles zu kaufen was sie fuer den tag brauchen waehrend "
    "die kinder am brunnen spielen und die glocken der kirche ueber die "
    "daecher der stillen kleinen stadt im tal am fluss klingen wo das "
    "schnelle wasser das rad der alten muehle dreht und der mueller "
    "seine arbeit beginnt bevor die sonne ueber den huegeln aufgeht und "
    "der lange tag mit seiner arbeit fuer alle menschen im dorf anfaengt"
)


def test_real_langid_model_discriminates_where_markers_cannot(spark):
    docs = [(0, GOOD), (1, GERMAN)]
    marker = {r["doc_id"] for r in curate(_df(spark, docs)).collect()}
    assert marker == {0, 1}  # marker heuristic is fooled by 'with the'
    ngram = {
        r["doc_id"]
        for r in curate(
            _df(spark, docs), CurationConfig(lang_model="ngram")
        ).collect()
    }
    assert ngram == {0}  # the trigram model reads the German through it


def test_real_bpe_token_floor(spark):
    # both docs pass lang+quality (marker score 4 → quality ≥ 0.5);
    # gopher off so the BPE floor is the only discriminating gate
    docs = [(0, GOOD), (1, "the a fast slow")]
    cfg = CurationConfig(gopher=False, min_real_tokens=30)
    out = {r["doc_id"] for r in curate(_df(spark, docs), cfg).collect()}
    assert out == {0}
    # floor low enough → both kept
    cfg2 = CurationConfig(gopher=False, min_real_tokens=2)
    out2 = {r["doc_id"] for r in curate(_df(spark, docs), cfg2).collect()}
    assert out2 == {0, 1}


def test_config_validation():
    with pytest.raises(ValueError):
        CurationConfig(lang_model="fasttext")
