"""Real BPE tokenizer + trigram language-ID: pure-python twins are the
oracle (no SQL expressible), pinned behaviors + Spark-vs-twin equality."""

import pytest

from nightcrawler_ds_pipeline_spark.functions.bpe import (
    bpe_encode,
    bpe_token_count,
    train_bpe,
)
from nightcrawler_ds_pipeline_spark.functions.langid import detect_language

SF_DIR = "/root/testdata/sf0.001"


def test_train_bpe_pinned_merge_sequence():
    # Sennrich'16-style toy corpus: most frequent pair merges first,
    # lexicographic tie-break makes the order fully deterministic.
    merges = train_bpe(["low low low lower lowest"], num_merges=6)
    assert merges[0] == ("l", "o")  # 'lo' appears in every word
    assert ("lo", "w</w>") in merges or (" lo", "w</w>") in merges
    # re-training on the same corpus is bit-identical
    assert merges == train_bpe(["low low low lower lowest"], num_merges=6)


def test_bpe_encode_greedy_lowest_rank():
    merges = train_bpe(["aaab aaab aaab"], num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    # fully merged: the trained word collapses to one token
    assert len(bpe_encode("aaab", ranks)) == 1
    # unseen word with partial overlap still terminates and covers the word
    toks = bpe_encode("aabz", ranks)
    assert "".join(toks).replace("</w>", "") == "aabz"


def test_bpe_more_merges_never_more_tokens():
    corpus = ["the cat sat on the mat", "the dog ate the food"]
    text = "the cat ate the mat food"
    small = {p: i for i, p in enumerate(train_bpe(corpus, num_merges=8))}
    big = {p: i for i, p in enumerate(train_bpe(corpus, num_merges=64))}
    assert bpe_token_count(text, big) <= bpe_token_count(text, small)
    # and both are bounded by character count + words (EOW splits)
    assert bpe_token_count(text, big) <= len(text) + text.count(" ") + 1


def test_text_bpe_real_matches_python_twin(spark):
    # registered inside the text_real_models composite since late round 4
    from nightcrawler_ds_pipeline_spark.functions.bpe import train_bpe as tb
    from nightcrawler_ds_pipeline_spark.operators.textstats import text_bpe_real

    out = {
        r["doc_id"]: r["n_bpe_real"]
        for r in text_bpe_real(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = sorted(
        ((r["doc_id"], r["text"]) for r in docs.collect()), key=lambda t: t[0]
    )
    sample = [t for i, t in rows if i < 100]
    ranks = {p: j for j, p in enumerate(tb(sample, num_merges=256))}
    for doc_id, text in rows:
        assert out[doc_id] == bpe_token_count(text or "", ranks), doc_id
    # the real count is never above the chars bound and is positive for
    # non-empty docs
    assert all(v >= 0 for v in out.values())


LANG_SAMPLES = {
    "en": "The quick brown fox jumps over the lazy dog and runs into the forest.",
    "de": "Der schnelle braune Fuchs springt über den faulen Hund in den Wald.",
    "fr": "Le renard brun rapide saute par-dessus le chien paresseux dans le jardin.",
    "it": "La volpe marrone veloce salta sopra il cane pigro nel giardino della casa.",
    "es": "El rápido zorro marrón salta sobre el perro perezoso en el jardín de la casa.",
    "pt": "A rápida raposa marrom salta sobre o cão preguiçoso no jardim da casa não é.",
    "nl": "De snelle bruine vos springt over de luie hond en het kind speelt in de tuin.",
    "sv": "Den snabba bruna räven hoppar över den lata hunden och barnen leker i trädgården.",
}


@pytest.mark.parametrize("lang", sorted(LANG_SAMPLES))
def test_langid_real_sentences(lang):
    assert detect_language(LANG_SAMPLES[lang]) == lang


def test_langid_undetermined():
    assert detect_language("") == "und"
    assert detect_language("zzq xk") == "und"
    assert detect_language(None) == "und"


def test_langid_udf_matches_python_twin(spark):
    # registered inside the text_real_models composite since late round 4
    from nightcrawler_ds_pipeline_spark.operators.textstats import (
        text_lang_id_ngram,
    )

    out = {
        r["doc_id"]: r["lang_pred_ngram"]
        for r in text_lang_id_ngram(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for r in docs.select("doc_id", "text").collect():
        assert out[r["doc_id"]] == detect_language(r["text"] or ""), r["doc_id"]


def test_gopher_rules_semantics(spark):
    """Pin the published Gopher rule set on handcrafted documents: a clean
    English paragraph passes; too-short, bullet-spam, ellipsis-spam,
    symbol-heavy and stopword-free docs each fail their specific rule.
    (On the synthetic driver corpus keep=false everywhere — no document
    carries two distinct Gopher stopwords — which the oracle confirms;
    this test is where the keep logic actually discriminates.)"""
    import pyspark.sql.functions as F

    from nightcrawler_ds_pipeline_spark.operators.textstats import (
        text_gopher_rules,
    )

    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "forest with great speed because it wants to be home before "
            "dark and that is why it hurries along the winding path past "
            "the old mill and the quiet river where children have played "
            "for many years during the long warm summer evenings there")
    docs = [
        (0, good, "en", "t", len(good)),
        (1, "too short to pass and with the right words", "en", "t", 42),
        (2, "\n".join("- " + good[:40] for _ in range(20)), "en", "t", 800),
        (3, "\n".join(good[:40] + "..." for _ in range(20)), "en", "t", 800),
        (4, " ".join("12345 !!!" for _ in range(40)) + " the of", "en", "t", 400),
        (5, " ".join("alpha beta gamma delta epsilon" for _ in range(20)), "en", "t", 600),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r.asDict() for r in text_gopher_rules(spark, d).collect()}

    assert out[0]["keep"] is True                     # clean paragraph
    assert out[1]["keep"] is False                    # < 50 words
    assert out[2]["keep"] is False                    # all lines bulleted
    assert out[2]["frac_bullet_lines"] == 1.0
    assert out[3]["keep"] is False                    # all lines ellipsis
    assert out[3]["frac_ellipsis_lines"] == 1.0
    assert out[4]["keep"] is False                    # symbol/digit heavy
    assert out[4]["frac_alpha_words"] < 0.8
    assert out[5]["keep"] is False                    # no Gopher stopwords
    assert out[5]["stop_hits"] == 0
