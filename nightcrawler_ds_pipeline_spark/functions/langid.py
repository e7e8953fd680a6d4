"""Character-trigram language identification (Cavnar-Trenkle style).

Replaces the synthetic stopword-marker heuristic (operators/textstats.py
``_LANG_MARKERS`` — kept there for DuckDB oracle parity) with a real
n-gram model: per-language profiles of high-frequency character trigrams
(rank-weighted), scored with a weighted-hit measure — the classic
"N-Gram-Based Text Categorization" approach (Cavnar & Trenkle, 1994).

The profiles below are compiled from public letter/trigram frequency
statistics for eight European languages (function words and inflection
endings dominate: 'the/and/ing' for English, 'der/ein/sch' for German,
'les/que/ent' for French, ...). Each profile lists the language's most
characteristic trigrams, highest weight first; spaces mark word
boundaries (the '_th' vs 'th_' distinction carries most of the signal).

Scoring is an Arrow-batched pandas UDF: one output row per document, the
profile table broadcast once (a few KB). No explode — at 10^10 documents
a trigram explode+join would inflate rows by ~len(text); the per-doc
Counter loop keeps the operator one-pass and shuffle-free.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# top characteristic trigrams per language, most-weighted first ('_' = space)
_PROFILES_RAW: dict[str, list[str]] = {
    "en": ["_th", "the", "he_", "ing", "ng_", "and", "nd_", "_an", "_of",
           "of_", "ed_", "_to", "to_", "_in", "ion", "on_", "is_", "at_",
           "er_", "_be", "es_", "ent", "_it", "tio", "_ha", "_wi", "wit",
           "ith", "th_", "for", "_fo", "hat", "his", "ere", "ter"],
    "de": ["en_", "er_", "_de", "der", "ie_", "die", "nd_", "und", "_un",
           "ein", "ch_", "sch", "ich", "che", "_ei", "in_", "ung", "ng_",
           "das", "_da", "as_", "ten", "ber", "_ge", "gen", "ine", "_ve",
           "ver", "nen", "eit", "it_", "den", "_zu", "zu_", "ert"],
    "fr": ["es_", "_de", "de_", "le_", "_le", "ent", "nt_", "et_", "_et",
           "les", "_la", "la_", "ion", "on_", "re_", "que", "_qu", "ue_",
           "des", "ais", "ur_", "_pa", "par", "our", "ait", "eur", "_co",
           "ans", "_da", "dan", "_un", "un_", "tio", "men", "eme"],
    "it": ["re_", "to_", "_di", "di_", "la_", "_la", "che", "he_", "_ch",
           "no_", "_co", "con", "one", "ne_", "zio", "ion", "ato", "lla",
           "_de", "del", "ell", "per", "_pe", "er_", "ti_", "ere", "_il",
           "il_", "are", "_so", "ont", "ita", "gli", "_un", "una"],
    "es": ["_de", "de_", "os_", "la_", "_la", "el_", "_el", "en_", "_en",
           "es_", "_es", "as_", "ión", "ón_", "ent", "que", "_qu", "ue_",
           "_co", "con", "ció", "ado", "ar_", "_se", "del", "los", "_lo",
           "nte", "ist", "por", "_po", "ara", "una", "_un", "cia"],
    "pt": ["_de", "de_", "os_", "ão_", "ção", "que", "_qu", "ue_", "ent",
           "_co", "com", "om_", "da_", "_da", "do_", "_do", "es_", "ar_",
           "ra_", "ões", "_pa", "par", "uma", "_um", "um_", "não", "_nã",
           "ade", "nte", "ais", "as_", "_se", "se_", "por", "_po"],
    "nl": ["en_", "de_", "_de", "et_", "an_", "_he", "het", "van", "_va",
           "_en", "een", "_ee", "er_", "ijk", "_ge", "nde", "aar", "der",
           "ing", "ng_", "oor", "_vo", "den", "ver", "_ve", "aan", "_aa",
           "ijn", "gen", "_zi", "te_", "_te", "ten", "cht", "sch"],
    "sv": ["en_", "er_", "tt_", "att", "_at", "och", "_oc", "ch_", "det",
           "_de", "et_", "för", "_fö", "ör_", "som", "_so", "om_", "ar_",
           "_ha", "har", "til", "ill", "_ti", "ing", "ng_", "den", "ett",
           "_et", "na_", "ade", "ter", "_me", "med", "ed_", "ska"],
}


def _build_profiles() -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}
    for lang, grams in _PROFILES_RAW.items():
        n = len(grams)
        prof: dict[str, float] = {}
        for i, g in enumerate(grams):
            g = g.replace("_", " ")
            if len(g) != 3:  # defensive: only true trigrams can ever match
                continue
            # rank weight, linearly decaying; first occurrence wins
            prof.setdefault(g, float(n - i) / n)
        out[lang] = prof
    return out


PROFILES = _build_profiles()
LANGS = sorted(PROFILES)
MIN_TRIGRAMS = 6  # below this the signal is noise → 'und' (undetermined)


def detect_language(text: str) -> str:
    """Pure-python twin of the UDF (used by tests and small tools)."""
    return _detect(text, PROFILES)


def _detect(text: str, profiles: dict[str, dict[str, float]]) -> str:
    t = " " + " ".join((text or "").lower().split()) + " "
    if len(t) - 2 < MIN_TRIGRAMS:
        return "und"
    grams = Counter(t[i : i + 3] for i in range(len(t) - 2))
    total = sum(grams.values())
    best_lang, best_score = "und", 0.0
    for lang in LANGS:  # sorted → at a tie the lexicographically first wins
        prof = profiles[lang]
        score = sum(w * grams[g] for g, w in prof.items() if g in grams)
        score /= total
        if score > best_score + 1e-12:
            best_lang, best_score = lang, score
    # require a minimal absolute signal before claiming a language
    return best_lang if best_score >= 0.05 else "und"


def langid_udf(spark):
    """Arrow-batched pandas UDF: text → ISO-639-1-ish code or 'und'."""
    prof_bc = spark.sparkContext.broadcast(PROFILES)

    @F.pandas_udf(T.StringType())
    def lang(texts: pd.Series) -> pd.Series:
        profiles = prof_bc.value
        return texts.fillna("").map(lambda t: _detect(t, profiles))

    return lang
