"""Line-level boilerplate removal (CCNet stage 1): handcrafted multi-line
docs with a shared cookie-banner line. The synthetic-corpus behavior is
hash-checked by the driver inside text_normalize; these pin the semantics."""

import duckdb

from nightcrawler_ds_pipeline_spark.operators.dedup import (
    boilerplate_sql,
    remove_boilerplate_lines_df,
)

BANNER = "This Site Uses Cookies to improve your experience"
DOCS = [
    (1, f"{BANNER}\nunique first article body\n\nmore unique text one"),
    (2, f"this site uses cookies   to improve your experience\nsecond article"),
    (3, "a document with no shared lines at all\nsecond unique line"),
    (4, BANNER),  # all-boilerplate doc → ''
]
# doc 2's banner differs by case and inner spacing — case-insensitive trim
# normalization treats outer whitespace but NOT inner runs, so it is NOT
# the same line as doc 1's


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_boilerplate_lines_removed_and_order_kept(spark):
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines_df(_df(spark)).collect()
    }
    assert len(out) == 4
    # banner shared by docs 1 and 4 (exact normalized match) is removed;
    # original line order and blank lines survive
    assert out[1] == "unique first article body\n\nmore unique text one"
    assert out[4] == ""
    # doc 2's inner-spacing variant is NOT an exact normalized match
    assert out[2].startswith("this site uses cookies")
    assert out[3] == DOCS[2][1]


def test_boilerplate_blank_lines_never_count(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines_df(docs).collect()
    }
    # the blank line appears in both docs but is not boilerplate
    assert out[1] == "a\n\nb" and out[2] == "c\n\nd"


def test_curation_boilerplate_pass_end_to_end(spark):
    """remove_boilerplate=True strips the banner BEFORE the gates, so two
    articles that differ only outside the shared banner stop being
    near-duplicates; an all-boilerplate doc is dropped entirely."""
    from nightcrawler_ds_pipeline_spark.operators.curation import (
        CurationConfig,
        curate,
    )

    body1 = "the quick brown fox jumps over the lazy dog in the field"
    body2 = "a completely different second article about the old tree there"
    corpus = spark.createDataFrame(
        [
            (1, f"{BANNER}\n{body1}"),
            (2, f"{BANNER}\n{body2}"),
            (3, BANNER),  # nothing but the banner → dropped
        ],
        "doc_id long, text string",
    )
    cfg = CurationConfig(
        quality_min=0.0, gopher=False, max_dup_fraction=None,
        remove_boilerplate=True,
    )
    rows = {r["doc_id"]: r.asDict() for r in curate(corpus, cfg).collect()}
    assert set(rows) == {1, 2}
    # with the banner gone the two docs share no shingles → own groups
    assert rows[1]["group_id"] != rows[2]["group_id"]


def test_boilerplate_identity_on_unique_corpus(spark):
    """With no line repeated across docs, the rebuild must be byte-exact —
    including blank lines, tabs, trailing newlines and unicode."""
    import random

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "δelta", "ε", "zeta\tmark", "100.5"]
    docs = []
    for i in range(30):
        lines = [
            f"doc{i} " + " ".join(rng.choices(words, k=rng.randint(1, 6)))
            for _ in range(rng.randint(1, 5))
        ]
        if rng.random() < 0.3:
            lines.insert(rng.randrange(len(lines) + 1), "")
        text = "\n".join(lines) + ("\n" if rng.random() < 0.3 else "")
        docs.append((i, text))
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines_df(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        assert out[i] == text, (i, repr(text), repr(out[i]))


def test_boilerplate_plan_stays_equi_join(spark):
    """Reassembly must stay key-partitioned: equi-joins only, partial+final
    hash aggregates, no Python UDF anywhere in the plan."""
    df = remove_boilerplate_lines_df(_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boilerplate_duckdb_twin_matches(spark):
    sdf = remove_boilerplate_lines_df(_df(spark))
    got_spark = {r["doc_id"]: r["text_clean"] for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    rows = con.sql(
        f"WITH {boilerplate_sql('docs')} SELECT doc_id, text_clean FROM bp_clean"
    ).fetchall()
    assert dict(rows) == got_spark
