"""PII masking: handcrafted discriminating strings (the synthetic corpus
carries little real PII), and Java-regex vs RE2 dialect parity on exactly
those strings — the masked column ships inside the oracled text_normalize
composite, so any dialect divergence would turn a driver row red."""

import duckdb
import pytest

from nightcrawler_ds_pipeline_spark.functions.pii import (
    mask_pii_col,
    mask_pii_sql,
)

CASES = [
    # (raw, expected)
    ("contact me at jane.doe+spam@example.co.uk please",
     "contact me at <EMAIL> please"),
    ("server at 192.168.001.1 and 10.0.0.255 responded",
     "server at <IP> and <IP> responded"),
    ("call +41 (0)79 123 45 67 now", "call <PHONE> now"),
    ("call 079-123-45-67 now", "call <PHONE> now"),
    # too short for the phone rule: years, prices, small numbers
    ("built in 2024 for 1299.00 francs", "built in 2024 for 1299.00 francs"),
    # email whose domain looks like an IP must mask as ONE email
    ("bot@192.168.0.1 pinged", "<EMAIL> pinged"),
    ("no pii here at all", "no pii here at all"),
    ("", ""),
    ("a@b.ch mailed 8.8.8.8 then dialed +41791234567",
     "<EMAIL> mailed <IP> then dialed <PHONE>"),
]


def test_mask_pii_spark_values(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, text string"
    )
    out = {
        r["id"]: r["masked"]
        for r in df.select("id", mask_pii_col("text").alias("masked")).collect()
    }
    for i, (_, expected) in enumerate(CASES):
        assert out[i] == expected, CASES[i]


def test_mask_pii_duckdb_twin_matches():
    con = duckdb.connect()
    for raw, expected in CASES:
        got = con.sql(
            f"SELECT {mask_pii_sql('$raw$' + raw + '$raw$')}"
        ).fetchone()[0]
        assert got == expected, (raw, got)


def test_mask_pii_engines_agree_on_corpus(spark):
    """Dialect parity on real corpus text (the driver-hash guarantee)."""
    sf = "/root/testdata/sf0.001/documents.parquet"
    sdf = spark.read.parquet(sf).select(
        "doc_id", mask_pii_col("text").alias("m")
    )
    got_spark = {r["doc_id"]: r["m"] for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, {mask_pii_sql('text')} AS m FROM '{sf}'"
    ).fetchall()
    assert len(rows) == len(got_spark)
    for doc_id, m in rows:
        assert got_spark[doc_id] == m, doc_id


def test_mask_pii_identity_on_clean_text(spark):
    """Text with digits/punctuation but no PII shapes must pass unchanged
    (prices, years, version strings, short numbers, unicode)."""
    clean = [
        "version 2.4.1 released in 2024",
        "price: 1'299.00 CHF (was 1'499)",
        "room 4b, floor 3 — ünïcode ok",
        "pi is 3.14159 and e is 2.71828",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(clean)], "id long, text string"
    )
    out = {
        r["id"]: r["m"]
        for r in df.select("id", mask_pii_col("text").alias("m")).collect()
    }
    for i, t in enumerate(clean):
        assert out[i] == t, (t, out[i])


def test_mask_pii_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    assert df.select(mask_pii_col("text").alias("m")).collect()[0]["m"] is None
