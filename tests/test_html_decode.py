"""S7 html decode: charset detection path + error containment."""

from nightcrawler_ds_pipeline_spark.functions.html import decode_html_bytes


def test_utf8_roundtrip():
    assert decode_html_bytes("höhe — ü".encode("utf-8")) == "höhe — ü"


def test_windows_1252_detected():
    s = "prix café crème über alles dans le monde données détectées"
    out = decode_html_bytes(s.encode("windows-1252"))
    assert "caf" in out  # decoded, not mojibake'd into replacement chars


def test_none_and_garbage():
    assert decode_html_bytes(None) == ""
    # undecodable garbage must not raise
    out = decode_html_bytes(bytes(range(256)) * 4)
    assert isinstance(out, str)


def test_html_in_pipeline(spark, t1_dir):
    from pyspark.sql import functions as F

    from nightcrawler_ds_pipeline_spark.functions.html import decode_html_udf

    resp = spark.read.parquet(f"{t1_dir}/fetch_responses.parquet")
    out = resp.filter(F.col("http_response_body").isNotNull()).select(
        decode_html_udf(F.col("http_response_body")).alias("html")
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all("product" in r["html"] for r in rows)
