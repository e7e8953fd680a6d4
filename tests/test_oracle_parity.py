"""Driver-style oracle parity: every queries() entry with an oracle_sql()
must match DuckDB on row count, column names, and order-insensitive values
(at sf0.001 for speed; the driver runs sf0.01)."""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _load():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLE = _load()
CHECKED = sorted(ORACLE.keys())


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = _duck()
    res = con.sql(ORACLE[name])
    duck_cols = res.columns
    duck_rows = [dict(zip(duck_cols, r)) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:5]
    assert sn == dn, f"{name}: value mismatch at {mism}: " + "; ".join(
        f"spark={sn[i]} duck={dn[i]}" for i in mism
    )


def test_sparkonly_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3


def test_approx_distinct_domains_error_bound(spark):
    """HLL sketch count must land within 5% of the exact count (rsd=0.02)."""
    import __spark_entry__ as e

    from nightcrawler_ds_pipeline_spark.operators.aggregates import (
        agg_distinct_domains,
    )

    qs = e.queries()
    exact = agg_distinct_domains(spark, SF_DIR).collect()[0]["n_domains"]
    approx = qs["agg_approx_distinct_domains"](spark, SF_DIR).collect()[0][
        "n_domains_approx"
    ]
    assert exact > 0
    assert abs(approx - exact) / exact <= 0.05, (approx, exact)
