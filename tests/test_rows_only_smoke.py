"""Every rows-only registered query must run end-to-end at sf0.001: the
driver's weaker rows-only check still requires a working query + stable
schema, and a registration/refactor breakage here would otherwise surface
only in the round snapshot."""

import pytest


def _load():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    return qs, sorted(set(qs) - set(osql))


QUERIES, ROWS_ONLY = _load()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns, name
    assert rows is not None  # ≥0 rows with a stable schema is the contract
