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


def test_registered_queries_have_atomic_schemas(spark):
    """Registry-wide tripwire: the driver's pandas value-hash sorts the
    whole result frame before hashing, and list/dict cells are unhashable
    (robots_parse's r3 red row). Same hazard family as the NULL-union-sort-
    key rule in CLAUDE.md: NO registered query may output a nested type —
    project arrays through array_join / to_json before registering.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    def nested_fields(schema, prefix=""):
        bad = []
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                bad.append(prefix + f.name)
            elif isinstance(f.dataType, StructType):
                bad.append(prefix + f.name)
        return bad

    offenders = {}
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        bad = nested_fields(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"nested-typed driver outputs (unhashable): {offenders}"
