"""Registry of driver-checkable queries and their DuckDB oracle SQL.

Every SQL-expressible operator from SURVEY.md §2 gets BOTH a Spark callable
``(spark, sf_dir) -> DataFrame`` and an equivalent DuckDB SQL string over the
same parquet views — identical column aliases so the driver's value-hash
compare matches. Crawl-specific operators that need the engine's own state
tables are registered Spark-only (rows-only check) and covered by pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # import for side effects — each module registers its queries
    from nightcrawler_ds_pipeline_spark.operators import (  # noqa: F401
        aggregates,
        components,
        curation,
        dedup,
        filters,
        joins,
        llm,
        multimodal,
        pipelines,
        scans,
        setops,
        similarity,
        textstats,
        windows,
    )

    return dict(_QUERIES)


def build_oracle_sql() -> dict[str, str]:
    build_queries()
    return dict(_ORACLE)
