"""Pipeline flows registered as driver queries (Spark-only: they consume
the engine's own fixture tables, which the DuckDB oracle doesn't have)."""

from __future__ import annotations

from nightcrawler_ds_pipeline_spark.registry import register


def _fixtures(spark):
    from nightcrawler_ds_pipeline_spark.fixtures import write_fixture_parquet

    fx = write_fixture_parquet("t1")
    return (
        spark.read.parquet(f"{fx}/serp_results.parquet"),
        spark.read.parquet(f"{fx}/fetch_responses.parquet"),
    )


@register("pipeline_fullrun_text")  # rows-only; parity vs oracle in pytest
def pipeline_fullrun_text(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.stages import (
        PipelineConfig,
        run_text_pipeline,
    )

    serp, responses = _fixtures(spark)
    return run_text_pipeline(serp, responses, PipelineConfig()).orderBy("uid")


@register("pipeline_fullrun_image")
def pipeline_fullrun_image(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.stages import (
        PipelineConfig,
        run_image_pipeline,
    )

    serp, responses = _fixtures(spark)
    return run_image_pipeline(serp, responses, PipelineConfig(country="XX")).orderBy("uid")


@register("pipeline_enrichment")
def pipeline_enrichment(spark, sf_dir):
    from nightcrawler_ds_pipeline_spark.pipeline.enrichment import run_enrichment

    serp, _ = _fixtures(spark)
    return run_enrichment(spark, serp)
