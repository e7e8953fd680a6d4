from nightcrawler_ds_pipeline_spark.fixtures.generate import (
    gen_images_pdf,
    gen_serp_results_pdf,
    gen_fetch_responses_pdf,
    gen_robots_pdf,
    write_fixture_parquet,
    fixture_dir,
    TIERS,
)

__all__ = [
    "gen_images_pdf",
    "gen_serp_results_pdf",
    "gen_fetch_responses_pdf",
    "gen_robots_pdf",
    "write_fixture_parquet",
    "fixture_dir",
    "TIERS",
]
