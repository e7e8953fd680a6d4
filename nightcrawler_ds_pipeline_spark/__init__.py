"""nightcrawler_ds_pipeline_spark — a from-scratch PySpark-native crawl engine.

Re-expresses the observable semantics of the reference
``crficbm-ui/nightcrawler-ds-pipeline`` (an 11-stage row-at-a-time Python CLI,
see SURVEY.md) as an idiomatic Spark batch crawl loop:

- URL frontier + fetch scheduler over snapshot (Iceberg-style) tables
- partitioned Bloom-filter URL-seen set keyed by ``xxhash64(canonical_url)``
  (exact membership always confirmed by a left-anti join — the Bloom filter is
  a shuffle reducer, never the decider)
- per-host politeness token buckets expressed as a salted groupBy-host
  priority dequeue
- vectorized pandas/Arrow UDFs for image decode + perceptual-hash dedup
- per-partition lineage rows for exact checkpoint resume

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
