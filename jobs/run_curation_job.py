#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation chain (lang → quality
→ Gopher → exact dedup → span-dup gate → optional eval-set
decontamination → MinHash-LSH → connected components → labeled corpus).

Local sandbox:
    spark-submit --master 'local[32]' \
        --py-files <(cd /root/repo && zip -r - nightcrawler_ds_pipeline_spark) \
        jobs/run_curation_job.py --input /root/testdata/sf0.1 \
        --output /tmp/curated --bench-input /path/to/eval_docs

Cluster: same invocation with --master spark://... / yarn / k8s. Input is
a directory containing documents.parquet (doc_id, text, ...); --bench-input
points at a parquet of benchmark/eval documents with the same two columns —
when given, training docs sharing any word-8-gram with the benchmark are
dropped (dedup.decontaminate_df). Output is one parquet of kept docs with
(doc_id, quality, dup_fraction, group_id, is_canonical).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="nightcrawler-ds-pipeline-spark curation")
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet (doc_id, text)")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--bench-input", default=None,
                    help="parquet path/dir of benchmark docs (doc_id, text); "
                         "enables the decontamination gate")
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--max-dup-fraction", type=float, default=0.8,
                    help="span-dup gate threshold; pass a value > 1 to "
                         "effectively disable")
    ap.add_argument("--lang-model", choices=("marker", "ngram"),
                    default="marker",
                    help="'ngram' swaps in the real trigram language-ID")
    ap.add_argument("--min-real-tokens", type=int, default=None,
                    help="when set, train real BPE on a bounded sample and "
                         "require at least this many tokens per doc")
    ap.add_argument("--ppl-drop", choices=("tail", "middle_tail"),
                    default=None,
                    help="CCNet perplexity gate: drop the worst tertile(s) "
                         "by bounded-sample bigram-LM perplexity")
    ap.add_argument("--remove-boilerplate", action="store_true",
                    help="CCNet stage-1 line-level boilerplate removal "
                         "before any gate")
    args = ap.parse_args()

    from nightcrawler_ds_pipeline_spark.operators.curation import (
        CurationConfig,
        curate,
    )
    from nightcrawler_ds_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ncds-curation-job")
    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))
    bench = (
        spark.read.parquet(args.bench_input) if args.bench_input else None
    )
    cfg = CurationConfig(
        quality_min=args.quality_min,
        gopher=not args.no_gopher,
        max_dup_fraction=args.max_dup_fraction,
        lang_model=args.lang_model,
        min_real_tokens=args.min_real_tokens,
        ppl_drop=args.ppl_drop,
        remove_boilerplate=args.remove_boilerplate,
    )
    kept = curate(docs, cfg, bench_docs=bench)
    kept.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    print(json.dumps({
        "kept": out.count(),
        "groups": out.select("group_id").distinct().count(),
        "canonical": out.filter("is_canonical").count(),
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
