"""spark-submit entry point for end-to-end training-corpus prep.

Composes the operator families this repo adds on top of extraction
(the reference engine stops at per-document extraction; everything
downstream here is the distributed corpus work)::

    spark-submit --master <cluster> \
        --py-files dist/html_parser_spark.zip \
        jobs/corpus_prep_job.py \
        --input  <transcripts parquet path> \
        --output <prepped corpus dir> \
        [--quality 0.6] [--langs en] [--min-tokens 20] \
        [--budget 2048] [--pack-buckets 64] \
        [--train 0.9 --val 0.05 --test 0.05]

Stages (all deterministic — two runs over the same input byte-match):

1. extract  — map-only kernel pass over turns (plans/pipeline.py's
   extract_turns; zero pre-kernel shuffle);
2. curate   — exact-dup / too-short / low-quality / wrong-lang with
   ordered drop reasons (operators/curate.py);
3. scrub    — PII redaction + per-doc counts (operators/pii.py,
   map-only);
4. split    — deterministic hash holdout (operators/corpusprep.py;
   a document's split never changes as the corpus grows);
5. pack     — concatenate-and-chop token packing plan per split
   (seq_id/start_offset/crosses_cut for the loader).

Output: ``<output>/docs`` parquet partitioned by ``split`` with
``(doc_id, conv_id, turn_idx, role, text, quality, lang_used,
n_pii, split, bucket, n_tokens, start_offset, seq_id, crosses_cut)``,
and ``<output>/stats`` with the per-reason curation accounting the
mixture designer reads.  The job is a pure function of its input:
re-running OVERWRITES both tables (use extract_job.py's control-table
pattern when incremental resume matters — this job's value is the
composition, and every stage is deterministic, so a rerun is always
safe).

A JSON line with headline counts is printed on success (the same
contract bench.py uses).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    ap = argparse.ArgumentParser(description="training-corpus prep over transcripts")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality", type=float, default=0.6)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allow-list for lang-id")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--budget", type=int, default=2048,
                    help="tokens per packed training sequence")
    ap.add_argument("--pack-buckets", type=int, default=64,
                    help="independent packing streams per split")
    ap.add_argument("--train", type=float, default=0.90)
    ap.add_argument("--val", type=float, default=0.05)
    ap.add_argument("--test", type=float, default=0.05)
    return ap.parse_args(argv)


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from html_parser_spark.operators.corpusprep import (
        pack_sequences, split_assign,
    )
    from html_parser_spark.operators.curate import curate_corpus, curation_stats
    from html_parser_spark.operators.pii import pii_scrub
    from html_parser_spark.plans.pipeline import PipelineConfig, extract_turns
    from html_parser_spark.sources.catalog import read_transcripts

    t = read_transcripts(spark, args.input)

    # 1. extract (map-only; doc identity = conv:turn)
    ex = extract_turns(t, PipelineConfig())
    docs = ex.select(
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
        .alias("doc_id"),
        "conv_id", "turn_idx", "role",
        F.col("main_text").alias("text"),
    ).where(F.col("text").isNotNull())

    # 2. curate (quality/lang/dup/short with ordered reasons)
    curated = curate_corpus(
        docs, quality_threshold=args.quality,
        langs=tuple(s for s in args.langs.split(",") if s),
        min_tokens=args.min_tokens)
    stats = curation_stats(curated)
    kept = curated.where(F.col("drop_reason").isNull())

    # 3. PII scrub — redacted text replaces the raw extraction
    scrubbed = (
        kept.drop("text")
        .join(pii_scrub(kept), "doc_id")
        .withColumnRenamed("redacted", "text"))

    # 4. deterministic holdout
    split = split_assign(
        scrubbed,
        splits=(("train", args.train), ("val", args.val),
                ("test", args.test)))

    # 5. packing plan PER SPLIT — a training sequence must never mix
    # train and holdout documents, so each split gets its own streams
    plans = None
    for name in ("train", "val", "test"):
        one = pack_sequences(
            split.where(F.col("split") == name).select("doc_id", "text"),
            budget=args.budget, n_buckets=args.pack_buckets)
        plans = one if plans is None else plans.unionByName(one)
    out = split.join(plans, "doc_id")

    (out.select(
        "doc_id", "conv_id", "turn_idx", "role", "text", "quality",
        "lang_used", "n_pii", "split", "bucket", "n_tokens",
        "start_offset", "seq_id", "crosses_cut")
     .write.mode("overwrite").partitionBy("split")
     .parquet(args.output + "/docs"))
    stats.write.mode("overwrite").parquet(args.output + "/stats")

    done = spark.read.parquet(args.output + "/docs")
    n_kept = done.count()
    n_in = docs.count()
    return {
        "metric": "corpus_prep",
        "rows_in": n_in,
        "rows_kept": n_kept,
        "splits": {r["split"]: r["n"] for r in
                   done.groupBy("split").agg(F.count("*").alias("n"))
                   .collect()},
    }


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("corpus-prep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions",
                   spark.sparkContext.defaultParallelism)
    print(json.dumps(run(spark, args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
