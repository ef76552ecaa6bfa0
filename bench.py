#!/usr/bin/env python3
"""Benchmark harness.

Default mode: runs the headline operator suite on
``local[$SPARK_GRAFT_CPUS]`` (default 32) over
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE
JSON line::

    {"metric": "extract_turns_per_sec", "value": <headline wall sec>,
     "unit": "sec", "queries": {...per-query sec...}, "sf": ...,
     "turns_per_sec": ..., "scaling": {...}}

Scaling evidence (BASELINE.json north rule, no real cluster in this
sandbox): the same extraction job runs in subprocesses at two
parallelism levels (local[8] vs local[32]) on identical input;
efficiency = (T8_wall / T32_wall) / (32/8).  Skip with
SPARK_GRAFT_BENCH_SCALING=0.

Child mode (internal): ``bench.py --scaling-child <cores>`` runs only
the extraction throughput measurement and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "2"))
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
SCALE_LOW = int(os.environ.get("SPARK_GRAFT_BENCH_LOW", "8"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def extraction_throughput(spark, sf_dir: str, replicate: int):
    """Turns/sec of the full extraction pipeline stage (no disk sink:
    count + checksum forces full computation)."""
    from pyspark.sql import functions as F

    from html_parser_spark.plans.pipeline import PipelineConfig, extract_turns
    from html_parser_spark.sources.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir, n_convs=500, replicate=replicate)
    t = t.drop("doc_id", "expected_main_text")
    n_turns = t.count()
    cfg = PipelineConfig(n_buckets=max(spark.sparkContext.defaultParallelism, 8),
                         n_salts=4)
    t0 = time.time()
    out = extract_turns(t, cfg)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("main_text")).alias("chars"),
        F.sum("n_nodes").alias("nodes"),
    ).collect()[0]
    wall = time.time() - t0
    assert agg["n"] == n_turns
    return {
        "turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "mb_in": round(agg["chars"] / 1e6, 1),
        "nodes": int(agg["nodes"]),
    }


def run_headline_queries(spark, sf_dir: str):
    """Per-query wall times for the operator suite (forces execution
    via count/collect)."""
    import __spark_entry__ as entrymod

    picks = [
        "extract_main_text", "html_count_li", "html_node_count",
        "tpch_pricing_summary", "join_region_revenue", "events_hourly",
        "minhash_signatures", "simhash", "dedup_exact_stats",
        "text_quality", "fingerprint", "ann_cosine_topk",
        "lsh_candidate_pairs", "window_top_order",
    ]
    qs = entrymod.queries()
    times = {}
    for name in picks:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def child_main(cores: int) -> None:
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    res = extraction_throughput(spark, SF_DIR, REPLICATE)
    spark.stop()
    print(json.dumps({"cores": cores, **res}))


def run_scaling() -> dict:
    out = {}
    for cores in (SCALE_LOW, CPUS):
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_SCALING"] = "0"
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cores)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
        out[f"local[{cores}]"] = json.loads(line)
    lo = out[f"local[{SCALE_LOW}]"]
    hi = out[f"local[{CPUS}]"]
    speedup = lo["wall_sec"] / hi["wall_sec"]
    out["speedup"] = round(speedup, 3)
    out["core_ratio"] = CPUS / SCALE_LOW
    out["efficiency"] = round(speedup / (CPUS / SCALE_LOW), 3)
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaling-child":
        child_main(int(sys.argv[2]))
        return

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    t_suite0 = time.time()
    ex = extraction_throughput(spark, SF_DIR, REPLICATE)
    qtimes = run_headline_queries(spark, SF_DIR)
    suite_wall = round(time.time() - t_suite0, 3)
    spark.stop()

    scaling = run_scaling() if SCALING else None

    result = {
        "metric": "extract_turns_per_sec",
        "value": ex["turns_per_sec"],
        "unit": "turns/sec",
        "queries": {"extract_pipeline": ex["wall_sec"], **qtimes},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "suite_wall_sec": suite_wall,
        "extract": ex,
        "cores": CPUS,
    }
    if scaling is not None:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
