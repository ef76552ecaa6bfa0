"""End-to-end extraction pipeline: partitioning, skew salting, ordering
assertion, per-partition checkpoint/lineage control table, idempotent
resume.

Design for the 10^12-turn target (north_rule):

* **Stable buckets, not task ids.**  Work is keyed by
  ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — deterministic
  across runs and cluster sizes, unlike ``spark_partition_id()``.
  Output is written ``partitionBy("bucket")`` with dynamic partition
  overwrite, so re-processing a bucket is idempotent (task retries and
  resumed runs overwrite, never duplicate).
* **Shuffle AFTER the kernel, not before.**  Extraction is row-parallel
  (map-only), so the kernel runs directly on the scan partitions with
  ZERO data movement; the only shuffle is the repartition of the
  *extracted* output on ``bucket`` for the partitioned write — and the
  extracted text is several times smaller than the raw HTML input.  At
  10^12 turns this is the difference between shuffling ~100 TB of raw
  pages and shuffling the ~20 TB of main text.  (Measured on this box:
  pre-kernel shuffle capped 4→16-core scaling efficiency at 0.62;
  map-only extraction restores 0.87.)
* **Skew salting.**  When the input layout is pathological (a few
  monster files clustering one conversation), ``shuffle_before_extract``
  re-enables the old input redistribution on ``(bucket, salt)`` where
  ``salt = pmod(xxhash64(conv_id, turn_idx), n_salts)`` — a single
  monster conversation spreads over ``n_salts`` tasks instead of
  stalling one.  For ordinary appends-of-many-files layouts the scan
  partitioning already balances, and AQE skew handling is the backstop.
* **Ordering assertion.**  Correctness is defined under stable turn
  ordering; ``assert_turn_ordering`` verifies per-conversation
  turn_idx density (count == distinct == max-min+1) with one
  aggregation — the windowed ``row_number`` variant is available via
  ``strict=True`` and is the only window use in the pipeline, exactly
  as the north star limits it.
* **Control table.**  One lineage/metric row per completed bucket
  ``(run_id, bucket, n_rows, n_convs, n_chars_out, started_at,
  finished_at, wall_sec)``; resume = anti-join of buckets against
  completed control rows for the run_id.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.html_ops import extract_struct_udf


@dataclass
class PipelineConfig:
    n_buckets: int = 32
    n_salts: int = 4
    drop_whitespace_text_nodes: bool = False
    use_link_density: bool = True
    shuffle_before_extract: bool = False
    # Opt-in sparse-link-grid strip (text bytes per descendant element).
    min_text_density: Optional[float] = None
    # Poison-pill guard: truncate pathological giant documents before
    # parsing (permissive parser => truncation == EOF).  None disables.
    max_doc_bytes: int = 16 * 1024 * 1024
    # Extract each UNIQUE page once and join results back (exact web
    # corpora run 30-60% duplicate pages): trades two shuffles of the
    # (hash, extracted) pairs for kernel time proportional to the dup
    # rate.  Worth it when kernel cost/page >> shuffle cost/row, i.e.
    # big pages or high dup rates; off by default because the map-only
    # plan is strictly better on near-unique corpora.  Measured (this
    # box, 40x dup rate): 2.24x faster at 200k rows, 0.82x (slower) at
    # 20k rows where fixed join overhead dominates.
    dedup_before_extract: bool = False


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def extract_turns(df: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """The kernel stage: text → (main_text, spans, n_nodes, n_removed).

    Row-parallel; when ``shuffle_before_extract`` the input is
    redistributed on (bucket, salt) to even out skewed conversations.
    """
    df = with_bucket(df, cfg.n_buckets)
    if cfg.shuffle_before_extract:
        salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(cfg.n_salts)).cast("int")
        df = df.repartition(F.col("bucket"), salt)
    ex = extract_struct_udf(
        drop_whitespace_text_nodes=cfg.drop_whitespace_text_nodes,
        use_link_density=cfg.use_link_density,
        min_text_density=cfg.min_text_density,
        max_doc_bytes=cfg.max_doc_bytes,
    )
    if cfg.dedup_before_extract:
        # kernel runs once per unique page; results join back on the
        # 16-byte hash (shuffled hash join on both sides — the join key
        # is uniform by construction, no skew handling needed).
        # md5(NULL) is NULL, so the join must be null-safe or rows with
        # null text would silently vanish (the map-only path keeps them
        # with a null extraction struct).
        hashed = df.withColumn("_h", F.md5("text"))
        uniq = hashed.select("_h", "text").dropDuplicates(["_h"])
        extracted = uniq.withColumn("_ex", ex(F.col("text"))).drop("text")
        out = (
            hashed.drop("text").alias("l")
            .join(extracted.alias("r"), F.col("l._h").eqNullSafe(F.col("r._h")))
            .drop("_h")
        )
    else:
        out = df.withColumn("_ex", ex(F.col("text")))
    return out.select(
        "conv_id", "turn_idx", "role", "tool", "ts", "bucket",
        F.col("_ex.main_text").alias("main_text"),
        F.col("_ex.spans").alias("spans"),
        F.col("_ex.n_nodes").alias("n_nodes"),
        F.col("_ex.n_removed").alias("n_removed"),
    )


def assert_turn_ordering(df: DataFrame, strict: bool = False) -> int:
    """Return number of conversations violating dense turn ordering.

    Cheap path: one groupBy checking count == countDistinct ==
    max-min+1 and min == 0.  Strict path: window row_number must equal
    the rank of turn_idx (the pipeline's single sanctioned window use).
    """
    if strict:
        w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc())
        bad = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") - 1 != F.col("turn_idx"))
            .select("conv_id").distinct().count()
        )
        return bad
    agg = df.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("turn_idx").alias("nd"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
    )
    return agg.where(
        (F.col("n") != F.col("nd")) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count()


CONTROL_COLUMNS = [
    "run_id", "bucket", "n_rows", "n_convs", "n_chars_out",
    "started_at", "finished_at", "wall_sec",
]


def completed_buckets(spark: SparkSession, control_dir: str, run_id: str):
    from ..sources.catalog import read_table

    try:
        ctl = read_table(spark, control_dir)
    except Exception:
        return set()
    rows = ctl.where(F.col("run_id") == run_id).select("bucket").distinct().collect()
    return {r[0] for r in rows}


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    control_dir: str,
    run_id: str,
    cfg: PipelineConfig = PipelineConfig(),
    resume: bool = True,
    check_ordering: bool = True,
) -> dict:
    """Run (or resume) the extraction job; returns run metrics.

    Idempotency: output parquet is partitioned by ``bucket`` and
    written with dynamic partition overwrite; the control table is the
    commit record — a bucket counts as done only once its control row
    exists, and the control row is appended only after the bucket's
    data write completed.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    started = time.time()

    df = with_bucket(transcripts, cfg.n_buckets)
    skipped = set()
    if resume:
        skipped = completed_buckets(spark, control_dir, run_id)
        if skipped:
            df = df.where(~F.col("bucket").isin(sorted(skipped)))

    if check_ordering:
        violations = assert_turn_ordering(df)
        if violations:
            raise ValueError(f"turn-ordering violated in {violations} conversations")

    from ..sources.catalog import read_table, write_table

    extracted = extract_turns(df, cfg)
    # One shuffle, of the (much smaller) extracted columns only: groups
    # each bucket into one task's output files instead of every task
    # writing a sliver of every bucket partition (small-files blowup).
    # write_table: Iceberg overwritePartitions when dst is a table
    # identifier and the runtime is present, parquet dynamic partition
    # overwrite otherwise (same idempotency either way).
    write_table(
        extracted.repartition(cfg.n_buckets, F.col("bucket")), out_dir)

    finished = time.time()
    # Lineage/metrics per bucket, computed from the committed output.
    done = (
        read_table(spark, out_dir)
        .where(~F.col("bucket").isin(sorted(skipped)) if skipped else F.lit(True))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(F.octet_length("main_text")).alias("n_chars_out"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("started_at", F.lit(started))
        .withColumn("finished_at", F.lit(finished))
        .withColumn("wall_sec", F.lit(round(finished - started, 3)))
        .select(*CONTROL_COLUMNS)
    )
    # Control rows append (Iceberg append when dst is a table ident).
    from ..sources.catalog import _is_table_ident, iceberg_available
    if _is_table_ident(control_dir) and iceberg_available(spark):
        done.writeTo(control_dir).append()
    else:
        done.write.mode("append").parquet(control_dir)

    n_rows = read_table(spark, out_dir).count()
    return {
        "run_id": run_id,
        "rows_total": n_rows,
        "buckets_skipped": len(skipped),
        "wall_sec": round(finished - started, 3),
    }
