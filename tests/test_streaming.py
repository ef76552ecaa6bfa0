"""Structured Streaming: extraction kernel under readStream +
watermarked windowed metrics equal the batch equivalents."""

import pytest
from pyspark.sql import functions as F

from html_parser_spark.sources.transcripts import transcripts_from_documents
from html_parser_spark.streaming.stream import (
    extract_stream, read_transcript_stream, run_available_now, windowed_metrics,
)


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    t = transcripts_from_documents(spark, sf_dir, n_convs=50).drop("doc_id", "expected_main_text")
    # several files so maxFilesPerTrigger exercises multiple micro-batches
    t.repartition(6).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in"), t


def test_stream_extraction_equals_batch(spark, stream_src, tmp_path):
    src_dir, batch_df = stream_src
    stream = read_transcript_stream(spark, src_dir, max_files_per_trigger=2)
    out = extract_stream(stream)
    run_available_now(out, "ex_stream", str(tmp_path / "ck1"))
    got = spark.sql("select * from ex_stream")
    assert got.count() == batch_df.count()
    # per-turn equality vs batch kernel output
    from html_parser_spark.plans.pipeline import PipelineConfig, extract_turns

    batch = extract_turns(batch_df, PipelineConfig(shuffle_before_extract=False))
    j = got.select("conv_id", "turn_idx", F.col("main_text").alias("s_text")).join(
        batch.select("conv_id", "turn_idx", "main_text"), ["conv_id", "turn_idx"]
    )
    assert j.where(F.col("s_text") != F.col("main_text")).count() == 0


def test_windowed_metrics_with_watermark(spark, stream_src, tmp_path):
    src_dir, batch_df = stream_src
    stream = read_transcript_stream(spark, src_dir, max_files_per_trigger=3)
    metrics = windowed_metrics(extract_stream(stream), window="1 hour", watermark="2 hours")
    # complete mode: every window's final state must equal the batch agg
    run_available_now(metrics, "win_stream", str(tmp_path / "ck2"), output_mode="complete")
    got = spark.sql("select win_start, role, n_turns from win_stream")
    expected = (
        batch_df.groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("win_start"), "role", "n_turns")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    assert got.count() > 0


def test_stateful_conversation_rollup(spark, stream_src, tmp_path):
    """applyInPandasWithState: state folds across micro-batches; the
    last emitted snapshot per conversation equals the batch rollup."""
    from html_parser_spark.streaming.stateful import conversation_rollup_stream

    src_dir, batch_df = stream_src
    stream = read_transcript_stream(spark, src_dir, max_files_per_trigger=2)
    rolled = conversation_rollup_stream(stream)
    run_available_now(rolled, "conv_state", str(tmp_path / "ck3"), output_mode="update")
    got = spark.sql(
        """
        select conv_id, n_turns, total_chars, max_turn_idx from (
          select *, row_number() over (partition by conv_id
                                       order by n_turns desc) rn
          from conv_state
        ) where rn = 1
        """
    )
    expected = batch_df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max("turn_idx").alias("max_turn_idx"),
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # several micro-batches ran (maxFilesPerTrigger=2 over 6 files), so
    # intermediate snapshots exist alongside the final ones.
    assert spark.sql("select count(*) from conv_state").collect()[0][0] >= got.count()


def test_stateful_rollup_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Restarting on the same checkpoint continues keyed state (only
    new files processed) — requires the recoverable foreachBatch sink."""
    from html_parser_spark.streaming.stateful import (
        conversation_rollup_stream, run_rollup_to_parquet,
    )

    t = transcripts_from_documents(spark, sf_dir, n_convs=10).drop(
        "doc_id", "expected_main_text")
    src = str(tmp_path / "in")
    t.repartition(5).write.mode("overwrite").parquet(src)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def one_pass():
        stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
        run_rollup_to_parquet(conversation_rollup_stream(stream), out, ck)
        snap = spark.read.parquet(out)
        return (snap.groupBy("conv_id").agg(F.max("n_turns").alias("n"))
                .agg(F.sum("n")).collect()[0][0])

    assert one_pass() == t.count()
    t.limit(37).write.mode("append").parquet(src)
    assert one_pass() == t.count() + 37
