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
