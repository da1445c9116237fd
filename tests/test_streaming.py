"""Structured Streaming extraction (streaming/extract_stream.py):
batch/stream parity, incremental file pickup, watermarked windowed counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.schema import TRANSCRIPTS
from pdf_extractor_spark.sources.synth import generate_transcripts
from pdf_extractor_spark.streaming.extract_stream import (
    run_windowed_counts,
    stream_extract,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "input")
    pdf = generate_transcripts(n_convs=30, seed=42)
    spark.createDataFrame(pdf, schema=TRANSCRIPTS).repartition(3).write.parquet(input_dir)
    return {"base": base, "input": input_dir, "n_rows": len(pdf)}


def _key(rows):
    return sorted((r.conv_id, r.turn_idx, r.extracted_text, r.valid) for r in rows)


def test_stream_matches_batch(spark, stream_dirs):
    out = str(stream_dirs["base"] / "out")
    ckpt = str(stream_dirs["base"] / "ckpt")
    stream_extract(spark, stream_dirs["input"], out, ckpt, available_now=True)
    streamed = spark.read.parquet(out)
    assert streamed.count() == stream_dirs["n_rows"]
    batch = extract_turns(
        spark.read.schema(TRANSCRIPTS).parquet(stream_dirs["input"])
    )
    assert _key(streamed.collect()) == _key(batch.collect())


def test_stream_picks_up_only_new_files(spark, stream_dirs):
    out = str(stream_dirs["base"] / "out")
    ckpt = str(stream_dirs["base"] / "ckpt")
    extra = generate_transcripts(n_convs=5, seed=7)
    spark.createDataFrame(extra, schema=TRANSCRIPTS).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dirs["input"])
    stream_extract(spark, stream_dirs["input"], out, ckpt, available_now=True)
    got = spark.read.parquet(out)
    # old rows NOT reprocessed (checkpoint WAL), new rows appended once
    assert got.count() == stream_dirs["n_rows"] + len(extra)


def test_session_window_stream_matches_batch(spark, stream_dirs):
    """Gap-based session_window (5-min gap) aggregation: streaming result
    under availableNow equals the batch session_window over the same data —
    the built-in sessionization beside the custom w6 cumulative-gap form."""
    from pdf_extractor_spark.streaming.extract_stream import read_transcript_stream

    stream = read_transcript_stream(spark, stream_dirs["input"])
    agg_cols = lambda df: (  # noqa: E731
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("sw"), "conv_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("sw.start").alias("s"), F.col("sw.end").alias("e"), "conv_id", "n")
    )
    q = (
        agg_cols(stream)
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(stream_dirs["base"] / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table("sess_counts").collect()}
    batch_df = spark.read.schema(TRANSCRIPTS).parquet(stream_dirs["input"])
    batch = {
        tuple(r)
        for r in (
            batch_df.groupBy(
                F.session_window("ts", "5 minutes").alias("sw"), "conv_id"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.col("sw.start").alias("s"), F.col("sw.end").alias("e"), "conv_id", "n"
            )
            .collect()
        )
    }
    assert streamed == batch


def test_windowed_counts_with_watermark(spark, stream_dirs):
    ckpt = str(stream_dirs["base"] / "ckpt_counts")
    run_windowed_counts(spark, stream_dirs["input"], ckpt, "turn_counts")
    streamed = {
        (r.window_start, r.role): r.n_turns
        for r in spark.table("turn_counts").collect()
    }
    batch = {
        (r.w.start, r.role): r.n
        for r in (
            spark.read.schema(TRANSCRIPTS)
            .parquet(stream_dirs["input"])
            .groupBy(F.window("ts", "1 minute").alias("w"), "role")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    assert streamed == batch
