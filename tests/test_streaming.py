"""Structured Streaming front: streamed fan-out equals the batch plan;
windowed counts respect the watermark."""

from pyspark.sql import functions as F

from osm_addr_bot_spark.checks import fan_out_checks
from osm_addr_bot_spark.operators.parse import parse_elements
from osm_addr_bot_spark.streaming import stream_documents, streaming_check_counts, streaming_issues


def _stream_dir(synth_dir, tmp_path):
    """FileStreamSource needs a flat directory of data files; link the doc
    parquet in (single-file or part-file-directory layout)."""
    import os
    from pathlib import Path

    d = tmp_path / "docs_stream"
    d.mkdir()
    src = Path(f"{synth_dir}/documents.parquet")
    parts = sorted(src.glob("*.parquet")) if src.is_dir() else [src]
    for i, p in enumerate(parts):
        os.symlink(p, d / f"part-{i}.parquet")
    return str(d)


def test_streaming_issues_match_batch(spark, synth_dir, tmp_path):
    src = f"{synth_dir}/documents.parquet"
    stream = stream_documents(spark, _stream_dir(synth_dir, tmp_path), max_files_per_trigger=1)
    q = (
        streaming_issues(stream)
        .select("category", "check_id", "uid")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_issues")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT category, check_id, uid FROM stream_issues").collect()

    batch = fan_out_checks(parse_elements(spark.read.parquet(src))).select(
        "category", "check_id", "uid"
    ).collect()
    key = lambda r: (r["category"], r["check_id"], r["uid"])
    assert sorted(map(key, got)) == sorted(map(key, batch))


def test_streaming_windowed_counts(spark, synth_dir, tmp_path):
    src = f"{synth_dir}/documents.parquet"
    stream = stream_documents(spark, _stream_dir(synth_dir, tmp_path))
    q = (
        streaming_check_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_counts")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM stream_counts").collect()
    assert rows and all(r["n_issues"] > 0 for r in rows)
    # totals agree with the stateless stream aggregated in batch
    total_stream = sum(r["n_issues"] for r in rows)
    batch_total = fan_out_checks(parse_elements(spark.read.parquet(src))).count()
    assert total_stream == batch_total
