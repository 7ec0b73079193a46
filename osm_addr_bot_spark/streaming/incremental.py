"""Structured-Streaming form of the incremental scan + rule evaluation.

The reference is a cron-style batch job that hand-rolls streaming
control-plane pieces — watermark, exactly-once commit, deferred retry
(reference state.py:20-96, SURVEY.md §2.9). The batch pipeline
reproduces those via the checkpoint tables; this module additionally
expresses the scan -> parse -> fan-out front of the engine as a real
Structured Streaming query so the same logical plan runs continuously:

  * source: file stream over the documents table (stands in for a Kafka
    / Iceberg-CDC feed of changed-element documents)
  * event time: the element timestamp; late data dropped by watermark
    (the reference's out-of-window drop, overpass.py:218-219 / ST4)
  * stateful aggregation: per event-time window x check counts — the
    monitoring surface a 1000-executor deployment would alert on

The spatial refinement stages stay in the micro-batch foreachBatch
domain at scale (they join static indexed tables); kept out of here to
preserve a pure streaming plan Catalyst can reason about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_addr_bot_spark.checks import fan_out_checks
from osm_addr_bot_spark.operators.parse import parse_elements
from osm_addr_bot_spark.schemas import DOCUMENTS


def stream_documents(spark: SparkSession, path: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-based document stream with the canonical schema."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_issues(documents_stream: DataFrame) -> DataFrame:
    """Streaming parse + full rule fan-out (stateless — same exprs as
    the batch plan; the fan-out is a narrow map so it streams as-is)."""
    elements = parse_elements(documents_stream)
    return fan_out_checks(elements)


def streaming_check_counts(
    documents_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed issue counts per check with late-data drop."""
    issues = streaming_issues(documents_stream).withColumn(
        "event_time", F.to_timestamp(F.from_unixtime(F.col("timestamp")))
    )
    return (
        issues.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "category", "check_id")
        .agg(F.count("*").alias("n_issues"), F.approx_count_distinct("changeset_id").alias("n_changesets"))
    )
