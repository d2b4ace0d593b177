"""Structured Streaming wrapper around the extraction pipeline.

The reference is pure batch (SURVEY.md §2.10) and the north rule's resume
story is covered by the lineage table (sources/tables.py); this wrapper is
the incremental-ingest refinement: new document files landing in a
directory are extracted exactly-once via Spark's streaming checkpoint +
``Trigger.AvailableNow`` (drain-everything-then-stop semantics, the batch
-friendly trigger), with the same fused mapInPandas stage as the batch
path — the operator is trigger-agnostic because it is stateless per row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from learnhtml_spark.schemas import DOCS


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    model_bytes: bytes,
    available_now: bool = True,
):
    """readStream(parquet docs) -> extraction -> writeStream(parquet spans).

    Returns the StreamingQuery; with ``available_now`` the query drains all
    currently-available files and stops (call ``awaitTermination()``).
    Restart with the same checkpoint directory to pick up only new files.
    """
    from learnhtml_spark.operators.extract import extract_content_spans

    docs = (
        spark.readStream.schema(DOCS)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    spans = extract_content_spans(docs, model_bytes)
    writer = (
        spans.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
