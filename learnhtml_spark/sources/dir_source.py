"""Directory scan source (reference S1: convert_dragnet_dataset,
conversion.py:20-29): a directory of ``*.html`` files becomes a docs table
``(doc_id, spans)`` with ``doc_id = 'file://' + prefix + filename`` — the
reference's url synthesis — and the page markup as a single html span.

Distributed: `spark.read.format("binaryFile")` splits the listing across
executors; decode happens JVM-side-adjacent (binary → string cast per
row).  Fixture/interop scale; the production source is the span table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_html_dir(
    spark: SparkSession, directory: str, prefix: str = "", encoding: str = "UTF-8"
) -> DataFrame:
    html_dir = os.path.join(directory, "HTML")
    if not os.path.isdir(html_dir):
        html_dir = directory
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .load(html_dir)
    )
    html = F.decode(F.col("content"), encoding)
    doc_id = F.concat(
        F.lit("file://" + prefix), F.element_at(F.split(F.col("path"), "/"), -1)
    )
    span = F.struct(
        F.lit("html").alias("kind"),
        html.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return raw.select(doc_id.alias("doc_id"), F.array(span).alias("spans"))
