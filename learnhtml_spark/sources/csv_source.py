"""CSV interchange (reference S4/S5: csv was its universal format).

Test/interop-scale only — the production source/sink is the Iceberg-shaped
bucketed parquet table (sources/tables.py).  Schemas are always explicit
(never inferSchema: a schema probe reads the data twice and types drift)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

#: the reference's `(html, url)` corpus csv (cli/script.py:46)
HTML_CSV_SCHEMA = StructType(
    [
        StructField("html", StringType()),
        StructField("url", StringType()),
    ]
)


def read_html_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(
        path, schema=HTML_CSV_SCHEMA, header=True, multiLine=True, escape='"'
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False):
    """Partitioned csv write; ``single_file`` coalesces (the reference
    stacked worker shards with a shell loop, prepare_data.sh:4-16 — a
    Spark write is already one logical dataset, so this is only for
    humans wanting one file)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')  # RFC-4180 doubled quotes, matches the reader
        .csv(path)
    )
