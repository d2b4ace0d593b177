"""Skew-safe windowed ranking.

``Window.partitionBy(<low-cardinality key>)`` is a scale-killer: with ~10
distinct sources, one task per source must sort n/10 rows no matter how
many executors exist.  ``sibling_positions`` computes the identical
``row_number() over (partition by group order by key) - 1`` result with
the classic two-phase distributed-rank pattern:

1. range-repartition on (group, key) — every partition holds a contiguous
   slice of each group's order, partition count scales with data;
2. local rank inside each (partition, group) chunk — the window key is
   (spark_partition_id, group), whose cardinality grows with the data, so
   no single task ever sees more than one partition's rows;
3. per-chunk counts (one tiny row per (partition, group)) are cumulated
   into offsets and broadcast-joined back.

Cost: one range exchange + one chunk-local window + a broadcast of a
``num_partitions × groups`` table — no task ever materializes a whole
group.  Output is bit-identical to the naive window because the total
order (group, key) is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sibling_positions(
    docs: DataFrame,
    group: str = "source",
    order: str = "doc_id",
    out: str = "sibling_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """(order-cols..., group, ``out``) where ``out`` is the 0-based rank of
    the row within its group ordered by ``order`` — computed without ever
    windowing over a whole group."""
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = docs.select(order, group).repartitionByRange(
        num_partitions, F.col(group), F.col(order)
    )
    chunked = ranged.withColumn("_pid", F.spark_partition_id())

    # local rank within the (partition, group) chunk — high-cardinality
    # window key, bounded by the range-partition size
    local_w = Window.partitionBy("_pid", group).orderBy(order)
    local = chunked.withColumn("_local", F.row_number().over(local_w) - 1)

    # tiny: one row per (partition, group); cumulative offset per group
    counts = chunked.groupBy("_pid", group).agg(F.count("*").alias("_n"))
    off_w = (
        Window.partitionBy(group)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0))
    ).select("_pid", group, "_off")

    return (
        local.join(F.broadcast(offsets), ["_pid", group])
        .select(
            order,
            group,
            (F.col("_local") + F.col("_off")).cast("int").alias(out),
        )
    )
