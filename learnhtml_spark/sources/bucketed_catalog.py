"""Catalog-level bucketed tables for shuffle-free co-located joins.

Complements ``sources/tables.py`` (which hash-buckets the *sink* for
checkpoint-resume): here the bucketing is declared to the CATALOG
(``DataFrameWriter.bucketBy(...).sortBy(...).saveAsTable``), so Catalyst
knows both sides of a doc_id join share the same hash partitioning and
plans a SortMergeJoin with ZERO Exchange — the standard big×big join
strategy at 100 TB, where neither side fits a broadcast and a shuffle of
either would move the whole corpus.  ``sortBy`` on the same key also
removes the per-task Sort when the file layout is one file per bucket.

No reference equivalent (the reference is single-node); this is the
Spark-native answer to its "join everything on doc_id in memory" model.
On a production catalog the same declaration is Iceberg's
``bucket(N, doc_id)`` partition transform + storage-partitioned joins.

Caveats encoded in ``write_bucketed``:
- bucket counts must MATCH on both sides (or be integer multiples on
  Spark 3.1+ with bucket coalescing) for the exchange to be elided;
- one output file per bucket per writing task — repartition by the key
  first so each bucket is one file and the sorted property is global;
- ``spark.sql.sources.bucketing.enabled`` must stay true (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "doc_id",
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Save ``df`` as a catalog table bucketed+sorted by ``key``.

    Repartitions on the key first so every bucket lands as one file —
    the layout under which the bucket-scan preserves sortedness and the
    downstream join needs neither Exchange nor (ideally) Sort."""
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str = "doc_id"
) -> DataFrame:
    """Inner-join two same-bucketed catalog tables on ``key``.

    The ``merge`` hint pins the SortMergeJoin strategy — this helper
    models the big×big case where NEITHER side can broadcast (at test
    sizes the planner would otherwise broadcast the small side, which
    disables the bucketed scan and hides the property under test).  The
    returned plan must contain no Exchange on either join input —
    assert via ``assert_no_shuffle_join`` (tests do)."""
    return spark.table(left).hint("merge").join(spark.table(right), key)


def assert_no_shuffle_join(df: DataFrame) -> str:
    """Raise if the physical plan shuffles; returns the plan string."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "co-located join plan contains an Exchange:\n" + plan
        )
    return plan
