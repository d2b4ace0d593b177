"""Temporal join operators Spark's DataFrame API lacks natively —
as-of join and bounded range self-join — built as compositions of
existing operators (union+window, bucketed equi-join) per the
custom-operator ladder (composition first, Pandas UDF only if
semantics force it; here they don't).

Scale notes (100 TB):
- ``asof_join`` is the union-tag trick: union the probe and dimension
  streams, one window partitioned on the join key (HIGH-cardinality —
  user_id here; never a low-cardinality key) ordered by (ts, side),
  and ``last(payload, ignorenulls)`` carries the latest dimension row
  forward onto each probe row.  ONE shuffle total (the window),
  regardless of payload column count — strictly cheaper than the
  naive inequality join (O(probe × dim) per key) and the same shape
  Flink's temporal table join lowers to.
- ``range_neighbor_count`` buckets time into ``radius``-wide cells and
  replicates ONE side into its 3 adjacent cells, turning the
  inequality join into an equi-join on (key, cell) that AQE/SMJ can
  shuffle on a high-cardinality composite key.  Each qualifying pair
  is counted exactly once: |Δts| <= radius forces cell distance <= 1,
  and only the replica landing in the probe's own cell matches.
  Replication factor is a constant 3; per-cell group size is bounded
  by the per-key event rate within one radius — no quadratic blowup
  unless the data itself is quadratic in a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str,
    payload_cols: list,
) -> DataFrame:
    """As-of join: each probe row gets the payload of the LATEST dim row
    with the same ``key`` and dim.ts <= probe.ts (inclusive — DuckDB
    ``ASOF JOIN``'s default ``>=`` semantics, which the oracle uses
    verbatim).  Probe rows with no prior dim row are DROPPED (inner
    as-of).  Output: all probe columns + ``payload_cols`` (from dim) +
    ``_dim_ts`` (the matched dim row's timestamp).

    Payload column names must not collide with probe column names."""
    clash = set(payload_cols) & set(probe.columns)
    if clash:
        raise ValueError(f"payload columns collide with probe columns: {clash}")
    p = probe.withColumn("_is_probe", F.lit(1)).withColumn(
        "_dim_ts_src", F.lit(None).cast(dim.schema[ts].dataType)
    )
    for c in payload_cols:
        p = p.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
    d = dim.select(
        key,
        ts,
        F.lit(0).alias("_is_probe"),
        F.col(ts).alias("_dim_ts_src"),
        *payload_cols,
    )
    for c in probe.columns:
        if c not in (key, ts):
            d = d.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))
    u = p.select(*p.columns).unionByName(d.select(*p.columns))
    # dim sorts BEFORE probe at equal ts (_is_probe 0 < 1) => inclusive
    # (probe.ts >= dim.ts) matching; among equal-ts dim rows the later
    # window frame row wins, i.e. last() — ties broken by the ordering
    # below being stable within the frame scan
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *u.columns,
        F.last("_dim_ts_src", ignorenulls=True).over(w).alias("_dim_ts"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_fill_{c}")
            for c in payload_cols
        ],
    )
    res = (
        filled.filter((F.col("_is_probe") == 1) & F.col("_dim_ts").isNotNull())
        .select(
            *[c for c in probe.columns],
            "_dim_ts",
            *[F.col(f"_fill_{c}").alias(c) for c in payload_cols],
        )
    )
    return res


def range_neighbor_count(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    radius_s: int = 300,
) -> DataFrame:
    """(id, n_neighbors): for every event, how many OTHER events share
    its ``key`` within ±``radius_s`` seconds — the bounded range
    self-join (burst/velocity detection, co-occurrence windows).

    Bucketed equi-join plan: cell = µs-timestamp div radius; the right
    side is replicated into cells {c-1, c, c+1}; join on (key, cell)
    then filter the exact |Δ| bound.  Zero-neighbor events are restored
    by a left join (absence is the common, reportable case)."""
    rad_us = int(radius_s) * 1_000_000
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    base = events.select(
        F.col(key).alias("k"), F.col(id_col).alias("id"), us.alias("us")
    )
    left = base.withColumn("cell", F.expr(f"us div {rad_us}"))
    right = base.select(
        F.col("k"),
        F.col("id").alias("rid"),
        F.col("us").alias("rus"),
        F.explode(
            F.array(
                F.expr(f"us div {rad_us} - 1"),
                F.expr(f"us div {rad_us}"),
                F.expr(f"us div {rad_us} + 1"),
            )
        ).alias("cell"),
    )
    pairs = left.join(right, ["k", "cell"]).filter(
        (F.col("id") != F.col("rid"))
        & (F.abs(F.col("us") - F.col("rus")) <= F.lit(rad_us))
    )
    counts = pairs.groupBy("id").agg(F.count("*").alias("n_neighbors"))
    return (
        base.select("id")
        .join(counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_neighbors"), F.lit(0))
            .cast("long")
            .alias("n_neighbors"),
        )
    )
