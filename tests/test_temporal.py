"""Temporal join operators: as-of join (union-tag window), range-frame
neighbor counts, and the two-table bucketed range join.  Semantics
oracles here are
hand-computed tiny frames; the driver-level oracle is DuckDB's native
ASOF JOIN / plain inequality join (__spark_entry__.oracle_sql)."""

import datetime as dt

import pytest

from learnhtml_spark.functions.temporal import (
    asof_join,
    range_join_pairs,
    range_neighbor_count,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05"), "click"),
            (2, 10, _ts("2024-01-01 00:00:20"), "view"),
            (3, 10, _ts("2024-01-01 00:00:30"), "click"),  # == dim ts (tie)
            (4, 20, _ts("2024-01-01 00:00:01"), "view"),   # before any dim
            (5, 30, _ts("2024-01-01 00:05:00"), "click"),  # user w/o dim
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    dim = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:10"), 1.0),
            (10, _ts("2024-01-01 00:00:30"), 2.0),
            (20, _ts("2024-01-01 00:00:02"), 9.0),
        ],
        "user_id long, ts timestamp, pval double",
    )
    return probe, dim


def test_asof_semantics(tiny):
    probe, dim = tiny
    out = asof_join(probe, dim, key="user_id", ts="ts", payload_cols=["pval"])
    got = {r["event_id"]: (r["pval"], r["_dim_ts"]) for r in out.collect()}
    # event 1 precedes every dim row -> dropped (inner as-of)
    # event 4's user has a dim row only AFTER it -> dropped
    # event 5's user has no dim rows at all -> dropped
    assert set(got) == {2, 3}
    assert got[2] == (1.0, _ts("2024-01-01 00:00:10"))
    # tie at equal ts is INCLUSIVE (probe.ts >= dim.ts), matching DuckDB
    assert got[3] == (2.0, _ts("2024-01-01 00:00:30"))


def test_asof_row_atomic_null_payload(spark):
    """The matched dim row's NULL payload value must come through as
    NULL — not be stitched from an older dim row — and every output
    column must come from the SAME matched row (multi-payload check)."""
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:01:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:10"), 1.0, "old"),
            (10, _ts("2024-01-01 00:00:30"), None, "new"),
        ],
        "user_id long, ts timestamp, pval double, tag string",
    )
    out = asof_join(
        probe, dim, key="user_id", ts="ts", payload_cols=["pval", "tag"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # row-atomic: both payload columns from the 00:00:30 row
    assert r["_dim_ts"] == _ts("2024-01-01 00:00:30")
    assert r["pval"] is None and r["tag"] == "new"


def test_asof_equal_ts_dim_ties_deterministic(spark):
    """Dim rows tied on (key, ts) must resolve to ONE deterministic
    winner (value-hash tie-break), stable across repeated runs."""
    probe = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:01:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:30"), "a"),
            (10, _ts("2024-01-01 00:00:30"), "b"),
            (10, _ts("2024-01-01 00:00:30"), "c"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    seen = set()
    for _ in range(3):
        rows = asof_join(
            probe.repartition(4), dim.repartition(3),
            key="user_id", ts="ts", payload_cols=["tag"],
        ).collect()
        assert len(rows) == 1
        seen.add(rows[0]["tag"])
    assert len(seen) == 1


def test_asof_payload_collision_raises(tiny):
    probe, dim = tiny
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            probe,
            dim.withColumnRenamed("pval", "event_type"),
            key="user_id",
            ts="ts",
            payload_cols=["event_type"],
        )


def test_range_neighbor_count_cell_boundaries(spark):
    # radius 10 s.  Events at 9.9s apart are neighbors; 10.1s apart are
    # not — the RANGE frame must cut exactly at the inclusive bound.
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (1, 7, base),
        (2, 7, base + dt.timedelta(seconds=9, microseconds=900000)),
        (3, 7, base + dt.timedelta(seconds=10, microseconds=100000)),
        (4, 7, base + dt.timedelta(seconds=25)),
        (5, 8, base),  # other user: never a neighbor of user 7
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r["n_neighbors"]
        for r in range_neighbor_count(
            ev, key="user_id", ts="ts", id_col="event_id", radius_s=10
        ).collect()
    }
    # 1~2 (9.9s), 1~3 (10.1s > 10? no: 10.1 > 10 -> NOT neighbors),
    # 2~3 (0.2s), 3~4 (14.9s -> no)... recompute strictly:
    # |1-2|=9.9 ok; |1-3|=10.1 no; |2-3|=0.2 ok; |2-4|=15.1 no; |3-4|=14.9 no
    assert out == {1: 1, 2: 2, 3: 1, 4: 0, 5: 0}


def test_range_neighbor_matches_quadratic_oracle(spark):
    # deterministic pseudo-random scatter vs the brute-force pair count
    import itertools

    base = _ts("2024-01-01 00:00:00")
    rows = [
        (
            i,
            (i * 7) % 3,
            base + dt.timedelta(seconds=((i * 37) % 113) + ((i * 11) % 7) / 10),
        )
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    expected = {i: 0 for i, _, _ in rows}
    for (a, ua, ta), (b, ub, tb) in itertools.permutations(rows, 2):
        if ua == ub and abs((ta - tb).total_seconds()) <= 15:
            expected[a] += 1
    got = {
        r["event_id"]: r["n_neighbors"]
        for r in range_neighbor_count(
            ev, key="user_id", ts="ts", id_col="event_id", radius_s=15
        ).collect()
    }
    assert got == expected


def test_range_pairs_two_table_semantics(spark):
    base = _ts("2024-01-01 00:00:00")
    probe = spark.createDataFrame(
        [
            (1, 7, base),
            (2, 7, base + dt.timedelta(seconds=50)),
            (3, 8, base),
        ],
        "eid long, user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            (100, 7, base + dt.timedelta(seconds=30)),   # pairs with 1 and 2
            (101, 7, base + dt.timedelta(seconds=200)),  # pairs with nothing (radius 60)
            (102, 9, base),                              # other user
        ],
        "pid long, user_id long, ts timestamp",
    )
    got = {
        (r["eid"], r["pid"]): r["delta_us"]
        for r in range_join_pairs(
            probe, dim, key="user_id", ts="ts", radius_s=60,
            probe_id="eid", dim_id="pid",
        ).collect()
    }
    assert got == {(1, 100): -30_000_000, (2, 100): 20_000_000}


def test_range_count_crosschecks_bucketed_pairs(spark):
    # the windowed count form and the bucketed pair form must agree on a
    # deterministic scatter (each pair counted exactly once in both)
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (i, (i * 5) % 4, base + dt.timedelta(seconds=(i * 41) % 157))
        for i in range(80)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    counted = {
        r["event_id"]: r["n_neighbors"]
        for r in range_neighbor_count(
            ev, key="user_id", ts="ts", id_col="event_id", radius_s=20
        ).collect()
    }
    pairs = range_join_pairs(
        ev, ev.withColumnRenamed("event_id", "rid"),
        key="user_id", ts="ts", radius_s=20,
        probe_id="event_id", dim_id="rid",
    ).filter("event_id <> rid")
    from collections import Counter

    via_pairs = Counter(r["event_id"] for r in pairs.collect())
    assert counted == {i: via_pairs.get(i, 0) for i, _, _ in rows}


def test_range_count_no_pair_materialization(spark):
    # the count form's plan must be a window, not a join
    base = _ts("2024-01-01 00:00:00")
    ev = spark.createDataFrame(
        [(i, 1, base + dt.timedelta(seconds=i)) for i in range(10)],
        "event_id long, user_id long, ts timestamp",
    )
    plan = (
        range_neighbor_count(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "Join" not in plan


def test_asof_matches_bruteforce_oracle(spark):
    # pseudo-random scatter vs a python brute-force as-of (latest dim
    # at-or-before, inclusive)
    base = _ts("2024-01-01 00:00:00")
    probe_rows = [
        (i, (i * 3) % 5, base + dt.timedelta(seconds=(i * 17) % 301))
        for i in range(70)
    ]
    dim_rows = [
        (100 + j, (j * 7) % 5, base + dt.timedelta(seconds=(j * 41) % 301), float(j))
        for j in range(25)
    ]
    probe = spark.createDataFrame(
        probe_rows, "event_id long, user_id long, ts timestamp"
    )
    dim = spark.createDataFrame(
        dim_rows, "did long, user_id long, ts timestamp, pval double"
    )
    expected = {}
    for eid, u, t in probe_rows:
        cands = [(dt_, v) for _, du, dt_, v in dim_rows if du == u and dt_ <= t]
        if cands:
            expected[eid] = max(cands)[1]   # latest ts wins
    got = {
        r["event_id"]: r["pval"]
        for r in asof_join(
            probe, dim.drop("did"), key="user_id", ts="ts",
            payload_cols=["pval"],
        ).collect()
    }
    assert got == expected
