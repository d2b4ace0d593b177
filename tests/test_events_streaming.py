"""Streaming tests: watermarked hourly windows (late data lands in its
window) and the applyInPandasWithState running counter (state survives
across micro-batches and restarts from the same checkpoint)."""

import datetime as dt
import os

import pandas as pd
import pytest


def _write_events(path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # microsecond precision: pandas' default ns-int64 parquet encoding is
    # unreadable by Spark's timestamp reader
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def test_hourly_rollup_stream_handles_late_rows(spark, tmp_path):
    from learnhtml_spark.streaming.events_stream import (
        hourly_rollup_stream,
        read_events_stream,
    )

    ind = tmp_path / "in"
    ind.mkdir()
    # batch 1: two events at 10:xx, one at 11:xx
    _write_events(
        ind / "a.parquet",
        [
            (1, T0 + dt.timedelta(minutes=5), 1, "click", 1.0, ""),
            (2, T0 + dt.timedelta(minutes=50), 2, "click", 2.0, ""),
            (3, T0 + dt.timedelta(minutes=70), 1, "view", 4.0, ""),
        ],
    )
    # batch 2 (same availableNow drain): a LATE 10:xx row — within the
    # 2h watermark, must still count into the 10:00 window
    _write_events(
        ind / "b.parquet",
        [(4, T0 + dt.timedelta(minutes=20), 3, "click", 8.0, "")],
    )
    out = hourly_rollup_stream(read_events_stream(spark, str(ind)))
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from hourly_test").collect()
    }
    assert got[("2026-01-01 10", "click")] == (3, 11.0)
    assert got[("2026-01-01 11", "view")] == (1, 4.0)


def test_running_user_counts_state_survives_restart(spark, tmp_path):
    from learnhtml_spark.streaming.events_stream import (
        read_events_stream,
        running_user_counts,
    )

    ind = tmp_path / "in"
    ind.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        ind / "a.parquet",
        [
            (1, T0, 1, "click", 1.0, ""),
            (2, T0, 1, "click", 2.0, ""),
            (3, T0, 2, "view", 5.0, ""),
        ],
    )

    def drain(name):
        # memory sink cannot recover from a checkpoint — use foreachBatch
        # with a durable parquet append (update-mode semantics preserved:
        # each batch emits only the keys it touched)
        outdir = str(tmp_path / name)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outdir)

        out = running_user_counts(read_events_stream(spark, str(ind)))
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.read.parquet(outdir).collect()
        }

    got1 = drain("running_1")
    assert got1[1] == (2, 3.0) and got1[2] == (1, 5.0)

    # restart from the same checkpoint with NEW data only: counts must
    # CONTINUE from persisted state, and only touched keys re-emit
    _write_events(ind / "b.parquet", [(4, T0, 1, "click", 10.0, "")])
    got2 = drain("running_2")
    assert got2[1] == (3, 13.0)
    assert 2 not in got2  # untouched key emits nothing in update mode


def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    """Streaming dedup: keeper per fingerprint persists across
    micro-batches AND a checkpoint restart; within-batch ties break to
    the smallest doc_id (batch exact_dedup parity)."""
    import pandas as pd

    from learnhtml_spark.streaming.dedup_stream import (
        read_docs_stream,
        streaming_exact_dedup,
    )

    ind = tmp_path / "docs_in"
    ind.mkdir()
    ckpt = str(tmp_path / "dedup_ckpt")

    def write_docs(path, rows):
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source"]
        ).to_parquet(path, index=False)

    # batch 1: doc 5 and 2 are exact dups (after normalization), 9 unique
    write_docs(
        ind / "a.parquet",
        [
            (5, "Hello   World", "en", "s1"),
            (2, "  hello world ", "en", "s2"),
            (9, "something else", "en", "s1"),
        ],
    )

    def drain(name):
        outdir = str(tmp_path / name)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outdir)

        q = (
            streaming_exact_dedup(read_docs_stream(spark, str(ind)))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return {
            r["doc_id"]: (r["keep_doc_id"], r["is_duplicate"])
            for r in spark.read.parquet(outdir).collect()
        }

    got1 = drain("dedup_1")
    assert got1[2] == (2, False)   # min doc_id wins the within-batch tie
    assert got1[5] == (2, True)
    assert got1[9] == (9, False)

    # restart with new data: doc 1 duplicates the (2,5) fingerprint — the
    # state-store keeper (2) must stay authoritative even though 1 < 2
    write_docs(ind / "b.parquet", [(1, "hello world", "en", "s3")])
    got2 = drain("dedup_2")
    assert got2 == {1: (2, True)}  # update mode: only the touched doc


def test_streaming_neardup_bands_first_seen_wins(spark, tmp_path):
    """Streaming near-dup: a doc sharing ANY MinHash band with an earlier
    doc is flagged; keepers persist across a checkpoint restart; verdicts
    equal the batch band-group-min window within one micro-batch."""
    import pandas as pd

    from learnhtml_spark.streaming.dedup_stream import read_docs_stream
    from learnhtml_spark.streaming.neardup_stream import (
        neardup_verdicts,
        streaming_neardup_bands,
    )

    ind = tmp_path / "nd_in"
    ind.mkdir()
    ckpt = str(tmp_path / "nd_ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely unrelated content about distributed query engines"

    def write_docs(path, rows):
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source"]
        ).to_parquet(path, index=False)

    write_docs(
        ind / "a.parquet",
        [(7, base, "en", "s1"), (3, near, "en", "s2"), (9, other, "en", "s1")],
    )

    def drain(name):
        outdir = str(tmp_path / name)

        def sink(batch_df, batch_id):
            neardup_verdicts(batch_df).write.mode("append").parquet(outdir)

        q = (
            streaming_neardup_bands(read_docs_stream(spark, str(ind)))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return {
            r["doc_id"]: (r["keep_doc_id"], r["is_duplicate"])
            for r in spark.read.parquet(outdir).collect()
        }

    got1 = drain("nd_1")
    # 3 and 7 share nearly all shingles -> some band collides; min wins
    assert got1[3] == (3, False)
    assert got1[7] == (3, True)
    assert got1[9] == (9, False)

    # restart: doc 1 repeats the base text exactly — every band matches
    # the stored (keeper=3) state even though 1 < 3: first-seen wins
    write_docs(ind / "b.parquet", [(1, base, "en", "s3")])
    got2 = drain("nd_2")
    assert got2 == {1: (3, True)}

def test_streaming_neardup_state_ttl_evicts(spark, tmp_path):
    """The optional state TTL (ADVICE r4): with ProcessingTimeTimeout a
    band group unseen past the TTL is evicted by a later micro-batch, so
    a subsequent duplicate of the evicted page is treated as first-seen —
    the documented recall/state trade.  Needs a continuous trigger (an
    AvailableNow replay stops before cleanup batches can run); the query
    idles past the TTL so the empty cleanup batches evict, then the late
    duplicate arrives."""
    import time

    import pandas as pd

    from learnhtml_spark.streaming.dedup_stream import read_docs_stream
    from learnhtml_spark.streaming.neardup_stream import (
        neardup_verdicts,
        streaming_neardup_bands,
    )

    ind = tmp_path / "ttl_in"
    ind.mkdir()
    outdir = str(tmp_path / "ttl_out")
    base = "the quick brown fox jumps over the lazy dog again and again"

    def write_docs(path, rows):
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source"]
        ).to_parquet(path, index=False)

    write_docs(ind / "a.parquet", [(5, base, "en", "s1"), (8, base, "en", "s1")])

    def sink(batch_df, batch_id):
        neardup_verdicts(batch_df).write.mode("append").parquet(outdir)

    q = (
        streaming_neardup_bands(
            read_docs_stream(spark, str(ind)), state_ttl_ms=3_000
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def read_out():
            try:
                return {
                    r["doc_id"]: (r["keep_doc_id"], r["is_duplicate"])
                    for r in spark.read.parquet(outdir).collect()
                }
            except Exception:
                return {}

        deadline = time.time() + 90
        while time.time() < deadline and len(read_out()) < 2:
            time.sleep(1)
        got = read_out()
        assert got[5] == (5, False) and got[8] == (5, True)

        # idle past the TTL so cleanup batches evict the keeper state,
        # then replay an exact duplicate: first-seen, NOT flagged vs 5
        time.sleep(8)
        write_docs(ind / "b.parquet", [(2, base, "en", "s2")])
        deadline = time.time() + 90  # re-arm: phase 1 may have eaten it
        while time.time() < deadline and 2 not in read_out():
            time.sleep(1)
        assert read_out()[2] == (2, False)
    finally:
        q.stop()
