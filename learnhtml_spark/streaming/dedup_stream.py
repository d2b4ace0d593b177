"""Streaming exact deduplication — the training-data-pipeline dedup
operator (functions/dedup.exact_dedup) re-expressed for continuous
ingest: FIRST-SEEN-WINS across micro-batches and restarts.

A 10^12-doc corpus is not ingested in one batch; the batch exact_dedup
(one hash-aggregate) answers "which docs in THIS dataset collide", while
ingestion needs "has this fingerprint EVER been seen" — arbitrary keyed
state, which is exactly ``applyInPandasWithState``: the keeper doc_id per
fingerprint lives in the state store (RocksDB/HDFS-backed on a cluster),
keyed by the same md5 fingerprint the batch operator and its DuckDB
oracle use, so batch and stream agree on the dup key.

Scale notes:
- state size is one (fp → keeper doc_id) entry per DISTINCT document —
  the minimum any exact online dedup can hold; fp hash-partitions the
  state store evenly (md5, no skew);
- output mode is ``update``: each micro-batch emits one verdict row per
  INCOMING doc only, so the sink sees O(batch), not O(state);
- exactly-once verdicts across restarts come from the checkpoint: state
  and source offsets commit together (test: restart from the same
  checkpoint keeps earlier keepers authoritative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"


def read_docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, fp, keep_doc_id, is_duplicate) per incoming document —
    ``is_duplicate`` is False for exactly one doc per fingerprint over the
    stream's lifetime (the first seen; ties within a micro-batch break to
    the smallest doc_id, matching batch ``exact_dedup``'s min-keeper)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    keyed = docs.select("doc_id", F.md5(norm).alias("fp"))

    def fn(key, pdfs, state: GroupState):
        keeper = state.get[0] if state.exists else None
        doc_ids = []
        for pdf in pdfs:
            doc_ids.extend(int(d) for d in pdf["doc_id"])
        if keeper is None:
            keeper = min(doc_ids)  # deterministic within-batch tie-break
            state.update((int(keeper),))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "fp": [key[0]] * len(doc_ids),
                "keep_doc_id": [int(keeper)] * len(doc_ids),
                "is_duplicate": [d != keeper for d in doc_ids],
            }
        )

    return keyed.groupBy("fp").applyInPandasWithState(
        fn,
        outputStructType=(
            "doc_id long, fp string, keep_doc_id long, is_duplicate boolean"
        ),
        stateStructType="keeper long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
