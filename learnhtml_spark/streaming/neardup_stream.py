"""Streaming NEAR-duplicate detection — the streaming twin of the batch
``functions.dedup.neardup_pairs`` candidate generator: MinHash band
signatures kept in keyed state, so an incoming document is flagged the
moment ANY of its bands collides with a band seen earlier in the stream.

Semantics (first-seen-wins, mirroring ``dedup_stream``): for every band
group (band index, band signature) the state holds the keeper = smallest
doc_id first seen in that group; an incoming doc's verdict is
``keep_doc_id = min over its bands of the group keepers`` and
``is_duplicate = keep_doc_id != doc_id``.  Replayed with
``Trigger.AvailableNow`` over a single-file table this equals the batch
window ``min(doc_id) over (partition by band, band_sig)`` — which is what
the SQL oracle attests (one-hop keeper, deliberately NOT the transitive
closure: connected-component dedup is a batch job, not an online verdict).

Scale notes:
- the band signature is computed NARROWLY — one ``aggregate`` pass over
  the shingle hash array per document, all 16 minhashes folded in a
  single lambda accumulator and the band strings assembled in the
  ``finish`` lambda (the accumulator is a bound variable there, so
  nothing is re-evaluated; the batch explode+groupBy shape would be a
  stateful aggregation Spark cannot chain before keyed state);
- state = one (band, band_sig) -> keeper entry per distinct band
  signature: ``n_bands`` entries per distinct doc, hash-partitioned by
  signature (no skew — signatures are minhash-random).  A production
  deployment bounds it with state TTL (drop bands not seen for N days)
  — the operator itself is oblivious to eviction;
- output mode ``update``: O(incoming bands) rows per micro-batch, never
  O(state); the per-doc rollup (``neardup_verdicts``) runs inside the
  sink's ``foreachBatch`` over just that micro-batch's band verdicts
  (a doc's bands always share a micro-batch — they come from one row).

Reference parity: extends learnhtml beyond its batch corpus tooling
(SURVEY.md §2 training-pipeline operators); hashing/banding is identical
to ``functions.dedup.minhash_lsh_candidates`` (same md5 + universal-hash
constants), so stream and batch agree on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from learnhtml_spark.functions.dedup import (
    _MH_P,
    _mh_constants,
    _shingle_array_of,
)
from learnhtml_spark.functions.textstats import tokens


def band_signatures_narrow(
    docs: DataFrame, num_hashes: int = 16, band_size: int = 4, k: int = 3
) -> DataFrame:
    """(doc_id, band, band_sig) computed WITHOUT any shuffle or stateful
    aggregation — streaming-safe and value-identical to the batch
    ``minhash_signatures`` + banding path (min over the same universal
    hashes of the same md5 shingle hashes; band_sig = sorted minhashes
    joined with '|').

    Everything folds in ONE ``aggregate`` expression: the merge lambda
    updates all ``num_hashes`` running minima per shingle hash, and the
    finish lambda (where the accumulator is a bound variable — evaluated
    once, the HOF re-evaluation hazard of r3 cannot apply) assembles the
    per-band sorted signature strings.  Documents with no shingles
    (empty/whitespace text) keep the sentinel accumulator and are
    filtered AFTER the explode, matching their absence from the batch
    signature table."""
    n_bands = num_hashes // band_size
    A, B = _mh_constants(num_hashes)

    # tokens materialized in a prior projection so the regex split runs
    # once per row (the batch `_with_shingles` rationale; streaming-safe —
    # it is just a narrow projection chain)
    docs = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("_toks")
    )
    h_arr = F.transform(
        _shingle_array_of(F.col("_toks"), k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )
    init = F.array(*[F.lit(_MH_P).cast("long") for _ in range(num_hashes)])

    def merge(acc, h):
        return F.array(
            *[
                F.least(
                    acc[j], (F.lit(A[j]) * h + F.lit(B[j])) % F.lit(_MH_P)
                )
                for j in range(num_hashes)
            ]
        )

    def finish(acc):
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.sort_array(
                                F.array(
                                    *[
                                        acc[b * band_size + j]
                                        for j in range(band_size)
                                    ]
                                )
                            ),
                            lambda c: c.cast("string"),
                        ),
                    ).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )

    bands = F.aggregate(h_arr, init, merge, finish)
    sentinel = "|".join([str(_MH_P)] * band_size)
    return (
        docs.select("doc_id", F.explode(bands).alias("x"))
        .select("doc_id", F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig"))
        .filter(F.col("band_sig") != sentinel)
    )


def streaming_neardup_bands(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """(doc_id, band, grp_min) per incoming document band — ``grp_min`` is
    the first-seen-wins keeper of the (band, band_sig) state group
    (within-batch ties break to the smallest doc_id).  Feed the output of
    one micro-batch to ``neardup_verdicts`` for per-doc verdicts.

    ``state_ttl_ms`` bounds state growth for long-running production
    streams (ADVICE r4: NoTimeout state holds n_bands entries per
    distinct doc forever): with a TTL, a band group not refreshed within
    the window is evicted — a later duplicate of an evicted page is
    simply treated as first-seen, the standard recall/state trade of
    windowed dedup.  The replay-oracle harness leaves it None (exact
    first-seen semantics over one AvailableNow micro-batch).  Use a TTL
    only with a continuous trigger: AvailableNow stops before the empty
    cleanup batches that process timeouts can run (the TTL test drives a
    processingTime trigger for exactly this reason)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bands = band_signatures_narrow(docs, num_hashes, band_size, k)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        doc_ids = []
        for pdf in pdfs:
            doc_ids.extend(int(d) for d in pdf["doc_id"])
        if state.exists:
            keeper = state.get[0]
        else:
            keeper = min(doc_ids)
            state.update((int(keeper),))
        if state_ttl_ms is not None:
            # refreshed on every sighting: eviction clock restarts while
            # a group keeps appearing in the stream
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "band": [int(key[0])] * len(doc_ids),
                "grp_min": [int(keeper)] * len(doc_ids),
            }
        )

    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return bands.groupBy("band", "band_sig").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, band int, grp_min long",
        stateStructType="keeper long",
        outputMode="update",
        timeoutConf=timeout,
    )


def neardup_verdicts(band_verdicts: DataFrame) -> DataFrame:
    """Per-doc rollup of one micro-batch's band verdicts: (doc_id,
    keep_doc_id, is_duplicate) — a doc is a near-dup candidate if ANY of
    its bands had an earlier (or smaller, within the batch) keeper."""
    return (
        band_verdicts.groupBy("doc_id")
        .agg(F.min("grp_min").alias("keep_doc_id"))
        .select(
            "doc_id",
            "keep_doc_id",
            (F.col("keep_doc_id") != F.col("doc_id")).alias("is_duplicate"),
        )
    )
