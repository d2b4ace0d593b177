"""Corpus-assembly composition: the full LLM training-corpus build as ONE
declarative plan.

The individual stages (exact dedup, LSH near-dup keepers, Gopher quality
gate, benchmark decontamination) each exist as standalone oracle-checked
operators; ``corpus_build`` composes their verdicts per document so a
corpus run is a single DataFrame — Catalyst sees the whole pipeline and
AQE sizes every doc_id join.

Beyond-reference operator (training-data pipeline family); no learnhtml
counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from learnhtml_spark.functions.chunking import decontaminate
from learnhtml_spark.functions.dedup import neardup_groups
from learnhtml_spark.functions.textstats import fingerprint, quality_gate


def corpus_build(
    docs: DataFrame,
    eval_n: int = 20,
    k_decon: int = 5,
    num_hashes: int = 16,
    band_size: int = 4,
    k_shingle: int = 3,
    gate_params: dict | None = None,
) -> DataFrame:
    """(doc_id, is_exact_keeper, is_near_keeper, quality_ok,
    first_violation, contaminated, keep): per-document verdicts from
    every corpus-assembly stage plus the final conjunction — the
    auditable form of "what survived the build and why not".

    Semantics: each stage computes exactly what its standalone operator
    computes over the FULL corpus (so verdicts here match the
    standalone queries row-for-row); the output row set is the
    non-benchmark documents (the ``eval_n`` smallest doc_ids are the
    eval suite — they are held out, not trained on).  ``keep`` =
    exact-keeper AND near-dup-keeper AND quality AND not contaminated.
    Documents that emit no shingles never enter an LSH band group and
    are trivially near-unique (left join + coalesce restores them).

    Scale: four corpus passes (one per stage — honest; a 100 TB run
    would read the columnar scan once per stage from cache/storage,
    and each stage is individually scale-reviewed: map-side-combined
    aggregates, keeper-edge O(m)-per-group LSH, broadcast eval grams),
    then three doc_id equi-joins — high-cardinality key, AQE-sized,
    no windows over low-cardinality groups anywhere."""
    from pyspark.sql import Window

    # exact-keeper verdict as a window min over the fingerprint rows —
    # ONE exchange and one normalization pass, where the old aggregate +
    # join-back recomputed fingerprint() for the probe side (Catalyst
    # shares no subtrees across joins) and shuffled it twice
    ex = fingerprint(docs).select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("fp"))
        ).alias("is_exact_keeper"),
    )
    nd = neardup_groups(docs, num_hashes, band_size, k_shingle).select(
        "doc_id", "is_duplicate"
    )
    qg = quality_gate(docs, **(gate_params or {})).select(
        "doc_id", F.col("keep").alias("quality_ok"), "first_violation"
    )
    dc = decontaminate(docs, eval_n=eval_n, k=k_decon).select(
        "doc_id", "contaminated"
    )
    near_ok = ~F.coalesce(F.col("is_duplicate"), F.lit(False))
    return (
        dc.join(ex, "doc_id")
        .join(nd, "doc_id", "left")
        .join(qg, "doc_id")
        .select(
            "doc_id",
            "is_exact_keeper",
            near_ok.alias("is_near_keeper"),
            "quality_ok",
            "first_violation",
            "contaminated",
            (
                F.col("is_exact_keeper")
                & near_ok
                & F.col("quality_ok")
                & ~F.col("contaminated")
            ).alias("keep"),
        )
    )
