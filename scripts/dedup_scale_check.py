"""Dedup-family 10× spot-check (VERDICT r4 #1/#2 done-criteria): time
minhash_lsh_candidates (capped), neardup_pairs (AQE-sided size joins),
neardup_groups and dup_clusters at 1× (5k docs) and 10× (50k docs, the
shingle-disjoint replica corpus from scale_rehearsal) and report per-doc
throughput ratios.  Linear-ish = per-doc wall within ~20-30% at 10×.

Run ALONE on a quiet box: python scripts/dedup_scale_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/tmp/scale_rehearsal"
FACTOR = 10


def build_docs_10x(spark):
    """Shingle-disjoint 10× replica corpus (same construction as
    scale_rehearsal.build_inputs — every 3rd word replica-unique, so
    candidate/verify volume scales linearly like a real 10× corpus)."""
    from pyspark.sql import functions as F

    out = os.path.join(BASE, f"docs_{FACTOR}x")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(BASE, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d = docs.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1)))
    )
    rep = F.col("rep")
    mutated = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda w, i: F.when(
                i % 3 == 0,
                F.concat(F.lit("q"), rep.cast("string"), F.lit("z"),
                         i.cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    d.select(
        (F.col("doc_id") + rep * F.lit(10_000_000)).alias("doc_id"),
        mutated.alias("text"),
        "lang",
        "source",
        F.length(mutated).alias("n_chars"),
    ).repartition(CPUS * 4).write.mode("overwrite").parquet(out)
    return out


def _timed(thunk):
    t0 = time.time()
    thunk()
    return time.time() - t0


def main():
    import bench

    from learnhtml_spark.functions.chunking import bloom_decontaminate
    from learnhtml_spark.functions.dedup import (
        dup_clusters,
        dup_rate_by_source,
        minhash_lsh_candidates,
        neardup_groups,
        neardup_pairs,
        segment_dedup,
        source_overlap,
    )
    from learnhtml_spark.functions.textstats import unigram_lm_score

    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    p10 = build_docs_10x(spark)
    d1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d10 = spark.read.parquet(p10)

    ops = {
        "minhash_lsh": lambda d: minhash_lsh_candidates(d, max_band_group=1000),
        "neardup_pipe": lambda d: neardup_pairs(d, threshold=0.4, max_band_group=1000),
        "neardup_groups": lambda d: neardup_groups(d),
        "dup_clusters": lambda d: dup_clusters(d),
        "segment_dedup": lambda d: segment_dedup(d),
        "bloom_decontaminate": lambda d: bloom_decontaminate(d),
        "dup_rate_by_source": lambda d: dup_rate_by_source(d),
        "source_overlap": lambda d: source_overlap(d),
        "unigram_lm": lambda d: unigram_lm_score(d),
    }
    out = {"cpus": CPUS, "points": {}}
    # warm once (codegen + python workers)
    bench.noop_write(minhash_lsh_candidates(d1))
    n1, n10 = d1.count(), d10.count()
    for name, fn in ops.items():
        for tag, df, n in (("1x", d1, n1), ("10x", d10, n10)):
            # co-tenant steal on this box is bursty (minutes) — time each
            # point twice and keep the min wall so a single burst cannot
            # contaminate a ratio (the bench.py probe protocol's cheap
            # analog for this spot-check harness)
            w = min(
                _timed(lambda: bench.noop_write(fn(df)))
                for _ in range(2)
            )
            out["points"][f"{name}_{tag}"] = {
                "docs": n, "wall_s": round(w, 2),
                "docs_per_sec": round(n / w, 1),
            }
        r1 = out["points"][f"{name}_1x"]["docs_per_sec"]
        rN = out["points"][f"{name}_10x"]["docs_per_sec"]
        out[f"{name}_throughput_ratio_10x_vs_1x"] = round(rN / r1, 3)
    print(json.dumps(out, indent=1))
    with open(os.environ.get("DEDUP_SCALE_ARTIFACT", "artifacts_dedup_scale_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
