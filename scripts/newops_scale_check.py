"""10× spot-check for the final-round-5 operators (hll_distinct,
pii_scrub, quality_gate, mixture_sample, corpus_build,
embedding_decontaminate): per-doc throughput at 1× (5k docs, sf0.1 —
2k vectors for the embedding op) vs 10× (50k docs, the shingle-disjoint
replica corpus shared with dedup_scale_check; 20k replicated vectors).
Linear-ish = ratio near or above 1 (fixed per-job overhead amortizes
with size).

Run ALONE on a quiet box: python scripts/newops_scale_check.py [op ...]
(op names filter the run; results merge into the existing artifact so a
partial run never drops earlier points).
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


def _timed(thunk):
    t0 = time.time()
    thunk()
    return time.time() - t0


def main():
    import bench
    from dedup_scale_check import build_docs_10x

    import __spark_entry__ as E
    from learnhtml_spark.functions.dedup import exact_substr_dedup, hll_distinct
    from learnhtml_spark.functions.pipeline import corpus_build
    from learnhtml_spark.functions.sampling import mixture_sample
    from learnhtml_spark.functions.textstats import pii_scrub, quality_gate

    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    p10 = build_docs_10x(spark)
    d1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d10 = spark.read.parquet(p10)

    from pyspark.sql import functions as F

    from learnhtml_spark.functions.similarity import embedding_decontaminate

    e1 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # 10× replica: same vectors under fresh ids (gram cost is
    # value-independent; what scales is the corpus row count)
    e10 = (
        e1.select(
            "vec_id", "embedding",
            F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("r"),
        )
        .select((F.col("vec_id") * 10 + F.col("r")).alias("vec_id"), "embedding")
    )

    ops = {
        "hll_distinct": lambda d: hll_distinct(d, p=4, group="lang"),
        "pii_scrub": lambda d: pii_scrub(E._plant_pii(d)),
        "quality_gate": lambda d: quality_gate(d, **E._QG),
        "mixture_sample": lambda d: mixture_sample(d, rates=E._MIXTURE_RATES),
        "corpus_build": lambda d: corpus_build(d, gate_params=E._QG),
        "embedding_decontaminate": lambda d: embedding_decontaminate(
            d, eval_n=E._EMB_DECON_EVAL_N, threshold=E._EMB_DECON_TAU
        ),
        "exact_substr_dedup": lambda d: exact_substr_dedup(d, window=E._XSUB_W),
    }
    inputs = {"embedding_decontaminate": (e1, e10)}
    only = set(sys.argv[1:])
    if only - set(ops):
        raise SystemExit(f"unknown ops: {sorted(only - set(ops))}")
    out = {"cpus": CPUS, "points": {}}
    if os.path.exists("artifacts_newops_scale_r5.json"):
        with open("artifacts_newops_scale_r5.json") as f:
            out.update(json.load(f))
    bench.noop_write(pii_scrub(d1))  # warm codegen + python workers
    n1, n10 = d1.count(), d10.count()
    for name, fn in ops.items():
        if only and name not in only:
            continue
        a, b = inputs.get(name, (d1, d10))
        for tag, df in (("1x", a), ("10x", b)):
            n = n1 if df is d1 else n10 if df is d10 else df.count()
            # min-of-2 so one co-tenant burst cannot contaminate a ratio
            w = min(_timed(lambda: bench.noop_write(fn(df))) for _ in range(2))
            out["points"][f"{name}_{tag}"] = {
                "docs": n, "wall_s": round(w, 2),
                "docs_per_sec": round(n / w, 1),
            }
        r1 = out["points"][f"{name}_1x"]["docs_per_sec"]
        rN = out["points"][f"{name}_10x"]["docs_per_sec"]
        out[f"{name}_throughput_ratio_10x_vs_1x"] = round(rN / r1, 3)
    print(json.dumps(out, indent=1))
    with open("artifacts_newops_scale_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
