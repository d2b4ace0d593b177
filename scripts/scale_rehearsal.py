"""10× scale rehearsal (VERDICT r3 #5): run the flagship extraction,
`neardup_pipe` and `ann_lsh_topk` at 1× and 10× the round-3 bench corpus
on the same session config, and report per-doc throughput ratios, Σn_b²
behavior and driver memory growth.

Inputs are built UNTIMED and deterministically from sf0.1:
- spans corpora: documents × {32, 320} replicas (distinct doc_ids, per-doc
  work unchanged) — 50k and 500k docs of interleaved spans;
- documents 10×: every 3rd word of each replica substituted with a
  replica-unique token, so replicas share NO 3-gram shingles (each
  replica set keeps its own internal near-dup structure; candidate and
  verify volume scale linearly, the way a real 10× corpus would — naive
  replication would instead manufacture quadratic duplicate clusters);
- embeddings 10×: replicas with distinct vec_ids and a deterministic
  per-replica perturbation of one dimension (distinct vectors, same
  geometry).

Linear-ish = per-doc wall within ~20% of the 1× point at 10× the data.
For ANN the knob is raised with the corpus (bits 6 → 8) so the expected
bucket size — and with it Σn_b² per bucket — stays bounded: that is the
documented 100 TB recipe, exercised rather than asserted.

Run ALONE on a quiet box: python scripts/scale_rehearsal.py
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = "/tmp/scale_rehearsal"


def session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-rehearsal")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .getOrCreate()
    )


def rss_gb():
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def build_inputs(spark, factor: int):
    from pyspark.sql import functions as F

    from learnhtml_spark.corpus import synthesize_docs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    for mult, name in ((32, "spans_1x"), (32 * factor, f"spans_{factor}x")):
        out = os.path.join(BASE, name)
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        d = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        ).withColumn(
            "doc_id", F.concat_ws("_", F.col("doc_id"), F.col("rep"))
        ).drop("rep")
        synthesize_docs(d.repartition(CPUS * 8, "doc_id")).write.mode(
            "overwrite"
        ).parquet(out)

    out = os.path.join(BASE, f"docs_{factor}x")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        d = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
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

    out = os.path.join(BASE, f"emb_{factor}x")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        e = emb.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        rep = F.col("rep")
        perturbed = F.transform(
            F.col("embedding"),
            lambda v, i: F.when(
                i == F.pmod(rep, F.lit(64)),
                v + (rep + 1).cast("float") * F.lit(0.05),
            ).otherwise(v).cast("float"),
        )
        e.select(
            (F.col("vec_id") + rep * F.lit(10_000_000)).alias("vec_id"),
            perturbed.alias("embedding"),
        ).repartition(CPUS * 2).write.mode("overwrite").parquet(out)


def timed(fn, warm=None):
    if warm is not None:
        warm()
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    os.makedirs(BASE, exist_ok=True)
    spark = session()
    spark.sparkContext.setLogLevel("ERROR")
    build_inputs(spark, factor)

    import __spark_entry__ as E
    from learnhtml_spark.functions.dedup import neardup_pairs
    from learnhtml_spark.functions.similarity import ann_lsh_topk
    from learnhtml_spark.operators.extract import extract_content_spans

    model = E._model_bytes()
    out = {"factor": factor, "cpus": CPUS, "points": {}}

    for name, mult in (("1x", 32), (f"{factor}x", 32 * factor)):
        spans = spark.read.parquet(os.path.join(BASE, f"spans_{name if name != '1x' else '1x'}"))
        n = spans.count()
        # warm python workers on a slice, then one timed full pass
        import glob

        files = sorted(
            glob.glob(os.path.join(BASE, f"spans_{name}", "part-*"))
        )[:: max(1, 16)]
        wall = timed(
            lambda: noop(extract_content_spans(spans, model)),
            warm=lambda: noop(
                extract_content_spans(spark.read.parquet(*files), model)
            ),
        )
        out["points"][f"extract_{name}"] = {
            "docs": n, "wall_s": wall, "docs_per_sec": round(n / wall, 1),
        }

    d1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    dN = spark.read.parquet(os.path.join(BASE, f"docs_{factor}x"))
    for name, df in (("1x", d1), (f"{factor}x", dN)):
        n = df.count()
        wall = timed(lambda: noop(neardup_pairs(df, threshold=0.4, max_band_group=1000)))
        out["points"][f"neardup_{name}"] = {
            "docs": n, "wall_s": wall,
            "docs_per_sec": round(n / wall, 1),
        }

    e1 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    eN = spark.read.parquet(os.path.join(BASE, f"emb_{factor}x"))
    for name, df, bits in (("1x", e1, 6), (f"{factor}x", eN, 8),
                           (f"{factor}x_bits6", eN, 6)):
        n = df.count()
        wall = timed(lambda: noop(ann_lsh_topk(df, bits=bits, k=3)))
        out["points"][f"ann_{name}"] = {
            "vectors": n, "bits": bits, "wall_s": wall,
            "vecs_per_sec": round(n / wall, 1),
        }

    ex1 = out["points"]["extract_1x"]["docs_per_sec"]
    exN = out["points"][f"extract_{factor}x"]["docs_per_sec"]
    out["extract_throughput_ratio_10x_vs_1x"] = round(exN / ex1, 3)
    nd1 = out["points"]["neardup_1x"]["docs_per_sec"]
    ndN = out["points"][f"neardup_{factor}x"]["docs_per_sec"]
    out["neardup_throughput_ratio_10x_vs_1x"] = round(ndN / nd1, 3)
    out["driver_peak_rss_gb"] = rss_gb()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
