"""Measure ANN quality: recall@k of the two approximate families against
the exact cosine_topk baseline on the same embeddings table.

VERDICT r3 #2: both ANN operators were oracle-exact (portability proven)
but nothing measured whether their answers are USEFUL — recall vs the
exact top-k.  This script grades:
  - ann_lsh_topk   at bits in {4, 6, 8}          (hyperplane LSH)
  - ivf_topk       at n_centroids in {4, 8, 16}  (data-seeded mode)
  - ivf_topk       fitted k-means centroids       (scripts/fit_ivf.py fit,
                                                   refit per n_centroids)
recall@k = mean over query vectors of |approx_topk ∩ exact_topk| / k
(vectors an approximate index returns nothing for count as 0 — that IS
the quality loss of an empty bucket/cell).

Prints one JSON line and a markdown table for BENCH.md.

Usage: python scripts/ann_recall.py [sf_dir] [k]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_sets(df):
    """{vec_id: [neighbor ids in rank order]} from a (vec_id, neighbor_id,
    sim, rank) frame."""
    out = {}
    for r in df.collect():
        out.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    return {v: [n for _, n in sorted(lst)] for v, lst in out.items()}


def recall_at_k(exact, approx, k):
    tot = 0.0
    for v, ex in exact.items():
        ap = set(approx.get(v, []))
        tot += len(ap & set(ex[:k])) / float(k)
    return tot / max(len(exact), 1)


def clustered_embeddings(spark, n=2000, dims=64, n_clusters=20, seed=7):
    """Deterministic CLUSTERED corpus (the geometry real text embeddings
    have): ``n_clusters`` random unit centers, points = center + small
    noise.  Companion to the near-random testdata embeddings — together
    they bracket ANN recall between its worst case and its typical case."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + 0.15 * rng.normal(size=(n, dims))
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    clustered = "--clustered" in sys.argv

    import numpy as np
    from pyspark.sql import SparkSession

    from learnhtml_spark.functions.similarity import (
        ann_lsh_topk,
        cosine_topk,
        fit_ivf_centroids,
        ivf_topk,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if clustered:
        emb = clustered_embeddings(spark)
        sf_dir = "<clustered synthetic>"
    else:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = emb.count()

    t0 = time.time()
    exact = topk_sets(cosine_topk(emb, k=k))
    exact_s = time.time() - t0

    rows_sorted = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
    )
    mat = np.array([r["embedding"] for r in rows_sorted], dtype=np.float64)

    results = []
    for bits in (4, 6, 8):
        for mp in (0, 1):
            t0 = time.time()
            approx = topk_sets(
                ann_lsh_topk(emb, bits=bits, k=k, multiprobe=mp)
            )
            results.append(
                {
                    "family": "lsh" if mp == 0 else "lsh-multiprobe",
                    "config": f"bits={bits}",
                    "recall": round(recall_at_k(exact, approx, k), 4),
                    "wall_s": round(time.time() - t0, 2),
                }
            )
    for nc in (4, 8, 16):
        t0 = time.time()
        approx = topk_sets(ivf_topk(emb, n_centroids=nc, k=k))
        results.append(
            {
                "family": "ivf-seeded",
                "config": f"n_centroids={nc}",
                "recall": round(recall_at_k(exact, approx, k), 4),
                "wall_s": round(time.time() - t0, 2),
            }
        )
        cent = fit_ivf_centroids(mat, nc, n_iter=8)
        for nprobe in (1, 2, 4):
            t0 = time.time()
            approx = topk_sets(ivf_topk(emb, k=k, centroids=cent, nprobe=nprobe))
            results.append(
                {
                    "family": "ivf-fitted",
                    "config": f"n_centroids={nc},nprobe={nprobe}",
                    "recall": round(recall_at_k(exact, approx, k), 4),
                    "wall_s": round(time.time() - t0, 2),
                }
            )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n_vec,
                "k": k,
                "exact_wall_s": round(exact_s, 2),
                "results": results,
            }
        )
    )
    print()
    print(f"| family | config | recall@{k} | wall (s) |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['family']} | {r['config']} | {r['recall']:.3f} "
            f"| {r['wall_s']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
