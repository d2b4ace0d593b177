"""10× spot-check for the round-6 operators (pdf_spans, heuristic_spans,
warc_docs, warc_extract): per-doc throughput at 1× (sf0.01, 500 docs) vs
10× (sf0.1, 5000 docs).  All four are fully narrow plans (synthesize /
binaryFile listing -> mapInPandas, zero exchanges), so per-doc throughput
should be flat-or-better at 10× as the fixed per-job overhead amortizes.

Run ALONE on a quiet box: python scripts/r6_scale_check.py [query ...]
(names filter the run; results merge into the artifact so a partial run
never drops earlier points).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_1X = "/root/testdata/sf0.01"
SF_10X = "/root/testdata/sf0.1"
ARTIFACT = "artifacts_newops_scale_r6.json"
QUERIES = [
    "pdf_spans", "heuristic_spans", "warc_docs", "warc_extract",
    "outlinks", "url_canon", "url_dedup", "link_graph", "pagerank",
]


def _timed(thunk):
    t0 = time.time()
    thunk()
    return time.time() - t0


def main():
    import bench

    import __spark_entry__ as E

    only = set(sys.argv[1:])
    if only - set(QUERIES):
        raise SystemExit(f"unknown queries: {sorted(only - set(QUERIES))}")

    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    q = E.queries()
    # pre-materialize the synthetic archive/pdf inputs so the timed runs
    # measure the read+parse pipeline, not one-off file synthesis
    from learnhtml_spark.sources.warc_source import synthesize_warc_dir

    for sf in (SF_1X, SF_10X):
        synthesize_warc_dir(sf)

    docs_n = {}
    for tag, sf in (("1x", SF_1X), ("10x", SF_10X)):
        docs_n[tag] = (
            spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
        )

    out = {"cpus": CPUS, "points": {}}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            out.update(json.load(f))
    bench.noop_write(q["warc_docs"](spark, SF_1X))  # warm python workers
    for name in QUERIES:
        if only and name not in only:
            continue
        for tag, sf in (("1x", SF_1X), ("10x", SF_10X)):
            # min-of-2 so one co-tenant burst cannot contaminate a ratio
            w = min(
                _timed(lambda: bench.noop_write(q[name](spark, sf)))
                for _ in range(2)
            )
            out["points"][f"{name}_{tag}"] = {
                "docs": docs_n[tag], "wall_s": round(w, 2),
                "docs_per_sec": round(docs_n[tag] / w, 1),
            }
        r1 = out["points"][f"{name}_1x"]["docs_per_sec"]
        rN = out["points"][f"{name}_10x"]["docs_per_sec"]
        out[f"{name}_throughput_ratio_10x_vs_1x"] = round(rN / r1, 3)
    print(json.dumps(out, indent=1))
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
