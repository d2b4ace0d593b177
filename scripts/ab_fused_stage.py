"""A/B the two remaining flagship-throughput knobs (VERDICT r4 #6):
Arrow batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`) and
fused-stage task sizing (`spark.sql.files.maxPartitionBytes` — the scan
partition count IS the task count: the extraction plan has zero
shuffles).  Each config is probe-bracketed like bench.py's protocol so a
co-tenant burst can't crown a winner.

Run from repo root, NEVER concurrently with other Spark jobs:
    python scripts/ab_fused_stage.py
Prints one JSON line per config plus a summary; writes
artifacts_ab_fused.json.
"""

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the harness: session config, spans table, probes

CPUS = bench.CPUS
REPS = int(os.environ.get("AB_REPS", "3"))
BATCH_SIZES = [256, 512, 1024, 2048]
PART_BYTES = {  # -> approx scan partitions for the ~64MB spans table
    "128KB": 128 * 1024,
    "256KB": 256 * 1024,   # current production setting (~250 parts)
    "512KB": 512 * 1024,
    "1MB": 1024 * 1024,
}


def main():
    n_docs = bench.materialize_spans_table(n_files=CPUS * 8)
    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers + JIT once
    bench.run_extraction(spark, CPUS, warm=True)
    bench.run_extraction(spark, CPUS, warm=True)

    # sweep the cross product but anchor on the current config's axes:
    # full grid for (batch x partition) would be 16 configs x reps; the
    # two knobs are independent (batch size acts inside a task, partition
    # size across tasks), so sweep each axis around the incumbent
    configs = [(b, "256KB") for b in BATCH_SIZES]
    configs += [(512, p) for p in PART_BYTES if p != "256KB"]
    # plus the promising diagonal: bigger batches with bigger partitions
    configs += [(1024, "512KB"), (2048, "512KB")]

    rates = []
    results = []
    for batch, part in configs:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(PART_BYTES[part]))
        walls, brackets = [], []
        for _ in range(REPS):
            p0 = bench.probe_rate(bench.MID)
            w = bench.run_extraction(spark, CPUS)
            p1 = bench.probe_rate(bench.MID)
            rates += [p0, p1]
            walls.append(round(w, 2))
            brackets.append([p0, p1])
        rec = {"batch": batch, "part": part, "walls": walls,
               "brackets": brackets}
        results.append(rec)
        print(json.dumps({k: rec[k] for k in ("batch", "part", "walls")}),
              flush=True)

    # flag + certify every config against the FINAL reference rate — an
    # incrementally-grown ref would judge early configs by a depressed
    # baseline and later configs by the full-run one (the cross-config
    # inconsistency bench.py's end-of-run _ref_rate protocol prevents)
    ref = bench._ref_rate(rates)
    for rec in results:
        flags = ["clean" if min(b) >= 0.94 * ref else
                 ("steady" if max(b) / min(b) <= 1.18 else "noisy")
                 for b in rec.pop("brackets")]
        quiet = [w for w, f in zip(rec["walls"], flags) if f != "noisy"]
        rec["flags"] = flags
        rec["wall_certified"] = min(quiet) if quiet else None
        rec["docs_per_sec"] = (
            round(n_docs / min(quiet), 1) if quiet else None
        )
    certified = [r for r in results if r["wall_certified"] is not None]
    best = (
        min(certified, key=lambda r: r["wall_certified"])
        if certified else None
    )
    out = {"n_docs": n_docs, "cpus": CPUS, "results": results,
           "best": ({"batch": best["batch"], "part": best["part"],
                     "wall": best["wall_certified"],
                     "docs_per_sec": best["docs_per_sec"]}
                    if best else None)}
    with open("artifacts_ab_fused.json", "w") as f:
        json.dump(out, f, indent=1)
    print("BEST:", json.dumps(out["best"]))
    spark.stop()


if __name__ == "__main__":
    main()
