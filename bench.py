"""Benchmark harness (driver-run per round; also the scaling evidence).

Runs the flagship extraction pipeline over the interleaved-span corpus
synthesized from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) at
three parallelism levels — local[N], local[4N] and local[$SPARK_GRAFT_CPUS]
— on the same input, reporting docs/sec at each plus the N->4N scaling
efficiency (the sandbox rendition of the north rule's N vs 4N executor
criterion; see BENCH.md for why the pair sits at/below half the machine),
then times every query at full parallelism.

All timings use a noop sink (full materialization, no driver collect, no
Catalyst short-circuit via count()).

Prints ONE JSON line:
  {"metric": ..., "value": <extraction wall sec at full parallelism>,
   "unit": "sec", "queries": {name: sec}, "sf": ...,
   "docs_per_sec": {"local4": X, "local16": Y, "local32": Z},
   "scaling_efficiency": (Y/X)/4, "scaling_efficiency_full_machine": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

# single-threaded BLAS in every python worker: 32 workers x default 32
# OpenBLAS threads would thrash the box (workers inherit this env)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N -> 4N scaling pair: both levels kept at/below half the machine so the
# measurement reflects the job's scaling, not the VM's saturation zone
# (pure-CPU multiprocessing on this box already degrades ~35% per proc at
# 32 procs; 4 and 16 sit in its linear region)
SMALL = max(CPUS // 8, 1)
MID = max(CPUS // 2, SMALL * 4)

# parse sf from the dir name when possible
try:
    SF = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
except ValueError:
    SF = -1.0


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .getOrCreate()
    )


def noop_write(df):
    df.write.format("noop").mode("overwrite").save()


SPANS_TABLE = "/tmp/bench_spans_table"

#: corpus replication for the scaling measurement: the per-doc pipeline is
#: fast enough that an sf0.1 job finishes in ~1s at full parallelism, where
#: fixed local-mode costs (task dispatch, Arrow setup) mask true scaling;
#: replicating the same documents with distinct doc_ids gives a job long
#: enough to measure honestly (work per doc unchanged)
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "16"))


def materialize_spans_table(n_files: int) -> int:
    """One-time (untimed) setup: build the interleaved-span docs table the
    production pipeline would scan.  Returns doc count."""
    from pyspark.sql import functions as F

    from learnhtml_spark.corpus import synthesize_docs

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    documents = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    if REPLICATE > 1:
        documents = documents.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICATE - 1)))
        ).withColumn(
            "doc_id", F.concat_ws("_", F.col("doc_id"), F.col("rep"))
        ).drop("rep")
    n_docs = documents.count()
    synthesize_docs(documents.repartition(n_files, "doc_id")).write.mode(
        "overwrite"
    ).parquet(SPANS_TABLE)
    spark.stop()
    return n_docs


def run_extraction(spark, cores: int) -> float:
    """Wall sec for the production plan: scan spans table -> fused extract
    stage -> sink.  Zero shuffles."""
    import __spark_entry__ as E
    from learnhtml_spark.operators.extract import extract_content_spans

    docs = spark.read.parquet(SPANS_TABLE)
    pipeline = extract_content_spans(docs, E._model_bytes())
    t0 = time.time()
    noop_write(pipeline)
    return time.time() - t0


def main():
    import __spark_entry__ as E

    result = {
        "metric": "end-to-end extraction wall sec (full parallelism) on "
                  "interleaved-span corpus",
        "unit": "sec",
        "sf": SF,
        "sf_dir": SF_DIR,
        "docs_per_sec": {},
        "wall_sec": {},
    }

    n_docs = materialize_spans_table(n_files=CPUS * 4)

    # --- scaling runs: N, 4N, all cores — TWO interleaved cycles ----------
    # ambient VM noise drifts over minutes; measuring every level in two
    # separate passes and keeping the best per level de-correlates the
    # scaling ratio from when the noise happened to spike
    n_cycles = int(os.environ.get("SPARK_GRAFT_BENCH_CYCLES", "3"))
    best = {c: float("inf") for c in (SMALL, MID, CPUS)}
    cycle_walls = {c: [] for c in (SMALL, MID, CPUS)}
    for cycle in range(n_cycles):
        for cores in (SMALL, MID, CPUS):
            spark = make_session(cores)
            spark.sparkContext.setLogLevel("ERROR")
            # warm: python workers + JVM C2/Arrow paths keep improving
            # through the second job
            run_extraction(spark, cores)
            if cycle == 0:
                run_extraction(spark, cores)
            wall = min(run_extraction(spark, cores) for _ in range(2))
            best[cores] = min(best[cores], wall)
            cycle_walls[cores].append(round(wall, 2))
            if cycle == n_cycles - 1 and cores == CPUS:
                # --- per-query timings at full parallelism ---------------
                queries = {}
                for name, fn in E.queries().items():
                    t0 = time.time()
                    try:
                        noop_write(fn(spark, SF_DIR))
                        queries[name] = round(time.time() - t0, 3)
                    except Exception as e:  # pragma: no cover
                        queries[name] = f"error: {e}"
                result["queries"] = queries
            spark.stop()
    for cores, wall in best.items():
        result["docs_per_sec"][f"local{cores}"] = round(n_docs / wall, 2)
        result["wall_sec"][f"local{cores}"] = round(wall, 2)
    result["cycle_walls"] = {f"local{c}": w for c, w in cycle_walls.items()}
    result["value"] = round(best[CPUS], 3)
    result["n_docs"] = n_docs

    t_small = result["docs_per_sec"][f"local{SMALL}"]
    t_mid = result["docs_per_sec"][f"local{MID}"]
    t_full = result["docs_per_sec"][f"local{CPUS}"]
    result["scaling_efficiency"] = round((t_mid / t_small) / (MID / SMALL), 3)
    result["scaling_pair"] = f"local[{SMALL}] -> local[{MID}] (N -> 4N cores)"
    result["scaling_efficiency_full_machine"] = round(
        (t_full / t_small) / (CPUS / SMALL), 3
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
