"""Extra benchmark harness for the optimization round (guide §1.4).

NOT the graded bench — ``bench.py`` stays frozen.  This one isolates
individual declared queries with the noop sink, repeats them in one warm
session, and can dump ``explain("formatted")`` plans for the plan-diff
evidence in plans/r07/.

Usage:
  python bench_extra.py q1 q2 ...            # time queries, 3 reps each
  python bench_extra.py --reps 5 q1 ...
  python bench_extra.py --explain plans/r07 --suffix before q1 ...
  python bench_extra.py --all                # every declared query, 1 rep

Prints one JSON line: {"queries": {name: [walls...]}, "sf": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_session(cores: int):
    # mirror bench.py's session exactly so numbers are comparable
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores * 2))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .getOrCreate()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--suffix", default="now", help="plan dump suffix")
    args = ap.parse_args()

    import __spark_entry__ as E

    qs = E.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers like bench.py does
    spark.range(10_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in names:
        walls = []
        for rep in range(args.reps if not args.all else 1):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(f"# {name}: {walls}", file=sys.stderr, flush=True)
    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
    spark.stop()
    print(json.dumps({"queries": out, "sf_dir": SF_DIR, "reps": args.reps}))


if __name__ == "__main__":
    main()
