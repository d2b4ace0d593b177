"""Archive-count scaling rehearsal for the resumable WARC extraction run
(sources/warc_run.py): 10× the archive count of the driver corpus (500
archives × 100 docs = 50k pages, both .warc and multi-member .warc.gz),
then the two walls that matter at 100 TB:

- full-run wall (all archives pending) — the per-archive task model;
- catch-up wall after ONE new archive lands — must be dominated by the
  listing + one archive's work, NOT by corpus size (completed archives
  are pruned before any content byte is read).

Run ALONE on a quiet box: python scripts/warc_scale_rehearsal.py
Writes artifacts_warc_scale_r6.json.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ARCHIVES = 500
DOCS_PER = 100
BASE = "/tmp/learnhtml_warc_rehearsal"


def build_corpus():
    from learnhtml_spark.sources.warc_source import build_warc

    d = os.path.join(BASE, "in")
    marker = os.path.join(d, "_BUILT")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for fno in range(N_ARCHIVES):
        ids = [f"r{fno}_{i}" for i in range(DOCS_PER)]
        gz = fno % 2 == 1
        name = f"part-{fno:05d}.warc" + (".gz" if gz else "")
        with open(os.path.join(d, name), "wb") as f:
            f.write(build_warc(ids, gz))
    open(marker, "w").write("ok\n")
    return d


def main():
    import bench

    from learnhtml_spark.sources.warc_run import write_warc_run
    from learnhtml_spark.sources.warc_source import build_warc

    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warc_dir = build_corpus()
    out_base = os.path.join(BASE, "out")
    shutil.rmtree(out_base, ignore_errors=True)

    t0 = time.time()
    s1 = write_warc_run(spark, warc_dir, out_base, "r1")
    full_wall = time.time() - t0

    t0 = time.time()
    s2 = write_warc_run(spark, warc_dir, out_base, "r1")
    noop_wall = time.time() - t0

    with open(os.path.join(warc_dir, "part-99999.warc"), "wb") as f:
        f.write(build_warc(["late_a", "late_b"], gz=False))
    t0 = time.time()
    s3 = write_warc_run(spark, warc_dir, out_base, "r1")
    catchup_wall = time.time() - t0
    os.remove(os.path.join(warc_dir, "part-99999.warc"))

    rec = {
        "cpus": CPUS,
        "archives": N_ARCHIVES,
        "docs": s1["docs"],
        "spans": s1["spans"],
        "full_run_wall_s": round(full_wall, 2),
        "docs_per_sec": round(s1["docs"] / full_wall, 1),
        "noop_resume_wall_s": round(noop_wall, 2),
        "catchup_1_archive_wall_s": round(catchup_wall, 2),
        "processed": [len(s1["processed"]), len(s2["processed"]),
                      len(s3["processed"])],
    }
    print(json.dumps(rec, indent=1))
    with open("artifacts_warc_scale_r6.json", "w") as f:
        json.dump(rec, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
