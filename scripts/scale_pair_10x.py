"""N -> 4N scaling pair measured ON the 10x corpus (1.6M interleaved-span
docs): the north rule's two-cluster-size criterion evidenced at a corpus
size where the job runs minutes, not seconds.

Protocol = bench.py's pair protocol (local[4] vs local[16], both at or
below half the machine so the VM's own saturation zone stays out of the
ratio; back-to-back runs per cycle share a noise regime; probe-bracketed;
order alternates across cycles).  Inputs come from scale_rehearsal.py's
cached spans_10x table (rebuilt if absent).

Run ALONE: python scripts/scale_pair_10x.py [n_cycles]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SPANS_10X = "/tmp/scale_rehearsal/spans_10x"


def main():
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from bench import make_session, noop_write, probe_rate

    import __spark_entry__ as E
    from learnhtml_spark.operators.extract import extract_content_spans

    if not os.path.exists(os.path.join(SPANS_10X, "_SUCCESS")):
        import scale_rehearsal

        spark = scale_rehearsal.session()
        spark.sparkContext.setLogLevel("ERROR")
        scale_rehearsal.build_inputs(spark, 10)
        spark.stop()

    model = E._model_bytes()
    out = {"corpus": SPANS_10X, "pair": "local[4] -> local[16]", "cycles": []}

    import glob

    warm_files = sorted(glob.glob(os.path.join(SPANS_10X, "part-*")))[::16]

    def run_at(cores):
        spark = make_session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        noop_write(
            extract_content_spans(spark.read.parquet(*warm_files), model)
        )
        p0 = probe_rate(16)
        t0 = time.time()
        noop_write(
            extract_content_spans(spark.read.parquet(SPANS_10X), model)
        )
        wall = time.time() - t0
        p1 = probe_rate(16)
        spark.stop()
        return round(wall, 1), [round(p0 / 1e6, 1), round(p1 / 1e6, 1)]

    n_docs = None
    for c in range(n_cycles):
        pair = (4, 16) if c % 2 == 0 else (16, 4)
        rec = {}
        for cores in pair:
            wall, probes = run_at(cores)
            rec[f"local{cores}"] = {"wall_s": wall, "probes_mops": probes}
        eff = (rec["local4"]["wall_s"] / rec["local16"]["wall_s"]) / 4.0
        rec["efficiency"] = round(eff, 3)
        out["cycles"].append(rec)
        print(json.dumps(rec), flush=True)

    effs = sorted(r["efficiency"] for r in out["cycles"])
    out["efficiency_median"] = effs[len(effs) // 2]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
