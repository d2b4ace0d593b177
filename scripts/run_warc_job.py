"""spark-submit entry point: checkpoint-resumable crawl extraction over a
WARC archive directory.

    spark-submit --py-files learnhtml_spark.zip \\
        scripts/run_warc_job.py <warc_dir> <output_base> [--run-id RUN] \\
        [--max-archives N]

One task per archive, end-to-end (WARC -> HTTP -> parse -> heuristic
extraction), output partitioned by archive with dynamic overwrite,
per-archive lineage rows.  Re-submitting the same run-id processes only
archives without an ``ok`` lineage row — including archives that landed
in the directory after the previous submit (incremental crawl catch-up).
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("warc_dir")
    ap.add_argument("output_base")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--max-archives", type=int, default=None)
    ap.add_argument(
        "--model",
        default=None,
        help="NodeClassifier artifact path: switches from the heuristic "
        "strip to the full ML extraction path",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("learnhtml-spark-warc").getOrCreate()

    # import AFTER the session exists so --py-files zips are importable
    from learnhtml_spark.sources.warc_run import write_warc_run

    model_bytes = open(args.model, "rb").read() if args.model else None
    summary = write_warc_run(
        spark, args.warc_dir, args.output_base, args.run_id,
        max_archives_per_call=args.max_archives,
        model_bytes=model_bytes,
    )
    print(
        f"run_id={args.run_id} processed={len(summary['processed'])} "
        f"skipped={len(summary['skipped'])} docs={summary['docs']} "
        f"spans={summary['spans']} errors={summary['errors']}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
