"""Command-line surface (parity with the reference's click CLI:
`learnhtml dom/train/extract`, cli/script.py) re-expressed over the Spark
operators.  Run as ``python -m learnhtml_spark.cli <cmd> ...``.

Commands:
  extract   docs parquet (doc_id, spans) -> extracted span parquet
  features  docs parquet -> per-node feature parquet (reference `dom`)
  train     train the classifier from fixture + synthetic corpora
  extract-html  one HTML file -> content block texts on stdout
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_MODEL = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "model.npz"
)


def _session(cores: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("learnhtml-spark-cli")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )


def cmd_extract(args):
    from learnhtml_spark.model import NodeClassifier
    from learnhtml_spark.operators.extract import extract_content_spans
    from learnhtml_spark.sources.tables import write_extraction_run

    spark = _session(args.cores)
    docs = spark.read.parquet(args.input)
    model = NodeClassifier.load(args.model)
    if args.resume_base:
        summary = write_extraction_run(
            docs, model.to_bytes(), args.resume_base, args.run_id,
            num_buckets=args.buckets,
        )
        print(summary)
    else:
        out = extract_content_spans(
            docs, model, depth=args.depth, height=args.height,
            num_partitions=args.partitions,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")


def cmd_features(args):
    from learnhtml_spark.operators.extract import extract_node_features

    spark = _session(args.cores)
    docs = spark.read.parquet(args.input)
    out = extract_node_features(docs, depth=args.depth, height=args.height)
    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")


def cmd_train(args):
    import runpy

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runpy.run_path(
        os.path.join(repo, "scripts", "train_model.py"), run_name="__main__"
    )


def cmd_extract_html(args):
    from learnhtml_spark.extractor import HTMLExtractor

    html = open(args.file, encoding=args.encoding).read()
    ex = HTMLExtractor.load(args.model, depth=args.depth, height=args.height)
    if args.paths:
        for p in ex.extract_from_html(html):
            print(p)
    else:
        for t in ex.extract_text_blocks(html):
            print(t)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="learnhtml-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="extract content spans from a docs table")
    p.add_argument("--input", required=True)
    p.add_argument("--output")
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--height", type=int, default=5)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--cores", default="*")
    p.add_argument("--resume-base", help="bucketed sink base dir (checkpoint-resume mode)")
    p.add_argument("--run-id", default="run1")
    p.add_argument("--buckets", type=int, default=16)
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("features", help="per-node DOM feature table (reference `dom`)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--height", type=int, default=5)
    p.add_argument("--cores", default="*")
    p.set_defaults(fn=cmd_features)

    p = sub.add_parser("train", help="retrain the packaged model")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("extract-html", help="extract one local HTML file")
    p.add_argument("file")
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--paths", action="store_true", help="print XPaths instead of text")
    p.add_argument("--encoding", default="utf-8")
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--height", type=int, default=5)
    p.set_defaults(fn=cmd_extract_html)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
