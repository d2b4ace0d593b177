"""Command-line surface (parity with the reference's click CLI:
`learnhtml dom/train/extract`, cli/script.py) re-expressed over the Spark
operators.  Run as ``python -m learnhtml_spark.cli <cmd> ...``.

Commands:
  extract   docs parquet (doc_id, spans) -> extracted span parquet
  features  docs parquet -> per-node feature parquet (reference `dom`)
  train     train the classifier from fixture + synthetic corpora
  label     dragnet/cleaneval dataset dir -> per-node label parquet
            (reference `convert`, cli/utils.py:50-80)
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
    from learnhtml_spark.exact_model import load_any_model_path
    from learnhtml_spark.operators.extract import extract_content_spans
    from learnhtml_spark.sources.tables import write_extraction_run

    spark = _session(args.cores)
    docs = spark.read.parquet(args.input)
    # --model accepts either artifact kind: the hashed production model
    # (model.npz) or the exact-vectorizer pipeline (exact.npz,
    # scripts/train_exact_model.py — MODEL.md's measured-better config)
    model = load_any_model_path(args.model)
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


def cmd_label(args):
    """Dataset conversion/labeling (reference cli/utils.py:50-80 `convert`):
    a dragnet/cleaneval-layout directory (HTML/*.html +
    Corrected/*.corrected.txt) -> per-node label parquet via the LCS
    labeling operator.  File reads are distributed (binaryFile source);
    decoding/gold-block parsing runs inside the Arrow batch."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    from learnhtml_spark.operators.extract import label_documents
    from learnhtml_spark.schemas import SPAN

    spark = _session(args.cores)
    enc = "latin-1" if args.cleaneval else "utf-8"
    cleaneval = bool(args.cleaneval)

    html = (
        spark.read.format("binaryFile")
        .load(os.path.join(args.dataset, "HTML", "*.html"))
        .select(
            F.regexp_extract("path", r"([^/]+)\.html$", 1).alias("doc_id"),
            F.col("content").alias("raw_html"),
        )
    )
    gold = (
        spark.read.format("binaryFile")
        .load(os.path.join(args.dataset, "Corrected", "*.corrected.txt"))
        .select(
            F.regexp_extract(
                "path", r"([^/]+?)(?:\.html)?\.corrected\.txt$", 1
            ).alias("doc_id"),
            F.col("content").alias("raw_gold"),
        )
    )
    joined = html.join(gold, "doc_id")

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("spans", ArrayType(SPAN)),
            StructField("gold_blocks", ArrayType(StringType())),
        ]
    )

    def gen(batches):
        from learnhtml_spark.kernels.tokenize import get_blocks

        for pdf in batches:
            rows = []
            for doc_id, raw_html, raw_gold in zip(
                pdf["doc_id"], pdf["raw_html"], pdf["raw_gold"]
            ):
                page = bytes(raw_html).decode(enc, errors="replace")
                blocks = get_blocks(
                    bytes(raw_gold).decode(enc, errors="replace"),
                    cleaneval=cleaneval,
                )
                spans = [
                    {"kind": "html", "text": page, "media_ref": None, "offset": 0}
                ]
                rows.append((doc_id, spans, blocks))
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "gold_blocks"])

    labels = label_documents(joined.mapInPandas(gen, schema=schema))
    labels.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")


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

    p = sub.add_parser(
        "label",
        help="convert+label a dragnet/cleaneval dataset dir (reference `convert`)",
    )
    p.add_argument("dataset", help="dir with HTML/ and Corrected/ subdirs")
    p.add_argument("--output", required=True)
    p.add_argument("--cleaneval", action="store_true",
                   help="cleaneval layout/encoding (default dragnet)")
    p.add_argument("--cores", default="*")
    p.set_defaults(fn=cmd_label)

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
