"""Distributed training-data generation + model fit.

The reference builds its training matrix by merging a features csv with a
labels csv on (url, path) (J1, cli/utils.py:27-47) after dask-parallel
feature/label extraction.  This script is the Spark rendition at corpus
scale:

    docs table ──┬─ extract_node_features ──┐
                 └─ label_documents ────────┴─ join on (doc_id, path)
                      → grouped train/holdout split by portable doc hash
                      → block rows to the driver → NodeClassifier.fit

Feature/label generation and the join are fully distributed; the final
fit is driver-side numpy (the collected block-row matrix is tiny relative
to the corpus — ~25 rows per document — and the reference's nested CV was
single-node too).  Usage: python scripts/train_distributed.py [n_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main(n_docs: int = 300):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    from learnhtml_spark.model import NodeClassifier
    from learnhtml_spark.operators.extract import (
        extract_node_features,
        label_documents,
    )
    from learnhtml_spark.schemas import SPAN
    from learnhtml_spark.training import BLOCK_STAT_COLUMNS  # noqa: F401

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # synthesize docs + gold in one distributed pass
    documents = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .orderBy("doc_id")
        .limit(n_docs)
    )
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("spans", ArrayType(SPAN)),
            StructField("gold_blocks", ArrayType(StringType())),
        ]
    )

    def gen(batches):
        from learnhtml_spark.corpus import synthesize_page

        for pdf in batches:
            rows = []
            for doc_id, text, lang, source in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                spans, expected = synthesize_page(str(doc_id), text, source, lang)
                rows.append((str(doc_id), spans, expected))
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "gold_blocks"])

    with_gold = documents.select("doc_id", "text", "lang", "source").mapInPandas(
        gen, schema=schema
    )
    with_gold = with_gold.repartition(32, "doc_id").cache()

    t0 = time.time()
    feats = extract_node_features(with_gold.select("doc_id", "spans"), depth=5, height=5)
    labels = label_documents(with_gold)

    # J1: distributed equi-join of features and labels on (doc_id, path),
    # block rows only (reference P4 filter)
    joined = feats.join(
        labels.withColumnRenamed("node_path", "path"),
        on=["doc_id", "path"],
    ).filter(F.col("is_extracted_block"))

    # grouped split by portable doc hash (reference O2/M9: whole documents
    # go to one side, never split)
    bucket = (F.abs(F.xxhash64("doc_id")) % 100)
    train_rows = joined.filter(bucket < 80).drop(
        "is_extracted_block", "ratio", "block_text"
    )
    pdf = train_rows.toPandas()
    print(
        f"distributed features+labels+join: {time.time() - t0:.1f}s, "
        f"{len(pdf)} training block rows from {n_docs} docs"
    )

    y = pdf.pop("content_label").astype(int).to_numpy()
    pdf = pdf.drop(columns=["doc_id"])
    # block stats are not part of this demonstration path (the packaged
    # model uses them); fit on the node features alone
    t0 = time.time()
    model = NodeClassifier.fit([pdf], [y], epochs=300, lr=1.0, l2=1e-5,
                               gbdt_rounds=120, gbdt_depth=4)
    pred = model.predict(pdf)
    acc = float((pred == y).mean())
    print(f"fit: {time.time() - t0:.1f}s, train accuracy {acc:.4f}, "
          f"trees {len(model.gbdt.trees)}")

    out = "/tmp/model_distributed.npz"
    model.save(out)
    print("saved", out)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
