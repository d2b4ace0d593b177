"""Training utilities: label fixture/synthetic documents via the LCS path
and fit the broadcastable node classifier.

Mirrors the reference's train path (cli/script.py:117-195 +
model_selection.py:434-466): features + labels joined on node path,
blocks-only filtering is NOT applied here — we train on all nodes with
content_label as the target, which reproduces the extractor contract
(extractor.py:36-44: positive nodes' paths are the extraction)."""

from __future__ import annotations

import numpy as np

from learnhtml_spark.htmlparse import getpath, parse_html
from learnhtml_spark.kernels.blockify import blocks_from_tree
from learnhtml_spark.kernels.features import extract_features_from_tree
from learnhtml_spark.kernels.labeling import get_ratios_per_html
from learnhtml_spark.model import NodeClassifier

RATIO_THRESHOLD = 0.1

#: block-level stats merged into block rows (Kohlschütter-style densities
#: from the blockifier — the dragnet lineage the reference builds on)
BLOCK_STAT_COLUMNS = [
    "blk_link_density",
    "blk_text_density",
    "blk_tagcount",
    "blk_tagcount_since_last_block",
    "blk_anchor_count",
    "blk_min_depth_since_last_block",
    "blk_text_len",
    "blk_position",
]


def block_stats_frame(root) -> dict[str, list[float]]:
    """Per block-start-path stats from the blockifier."""
    return block_stats_list(blocks_from_tree(root, do_css=False))


def block_stats_list(blocks) -> dict[str, list[float]]:
    """Per block-start-path stats for an already-computed block list."""
    stats = {}
    for k, b in enumerate(blocks):
        path = getpath(b.features["block_start_element"])
        f = b.features
        stats[path] = [
            b.link_density,
            b.text_density,
            float(f["tagcount"]),
            float(f["tagcount_since_last_block"]),
            float(f["anchor_count"]),
            float(f["min_depth_since_last_block"]),
            float(len(b.text)),
            k / max(len(blocks) - 1, 1),
        ]
    return stats


def build_training_pair(
    html: str,
    gold_blocks: list[str],
    depth: int = 5,
    height: int = 5,
    blocks_only: bool = True,
):
    """(feature_frame, label_vector) for one document.

    ``blocks_only`` keeps only block-start nodes — the reference's training
    filter (model_selection.py:447-455, ``is_extracted_block``); these are
    also the only nodes whose prediction affects the extraction output.
    """
    root = parse_html(html, remove_comments=False, remove_pis=False)
    feats = extract_features_from_tree(root, depth, height)
    rows = get_ratios_per_html(html, gold_blocks)
    label_by_path = {p: (1 if r > RATIO_THRESHOLD else 0) for p, r, _ in rows}
    if blocks_only:
        block_paths = {p for p, r, _ in rows if r != 1e-10}
        feats = feats[feats["path"].isin(block_paths)].reset_index(drop=True)
        feats = add_block_stats(feats, block_stats_frame(root))
    y = np.asarray([label_by_path.get(p, 0) for p in feats["path"]], dtype=np.int64)
    return feats, y


def add_block_stats(feats, stats: dict) -> "object":
    """Append the blockifier's per-block stats columns to a block-row frame."""
    zeros = [0.0] * len(BLOCK_STAT_COLUMNS)
    cols = list(zip(*(stats.get(p, zeros) for p in feats["path"])))
    out = feats.copy()
    for name, vals in zip(BLOCK_STAT_COLUMNS, cols):
        out[name] = np.asarray(vals, dtype=np.float64)
    return out


def build_training_pair_exact(
    html: str, content_texts: list[str], depth: int = 5, height: int = 5
):
    """(block_feature_frame, labels) where a block is positive iff its text
    is one of ``content_texts`` — exact labeling for synthetic pages whose
    ground-truth content is known by construction (no LCS needed)."""
    root = parse_html(html, remove_comments=False, remove_pis=False)
    feats = extract_features_from_tree(root, depth, height)
    blocks = blocks_from_tree(root, do_css=False)
    want = set(content_texts)
    label_by_path = {}
    for b in blocks:
        p = getpath(b.features["block_start_element"])
        label_by_path[p] = 1 if b.text in want else 0
    feats = feats[feats["path"].isin(label_by_path)].reset_index(drop=True)
    feats = add_block_stats(feats, block_stats_frame(root))
    y = np.asarray([label_by_path[p] for p in feats["path"]], dtype=np.int64)
    return feats, y


def train(
    docs: list[tuple[str, list[str]]],
    depth: int = 5,
    height: int = 5,
    blocks_only: bool = True,
    exact_docs: list[tuple[str, list[str]]] = (),
    **fit_kw,
) -> NodeClassifier:
    """Fit the classifier on LCS-labeled (html, gold_blocks) pairs plus
    optional exactly-labeled (html, content_texts) pairs."""
    frames, labels = [], []
    for html, gold in docs:
        f, y = build_training_pair(html, gold, depth, height, blocks_only)
        frames.append(f)
        labels.append(y)
    for html, texts in exact_docs:
        f, y = build_training_pair_exact(html, texts, depth, height)
        frames.append(f)
        labels.append(y)
    return NodeClassifier.fit(frames, labels, **fit_kw)


# ---------------------------------------------------------------------------
# default training corpus (fixture pages + deterministic synthetic pages) —
# shared by scripts/train_model.py-style full training and the CLI's
# param-search surface (reference cli/script.py:117-195)
# ---------------------------------------------------------------------------

#: (html_path, corrected_path, encoding, cleaneval?) relative to
#: tests/fixtures — the reference's own public evaluation pages
FIXTURE_SPECS = [
    ("dragnet/HTML/R578.html", "dragnet/Corrected/R578.html.corrected.txt", "utf-8", False),
    ("dragnet/HTML/9.html", "dragnet/Corrected/9.html.corrected.txt", "utf-8", False),
    ("cleaneval/HTML/2.html", "cleaneval/Corrected/2.html.corrected.txt", "latin-1", True),
    ("cleaneval/HTML/1.html", "cleaneval/Corrected/1.html.corrected.txt", "latin-1", True),
]


def fixture_training_docs() -> list[tuple[str, list[str]]]:
    """(html, gold_blocks) pairs from the fixture corpus (LCS-labeled)."""
    import os

    from learnhtml_spark.kernels.tokenize import get_blocks

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix = os.path.join(repo, "tests", "fixtures")
    out = []
    for h, c, enc, ce in FIXTURE_SPECS:
        html = open(os.path.join(fix, h), encoding=enc).read()
        gold = get_blocks(
            open(os.path.join(fix, c), encoding=enc).read(), cleaneval=ce
        )
        out.append((html, gold))
    return out


def synthetic_training_docs(
    n: int = 24, sf_dir: str | None = None
) -> list[tuple[str, list[str]]]:
    """(html, content_texts) exactly-labeled pairs synthesized from the
    first ``n`` documents of the sf0.001 documents table."""
    import os

    import duckdb

    from learnhtml_spark.corpus import synthesize_page
    from learnhtml_spark.spans import html_from_spans

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_TRAIN_SF_DIR", "/root/testdata/sf0.001"
    )
    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text, lang, source from "
        f"read_parquet('{sf_dir}/documents.parquet') order by doc_id limit {n}"
    ).fetchall()
    out = []
    for doc_id, text, lang, source in rows:
        spans, expected = synthesize_page(str(doc_id), text, source, lang)
        html, _ = html_from_spans(spans)
        out.append((html, expected))
    return out


def training_frames(
    n_synth: int = 24,
    depth: int = 5,
    height: int = 5,
    blocks_only: bool = True,
    sf_dir: str | None = None,
):
    """Per-document (frames, labels) lists for the default corpus — the
    grouped-CV unit the selection module consumes."""
    frames, labels = [], []
    for html, gold in fixture_training_docs():
        f, y = build_training_pair(html, gold, depth, height, blocks_only)
        frames.append(f)
        labels.append(y)
    for html, texts in synthetic_training_docs(n_synth, sf_dir):
        f, y = build_training_pair_exact(html, texts, depth, height)
        frames.append(f)
        labels.append(y)
    return frames, labels
