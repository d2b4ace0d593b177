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
