"""Single-document extraction surface (reference extractor.py:6-44).

The distributed path is operators/extract.py; this is the convenience
wrapper for one document — same kernels, same model — returning the
positive nodes' XPaths (the reference's ``extract_from_html`` contract)
or the ordered content block texts.
"""

from __future__ import annotations

import numpy as np

from learnhtml_spark.htmlparse import getpath, parse_html
from learnhtml_spark.kernels.blockify import blocks_from_tree
from learnhtml_spark.kernels.features import extract_features_from_tree
from learnhtml_spark.model import NodeClassifier
from learnhtml_spark.training import BLOCK_STAT_COLUMNS, add_block_stats, block_stats_list


class HTMLExtractor:
    def __init__(self, model: NodeClassifier, depth: int = 5, height: int = 5):
        self.model = model
        self.depth = depth
        self.height = height

    def _score_blocks(self, html: str):
        root = parse_html(html)
        if root is None:
            return [], []
        blocks = blocks_from_tree(root, do_css=False)
        if not blocks:
            return [], []
        starts = {id(b.features["block_start_element"]) for b in blocks}
        feats = extract_features_from_tree(
            root, self.depth, self.height, select_nodes=starts
        )
        feats = add_block_stats(feats, block_stats_list(blocks))
        pred = np.asarray(self.model.predict(feats), dtype=bool)
        positive = set(feats["path"][pred])
        return blocks, positive

    def extract_from_html(self, html: str) -> list[str]:
        """XPaths of content nodes (prediction == 1), document order."""
        blocks, positive = self._score_blocks(html)
        out = []
        for b in blocks:
            p = getpath(b.features["block_start_element"])
            if p in positive and p not in out:
                out.append(p)
        return out

    def extract_text_blocks(self, html: str) -> list[str]:
        """Ordered content block texts."""
        blocks, positive = self._score_blocks(html)
        return [
            b.text
            for b in blocks
            if getpath(b.features["block_start_element"]) in positive
        ]

    @classmethod
    def load(cls, path: str, **kw) -> "HTMLExtractor":
        from learnhtml_spark.exact_model import load_any_model_path

        return cls(load_any_model_path(path), **kw)
