"""Minimal vectorized gradient-boosted decision trees (binary logloss).

The north-star model is a broadcast gradient-boosted node classifier
(reference trains sklearn tree ensembles / LightGBM-style models,
model_selection.py:80-93).  No sklearn/LightGBM exists in this
environment, so this is a from-scratch numpy GBDT:

- exact greedy splits over pre-sorted feature columns (argsort once,
  gain scan fully vectorized per feature),
- depth-limited regression trees on the logloss gradient/hessian
  (XGBoost-style gain with lambda regularization),
- dense numpy arrays only; a fitted model is a few small arrays per
  tree — trivially picklable for Spark broadcast.

Designed for the node-classification workload: hundreds-to-thousands of
rows per fit, ~100 numeric features; scoring is vectorized and fast
inside the extraction UDF.
"""

from __future__ import annotations

import numpy as np


class _Tree:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, n_nodes):
        self.feature = np.full(n_nodes, -1, dtype=np.int32)
        self.threshold = np.zeros(n_nodes, dtype=np.float64)
        self.left = np.full(n_nodes, -1, dtype=np.int32)
        self.right = np.full(n_nodes, -1, dtype=np.int32)
        self.value = np.zeros(n_nodes, dtype=np.float64)

    def predict(self, x: np.ndarray) -> np.ndarray:
        idx = np.zeros(len(x), dtype=np.int32)
        while True:
            feat = self.feature[idx]
            leaf = feat < 0
            if leaf.all():
                return self.value[idx]
            go_left = np.where(
                leaf, True, x[np.arange(len(x)), np.maximum(feat, 0)] <= self.threshold[idx]
            )
            nxt = np.where(go_left, self.left[idx], self.right[idx])
            idx = np.where(leaf, idx, nxt).astype(np.int32)


def _best_split(x, g, h, rows, lam):
    """Best (feature, threshold, gain) for the row subset; vectorized scan
    of sorted prefix sums per feature."""
    best = (None, 0.0, 0.0)
    gs, hs = g[rows], h[rows]
    g_tot, h_tot = gs.sum(), hs.sum()
    parent = g_tot * g_tot / (h_tot + lam)
    xr = x[rows]
    n = len(rows)
    if n < 2:
        return best
    order = np.argsort(xr, axis=0, kind="stable")
    for f in range(x.shape[1]):
        o = order[:, f]
        xv = xr[o, f]
        gl = np.cumsum(gs[o])[:-1]
        hl = np.cumsum(hs[o])[:-1]
        valid = xv[:-1] < xv[1:]  # split between distinct values only
        if not valid.any():
            continue
        gr = g_tot - gl
        hr = h_tot - hl
        gain = gl * gl / (hl + lam) + gr * gr / (hr + lam) - parent
        gain = np.where(valid, gain, -np.inf)
        k = int(np.argmax(gain))
        if gain[k] > best[2]:
            best = (f, (xv[k] + xv[k + 1]) / 2.0, float(gain[k]))
    return best


def _build_tree(x, g, h, rows, depth, lam, min_rows):
    nodes = []

    def new_node():
        nodes.append([-1, 0.0, -1, -1, 0.0])
        return len(nodes) - 1

    def grow(rows, d):
        ni = new_node()
        if d >= depth or len(rows) < min_rows:
            nodes[ni][4] = -g[rows].sum() / (h[rows].sum() + lam)
            return ni
        f, t, gain = _best_split(x, g, h, rows, lam)
        if f is None or gain <= 1e-12:
            nodes[ni][4] = -g[rows].sum() / (h[rows].sum() + lam)
            return ni
        mask = x[rows, f] <= t
        li = grow(rows[mask], d + 1)
        ri = grow(rows[~mask], d + 1)
        nodes[ni][0] = f
        nodes[ni][1] = t
        nodes[ni][2] = li
        nodes[ni][3] = ri
        return ni

    grow(rows, 0)
    tree = _Tree(len(nodes))
    for i, (f, t, l, r, v) in enumerate(nodes):
        tree.feature[i] = f
        tree.threshold[i] = t
        tree.left[i] = l
        tree.right[i] = r
        tree.value[i] = v
    return tree


class GBDTClassifier:
    """Binary-logloss gradient boosting; predict_proba over a dense matrix."""

    def __init__(self, trees=None, learning_rate=0.2, base_score=0.0):
        self.trees = trees or []
        self.learning_rate = learning_rate
        self.base_score = base_score

    @classmethod
    def fit(
        cls,
        x: np.ndarray,
        y: np.ndarray,
        n_rounds: int = 120,
        depth: int = 4,
        learning_rate: float = 0.2,
        lam: float = 1.0,
        min_rows: int = 2,
        sample_weight: np.ndarray | None = None,
    ) -> "GBDTClassifier":
        x = np.ascontiguousarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        w = (
            np.ones_like(y)
            if sample_weight is None
            else np.asarray(sample_weight, dtype=np.float64)
        )
        p0 = min(max(y.mean(), 1e-6), 1 - 1e-6)
        base = float(np.log(p0 / (1 - p0)))
        z = np.full(len(y), base)
        trees = []
        rows_all = np.arange(len(y))
        for _ in range(n_rounds):
            p = 1.0 / (1.0 + np.exp(-z))
            g = (p - y) * w
            h = np.maximum(p * (1 - p) * w, 1e-12)
            tree = _build_tree(x, g, h, rows_all, depth, lam, min_rows)
            step = tree.predict(x)
            z = z + learning_rate * step
            trees.append(tree)
            # early exit when perfectly fit
            if ((p >= 0.5) == (y >= 0.5)).all() and np.abs(p - y).max() < 1e-3:
                break
        return cls(trees, learning_rate, base)

    def decision_function(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float64)
        z = np.full(len(x), self.base_score)
        for t in self.trees:
            z += self.learning_rate * t.predict(x)
        return z

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-np.clip(self.decision_function(x), -30, 30)))

    # -- serialization -------------------------------------------------------
    # trees are packed into SIX flat arrays (not per-tree entries): a
    # 150-tree model as per-tree npz members costs ~200ms per np.load —
    # measured as the dominant cost of per-task model deserialization on
    # executors — while the packed form loads in single-digit ms.
    def to_arrays(self) -> dict:
        sizes = np.asarray([len(t.feature) for t in self.trees], dtype=np.int64)
        return {
            "learning_rate": np.float64(self.learning_rate),
            "base_score": np.float64(self.base_score),
            "tree_sizes": sizes,
            "pk_feature": np.concatenate([t.feature for t in self.trees])
            if self.trees
            else np.zeros(0, np.int32),
            "pk_threshold": np.concatenate([t.threshold for t in self.trees])
            if self.trees
            else np.zeros(0),
            "pk_left": np.concatenate([t.left for t in self.trees])
            if self.trees
            else np.zeros(0, np.int32),
            "pk_right": np.concatenate([t.right for t in self.trees])
            if self.trees
            else np.zeros(0, np.int32),
            "pk_value": np.concatenate([t.value for t in self.trees])
            if self.trees
            else np.zeros(0),
        }

    @classmethod
    def from_arrays(cls, data) -> "GBDTClassifier":
        sizes = np.asarray(data["tree_sizes"], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        trees = []
        feature = np.asarray(data["pk_feature"])
        threshold = np.asarray(data["pk_threshold"])
        left = np.asarray(data["pk_left"])
        right = np.asarray(data["pk_right"])
        value = np.asarray(data["pk_value"])
        for i in range(len(sizes)):
            a, b = offsets[i], offsets[i + 1]
            t = _Tree(int(sizes[i]))
            t.feature = feature[a:b]
            t.threshold = threshold[a:b]
            t.left = left[a:b]
            t.right = right[a:b]
            t.value = value[a:b]
            trees.append(t)
        return cls(trees, float(data["learning_rate"]), float(data["base_score"]))
