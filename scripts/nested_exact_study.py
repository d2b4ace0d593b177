"""Nested grouped CV + randomized search over the EXACT-vectorizer
pipeline (VERDICT r2 #6): the honest protocol for squeezing the 4
reference fixture pages.

Outer loop: leave-one-PAGE-out (4 folds — pages are the groups, so this
is GroupKFold at its extreme).  Inner loop: for each outer fold, a seeded
randomized search over the pipeline space

    ExactVectorizer(min_df) -> MaxAbs -> chi2 top-k -> {GBDT | MLP}

scored by inner leave-one-page-out micro-F1 on the 3 training pages
(reference protocol: model_selection.py:360-431 nested_cv with
RandomizedSearchCV inside; the chi2 top-k grid mirrors the reference's
geometric SelectPercentile distribution at model_selection.py:25-31,
expressed as feature counts over the ~40k-dim exact vocabulary).

The winning candidate per outer fold is refit on all 3 training pages and
scored on the held-out page; the pooled outer micro-F1 is the
reported-in-MODEL.md number.  No test page ever influences vectorizer
vocabularies, scaling, selection, or hyperparameters.

Run: python scripts/nested_exact_study.py   (~10-15 min, driver-side numpy)
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from learnhtml_spark.gbdt import GBDTClassifier
from learnhtml_spark.mlp import MLPClassifier
from learnhtml_spark.selection import chi2_scores, f1_score
from learnhtml_spark.vectorize import ExactVectorizer
from loo_study import fixture_frames  # scripts/ is not a package

RNG = np.random.default_rng(7)

#: candidate space — topk mirrors the reference's geometric percentile
#: spread (dense at both ends); GBDT candidates cap topk at 400 (the
#: from-scratch GBDT loops features in Python — MEMORY/gbdt note)
TOPK_MLP = [100, 250, 400, 800, 1500, 3000]
TOPK_GBDT = [100, 250, 400]


def sample_candidate(rng):
    head = rng.choice(["gbdt", "mlp"])
    cand = {
        "head": str(head),
        "min_df": int(rng.choice([1, 2])),
    }
    if head == "gbdt":
        cand.update(
            topk=int(rng.choice(TOPK_GBDT)),
            rounds=int(rng.choice([40, 80])),
            depth=int(rng.choice([3, 4])),
        )
    else:
        hiddens = [[64], [128], [64, 32]]
        cand.update(
            topk=int(rng.choice(TOPK_MLP)),
            hidden=hiddens[int(rng.integers(len(hiddens)))],
            lr=float(rng.choice([1e-3, 3e-3])),
            dropout=(None if rng.random() < 0.5 else 0.2),
            batch=int(rng.choice([64, 128])),
        )
    return cand


class VecCache:
    """ExactVectorizer fit + per-page transforms, keyed by
    (train-page-set, min_df) — the dominant cost, shared across
    candidates with the same min_df."""

    def __init__(self, frames):
        self.frames = frames
        self.store = {}

    def get(self, train_idx, min_df):
        key = (tuple(sorted(train_idx)), min_df)
        if key not in self.store:
            vec = ExactVectorizer(min_df=min_df).fit(
                [self.frames[j] for j in train_idx]
            )
            xs = [vec.transform(f) for f in self.frames]
            self.store[key] = xs
        return self.store[key]


def fit_predict(xs, labels, train_idx, test_idx, cand, seed=0):
    """Scale/select/fit on train pages, return bool predictions on the
    test page.  xs are pre-vectorized pages (train-fit vocabulary)."""
    x = np.vstack([xs[j] for j in train_idx])
    y = np.concatenate([labels[j] for j in train_idx]).astype(float)
    scale = np.abs(x).max(axis=0)
    scale[scale == 0] = 1.0
    x = x / scale
    stat = chi2_scores(x, np.zeros(0, np.int64), np.zeros(0, np.int64), y, 0)
    keep = np.argsort(-stat)[: min(cand["topk"], x.shape[1])]
    x = x[:, keep]
    n = len(y)
    pos, neg = max(y.sum(), 1.0), max(n - y.sum(), 1.0)
    sw = np.where(y > 0.5, n / (2 * pos), n / (2 * neg))
    if cand["head"] == "gbdt":
        clf = GBDTClassifier.fit(
            x, y, n_rounds=cand["rounds"], depth=cand["depth"], sample_weight=sw
        )
        pred = lambda xt: clf.predict_proba(xt) >= 0.5
    else:
        m = MLPClassifier(
            hidden_layers=cand["hidden"],
            epochs=150,
            batch_size=cand["batch"],
            lr=cand["lr"],
            dropout=cand["dropout"],
            seed=seed,
        ).fit(x, y)
        pred = lambda xt: m.predict(xt)
    xt = (xs[test_idx] / scale)[:, keep]
    return np.asarray(pred(xt), dtype=bool)


def main():
    frames, labels = fixture_frames()
    n_pages = len(frames)
    n_iter = int(os.environ.get("NESTED_N_ITER", "12"))
    candidates = [sample_candidate(RNG) for _ in range(n_iter)]
    cache = VecCache(frames)

    outer_true, outer_pred, chosen = [], [], []
    t0 = time.time()
    for i in range(n_pages):
        tr = [j for j in range(n_pages) if j != i]
        scores = []
        for cand in candidates:
            yt, yp = [], []
            for j in tr:  # inner leave-one-page-out over the 3 train pages
                inner_tr = [k for k in tr if k != j]
                xs = cache.get(inner_tr, cand["min_df"])
                yp.append(fit_predict(xs, labels, inner_tr, j, cand))
                yt.append(np.asarray(labels[j], dtype=bool))
            scores.append(
                f1_score(np.concatenate(yt), np.concatenate(yp))
            )
        best = candidates[int(np.argmax(scores))]
        chosen.append((best, max(scores)))
        xs = cache.get(tr, best["min_df"])
        outer_pred.append(fit_predict(xs, labels, tr, i, best))
        outer_true.append(np.asarray(labels[i], dtype=bool))
        print(
            f"outer fold {i}: best inner F1 {max(scores):.3f} with {best} "
            f"({time.time() - t0:.0f}s elapsed)"
        )

    f1 = f1_score(np.concatenate(outer_true), np.concatenate(outer_pred))
    per_page = [
        f1_score(t, p) for t, p in zip(outer_true, outer_pred)
    ]
    print(f"\nnested LOO micro-F1 (pooled): {f1:.3f}")
    print("per-page F1:", [round(v, 3) for v in per_page])
    print("inner-F1 of chosen candidates:", [round(s, 3) for _, s in chosen])


if __name__ == "__main__":
    main()
