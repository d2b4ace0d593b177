"""Model selection: chi² feature filtering, grouped k-fold CV, randomized
hyper-parameter search and nested CV.

Reference parity (learnhtml/model_selection.py):
- ``chi2_scores`` / percentile filtering ≙ ``SelectPercentile(chi2)`` in the
  reference pipeline (model_selection.py:123, percentile grid :25-31) —
  reimplemented in numpy over the engine's (numeric ++ hashed-text) matrix.
- ``group_kfold_splits`` ≙ ``generate_grouped_splits`` (:290-293) backed by
  sklearn GroupKFold — same balanced-fold assignment algorithm.
- ``search_params`` / ``nested_cv`` ≙ :297-431 (RandomizedSearchCV over
  grouped folds; external score loop).  Candidate evaluation is
  embarrassingly parallel, so when a SparkSession is passed the
  (candidate × fold) grid fans out over the cluster with the training
  frames broadcast once — the Spark-first rendition of ``n_jobs=-1``.

Everything is deterministic given ``seed``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# chi² feature scoring (M7)
# ---------------------------------------------------------------------------

def chi2_scores(x_num, rows, slots, y, hash_dim: int) -> np.ndarray:
    """Chi² statistic per feature over the combined feature space
    [numeric columns ++ hashed slots], against binary labels ``y``.

    Matches sklearn.feature_selection.chi2 semantics: observed = per-class
    feature sums, expected = class_prob ⊗ feature_total.  Features must be
    non-negative (ours are counts, ratios and TF weights)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    n_num = x_num.shape[1] if x_num.ndim == 2 else 0
    n_feat = n_num + hash_dim

    obs_pos = np.zeros(n_feat)
    obs_neg = np.zeros(n_feat)
    if n_num:
        xm = np.clip(x_num, 0, None)
        obs_pos[:n_num] = xm[y > 0.5].sum(axis=0)
        obs_neg[:n_num] = xm[y <= 0.5].sum(axis=0)
    if len(slots):
        pos_mask = y[rows] > 0.5
        np.add.at(obs_pos, n_num + slots[pos_mask], 1.0)
        np.add.at(obs_neg, n_num + slots[~pos_mask], 1.0)

    total = obs_pos + obs_neg
    p_pos = float((y > 0.5).sum()) / max(n, 1)
    exp_pos = p_pos * total
    exp_neg = (1.0 - p_pos) * total
    with np.errstate(divide="ignore", invalid="ignore"):
        stat = np.where(exp_pos > 0, (obs_pos - exp_pos) ** 2 / exp_pos, 0.0)
        stat += np.where(exp_neg > 0, (obs_neg - exp_neg) ** 2 / exp_neg, 0.0)
    return stat


def chi2_percentile_mask(scores: np.ndarray, percentile: float) -> np.ndarray:
    """Boolean keep-mask retaining the top ``percentile``% of features by
    chi² score — sklearn SelectPercentile semantics: strictly-above-threshold
    features first, then threshold-TIED features (in index order) up to the
    ``int(n * percentile / 100)`` feature budget (sklearn
    _BaseFilter._get_support_mask; ADVICE r2 flagged the former
    strict-inequality-only behavior, which under-selected on tie plateaus)."""
    if percentile >= 100:
        return np.ones_like(scores, dtype=bool)
    thr = np.percentile(scores, 100.0 - percentile)
    mask = scores > thr
    ties = np.where(scores == thr)[0]
    if len(ties):
        max_feats = int(len(scores) * percentile / 100.0)
        kept_ties = ties[: max(max_feats - int(mask.sum()), 0)]
        mask[kept_ties] = True
    if not mask.any():  # degenerate: budget rounds to zero — keep everything
        return np.ones_like(scores, dtype=bool)
    return mask


# ---------------------------------------------------------------------------
# grouped k-fold (M9)
# ---------------------------------------------------------------------------

def group_kfold_splits(groups, total_folds: int = 10, n_folds: int | None = None):
    """GroupKFold: whole groups assigned to folds, fold sizes balanced by
    the greedy largest-group-first rule (sklearn's algorithm).  Returns
    [(train_idx, test_idx)] for the first ``n_folds`` folds."""
    groups = np.asarray(groups)
    uniq, counts = np.unique(groups, return_counts=True)
    total_folds = min(total_folds, len(uniq))
    order = np.argsort(-counts, kind="stable")
    fold_sizes = np.zeros(total_folds)
    fold_of_group: dict = {}
    for gi in order:
        f = int(np.argmin(fold_sizes))
        fold_of_group[uniq[gi]] = f
        fold_sizes[f] += counts[gi]
    fold_idx = np.array([fold_of_group[g] for g in groups])
    splits = []
    for f in range(total_folds):
        test = np.where(fold_idx == f)[0]
        train = np.where(fold_idx != f)[0]
        splits.append((train, test))
    return splits[: (n_folds or total_folds)]


# ---------------------------------------------------------------------------
# randomized search + nested CV (M9)
# ---------------------------------------------------------------------------

def f1_score(y_true, y_pred) -> float:
    y_true = np.asarray(y_true, dtype=bool)
    y_pred = np.asarray(y_pred, dtype=bool)
    tp = float((y_true & y_pred).sum())
    fp = float((~y_true & y_pred).sum())
    fn = float((y_true & ~y_pred).sum())
    if tp == 0:
        return 0.0
    return 2 * tp / (2 * tp + fp + fn)


def sample_params(param_distributions: dict, n_iter: int, seed: int) -> list[dict]:
    """Draw ``n_iter`` candidates.  Each distribution is a list (uniform
    choice) or a callable rng -> value (e.g. log-uniform lambdas)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_iter):
        cand = {}
        for k, dist in sorted(param_distributions.items()):
            cand[k] = dist(rng) if callable(dist) else dist[rng.integers(len(dist))]
        out.append(cand)
    return out


def _fit_score_one(frames, labels, train_idx, test_idx, params):
    """Fit NodeClassifier on the train documents, F1 on test documents.
    Indices are DOCUMENT indices (grouped CV splits whole docs)."""
    from learnhtml_spark.model import NodeClassifier

    tr_frames = [frames[i] for i in train_idx]
    tr_labels = [labels[i] for i in train_idx]
    clf = NodeClassifier.fit(tr_frames, tr_labels, **params)
    y_true, y_pred = [], []
    for i in test_idx:
        y_true.append(np.asarray(labels[i], dtype=bool))
        y_pred.append(np.asarray(clf.predict(frames[i]), dtype=bool))
    return f1_score(np.concatenate(y_true), np.concatenate(y_pred))


def search_params(
    frames,
    labels,
    param_distributions,
    n_iter: int = 10,
    n_folds: int = 3,
    total_folds: int | None = None,
    seed: int = 42,
    spark=None,
):
    """Randomized search over grouped folds.  ``frames``/``labels`` are
    per-document lists (the grouping unit, reference `groups=doc`).

    Returns (best_params, results_frame).  With ``spark`` given, the
    (candidate × fold) grid is evaluated cluster-parallel: the training
    data is broadcast once, each task fits one candidate on one fold —
    the reference's ``n_jobs=-1`` re-expressed as a Spark fan-out."""
    candidates = sample_params(param_distributions, n_iter, seed)
    doc_idx = np.arange(len(frames))
    splits = group_kfold_splits(
        doc_idx, total_folds=total_folds or n_folds, n_folds=n_folds
    )
    tasks = [
        (ci, fi, cand, tr, te)
        for ci, cand in enumerate(candidates)
        for fi, (tr, te) in enumerate(splits)
    ]

    if spark is not None:
        sc = spark.sparkContext
        bc = sc.broadcast((frames, labels))

        def run(task):
            ci, fi, cand, tr, te = task
            fr, lb = bc.value
            return (ci, fi, _fit_score_one(fr, lb, tr, te, cand))

        scored = (
            sc.parallelize(tasks, min(len(tasks), 64)).map(run).collect()
        )
        bc.unpersist()
    else:
        scored = [
            (ci, fi, _fit_score_one(frames, labels, tr, te, cand))
            for ci, fi, cand, tr, te in tasks
        ]

    rows = []
    by_cand: dict = {}
    for ci, fi, s in scored:
        by_cand.setdefault(ci, []).append(s)
        rows.append({"candidate": ci, "fold": fi, "f1": s, **candidates[ci]})
    mean_scores = {ci: float(np.mean(ss)) for ci, ss in by_cand.items()}
    best_ci = max(sorted(mean_scores), key=lambda ci: mean_scores[ci])
    results = pd.DataFrame(rows)
    results["mean_f1"] = results["candidate"].map(mean_scores)
    return candidates[best_ci], results


def nested_cv(
    frames,
    labels,
    param_distributions,
    n_iter: int = 10,
    internal_n_folds: int = 3,
    external_n_folds: int = 4,
    internal_total_folds: int | None = None,
    external_total_folds: int | None = None,
    seed: int = 42,
    spark=None,
):
    """Nested grouped CV (reference model_selection.py:361-431): the inner
    randomized search selects params on each external-train split; the
    refit model is scored on the untouched external-test docs.  Returns
    (scores_per_external_fold, all_inner_results).

    ``*_total_folds`` mirror the reference CLI's "N_FOLDS TOTAL_FOLDS"
    pairs (cli/script.py:96-104): split into TOTAL folds, evaluate only
    the first N of them."""
    from learnhtml_spark.model import NodeClassifier

    doc_idx = np.arange(len(frames))
    ext = group_kfold_splits(
        doc_idx,
        total_folds=external_total_folds or external_n_folds,
        n_folds=external_n_folds,
    )
    scores = []
    all_results = []
    for run_nb, (tr, te) in enumerate(ext):
        tr_frames = [frames[i] for i in tr]
        tr_labels = [labels[i] for i in tr]
        best, res = search_params(
            tr_frames,
            tr_labels,
            param_distributions,
            n_iter=n_iter,
            n_folds=internal_n_folds,
            total_folds=internal_total_folds,
            seed=seed + run_nb,
            spark=spark,
        )
        clf = NodeClassifier.fit(tr_frames, tr_labels, **best)
        y_true = np.concatenate([np.asarray(labels[i], dtype=bool) for i in te])
        y_pred = np.concatenate(
            [np.asarray(clf.predict(frames[i]), dtype=bool) for i in te]
        )
        scores.append(f1_score(y_true, y_pred))
        res["run_nb"] = run_nb
        all_results.append(res)
    return np.asarray(scores), pd.concat(all_results, ignore_index=True)


#: reference-shaped search space (model_selection.py:36-38 reciprocal C,
#: :25-31 percentile ends-weighted grid), adapted to the engine's knobs
DEFAULT_PARAM_DISTRIBUTIONS = {
    "lr": lambda rng: float(10 ** rng.uniform(-1.0, 0.3)),
    "l2": lambda rng: float(10 ** rng.uniform(-6.0, -2.0)),
    "epochs": [200, 400],
    "gbdt_rounds": [50, 100, 150],
    "gbdt_depth": [3, 4, 5],
    "chi2_percentile": [100, 97, 90, 75, 50, 25, 10],
}
