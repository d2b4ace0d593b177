"""Tests for model selection (M7 chi² filter, M9 grouped CV + randomized
search + nested CV) — reference learnhtml/model_selection.py:123,291-431."""

import numpy as np
import pytest


def test_group_kfold_splits_properties():
    from learnhtml_spark.selection import group_kfold_splits

    groups = np.array([g for g in "aabbbccddeeff" for _ in range(2)])
    splits = group_kfold_splits(groups, total_folds=3)
    assert len(splits) == 3
    all_test = []
    for train, test in splits:
        # no group straddles train/test
        assert not set(groups[train]) & set(groups[test])
        # partition covers everything
        assert len(train) + len(test) == len(groups)
        all_test.extend(test.tolist())
    # every row appears in exactly one test fold
    assert sorted(all_test) == list(range(len(groups)))


def test_group_kfold_balanced():
    from learnhtml_spark.selection import group_kfold_splits

    groups = np.repeat(np.arange(10), 7)
    splits = group_kfold_splits(groups, total_folds=5)
    sizes = [len(test) for _, test in splits]
    assert max(sizes) - min(sizes) <= 7  # one group granularity


def test_chi2_scores_ranks_informative_feature():
    from learnhtml_spark.selection import chi2_percentile_mask, chi2_scores

    rng = np.random.default_rng(0)
    n = 400
    y = (rng.random(n) > 0.5).astype(float)
    # numeric col 0 tracks the label, col 1 is noise
    x_num = np.column_stack([y + 0.05 * rng.random(n), rng.random(n)])
    # hashed slot 3 fires only on positives, slot 7 uniformly
    rows = np.concatenate([np.where(y > 0.5)[0], np.arange(n)])
    slots = np.concatenate(
        [np.full(int(y.sum()), 3), np.full(n, 7)]
    ).astype(np.int64)
    stat = chi2_scores(x_num, rows, slots, y, hash_dim=16)
    assert stat[0] > stat[1]           # informative numeric beats noise
    assert stat[2 + 3] > stat[2 + 7]   # informative slot beats uniform slot
    mask = chi2_percentile_mask(stat, 15)
    assert mask[0] and mask[2 + 3]
    assert mask.sum() < len(mask)


def test_fit_with_chi2_percentile_still_learns():
    import pandas as pd

    from learnhtml_spark.model import NodeClassifier

    rng = np.random.default_rng(1)
    frames, labels = [], []
    for d in range(6):
        n = 30
        y = (rng.random(n) > 0.6).astype(float)
        f = pd.DataFrame(
            {
                "path": [f"/p{i}" for i in range(n)],
                "tag": np.where(y > 0.5, "p", "a"),
                "class_text": np.where(y > 0.5, "article body", "nav menu"),
                "id_text": "",
                "text_len": y * 50 + rng.integers(0, 5, n),
                "noise": rng.random(n),
            }
        )
        frames.append(f)
        labels.append(y)
    clf = NodeClassifier.fit(
        frames, labels, epochs=60, gbdt_rounds=10, chi2_percentile=50
    )
    acc = np.mean(
        [
            (np.asarray(clf.predict(f)) == (l > 0.5)).mean()
            for f, l in zip(frames, labels)
        ]
    )
    assert acc > 0.95


def test_chi2_percentile_mask_tie_handling():
    """sklearn SelectPercentile semantics: threshold-tied features are
    added (in index order) up to the int(n*p/100) budget (ADVICE r2)."""
    from learnhtml_spark.selection import chi2_percentile_mask

    # 2 strictly-positive scores, 8 tied at zero; 50% of 10 = budget 5:
    # both positives plus the first 3 zero-ties must be kept
    scores = np.array([5.0, 3.0] + [0.0] * 8)
    mask = chi2_percentile_mask(scores, 50)
    assert mask.sum() == 5
    assert mask[0] and mask[1] and mask[2] and mask[3] and mask[4]
    assert not mask[5:].any()


def test_num_mask_train_serve_parity():
    """Chi2-dropped numeric columns must be zeroed at inference too —
    otherwise heads with nonzero weights on never-trained inputs (MLP
    Xavier init) see garbage at predict time (ADVICE r2)."""
    import pandas as pd

    from learnhtml_spark.model import NodeClassifier, _numeric_columns

    rng = np.random.default_rng(3)
    n = 40
    y = (rng.random(n) > 0.5).astype(float)
    frame = pd.DataFrame(
        {
            "path": [f"/p{i}" for i in range(n)],
            "tag": np.where(y > 0.5, "p", "a"),
            "class_text": "",
            "id_text": "",
            "signal": y * 10 + rng.random(n),
            "junk": rng.random(n),
        }
    )
    clf = NodeClassifier.fit(
        [frame], [y], epochs=30, gbdt_rounds=5,
        head="mlp", mlp_params={"hidden_layers": [8], "epochs": 30},
    )
    # force a dropped numeric column and check the serving-side mask
    num_cols = _numeric_columns(frame)
    clf.num_mask = np.ones(len(num_cols))
    clf.num_mask[num_cols.index("junk")] = 0.0
    base = clf.predict_proba(frame)
    poisoned = frame.copy()
    poisoned["junk"] = 1e6  # wild values in the dropped column
    assert np.allclose(clf.predict_proba(poisoned), base)

    # num_mask survives the npz roundtrip (gbdt head — the packaged path)
    clf2 = NodeClassifier.fit(
        [frame], [y], epochs=30, gbdt_rounds=5, chi2_percentile=50
    )
    if clf2.num_mask is None:
        clf2.num_mask = np.array([1.0, 0.0])
    restored = NodeClassifier.from_bytes(clf2.to_bytes())
    assert restored.num_mask is not None
    assert np.array_equal(restored.num_mask, clf2.num_mask)


def test_search_params_picks_better_candidate():
    import pandas as pd

    from learnhtml_spark.selection import search_params

    rng = np.random.default_rng(2)
    frames, labels = [], []
    for d in range(6):
        n = 24
        y = (rng.random(n) > 0.5).astype(float)
        frames.append(
            pd.DataFrame(
                {
                    "path": [f"/p{i}" for i in range(n)],
                    "tag": np.where(y > 0.5, "p", "a"),
                    "class_text": "",
                    "id_text": "",
                    "density": y * 10 + rng.random(n),
                }
            )
        )
        labels.append(y)
    # candidate space: epochs=0 (degenerate) vs epochs=80 (learns)
    dists = {"epochs": [0, 80], "gbdt_rounds": [5], "lr": [0.5]}
    best, results = search_params(
        frames, labels, dists, n_iter=4, n_folds=3, seed=0
    )
    assert best["epochs"] == 80
    assert {"candidate", "fold", "f1", "mean_f1"} <= set(results.columns)


def test_nested_cv_shapes():
    import pandas as pd

    from learnhtml_spark.selection import nested_cv

    rng = np.random.default_rng(3)
    frames, labels = [], []
    for d in range(8):
        n = 20
        y = (rng.random(n) > 0.5).astype(float)
        frames.append(
            pd.DataFrame(
                {
                    "path": [f"/p{i}" for i in range(n)],
                    "tag": np.where(y > 0.5, "p", "a"),
                    "class_text": "",
                    "id_text": "",
                    "density": y * 10 + rng.random(n),
                }
            )
        )
        labels.append(y)
    scores, results = nested_cv(
        frames,
        labels,
        {"epochs": [40], "gbdt_rounds": [5]},
        n_iter=1,
        internal_n_folds=2,
        external_n_folds=3,
        seed=0,
    )
    assert len(scores) == 3
    assert (scores > 0.8).all()  # separable synthetic data
    assert set(results["run_nb"]) == {0, 1, 2}
