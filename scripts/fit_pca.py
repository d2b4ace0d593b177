"""Fit a deterministic PCA projection offline and ship it as an artifact
(learnhtml_spark/artifacts/pca_components.npz) — the same constants-shipping
pattern as the IVF centroids: both the Spark kernel and the SQL oracle use
the identical component values.

Components = top-k right singular vectors of the MEAN-CENTERED id-sorted
embedding matrix (numpy SVD — deterministic for a fixed input); sign fixed
per component by making its largest-|value| entry positive.

Usage: python scripts/fit_pca.py [sf_dir] [n_components]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fit_ivf import load_embeddings_sorted

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "learnhtml_spark",
    "artifacts",
    "pca_components.npz",
)


def fit_pca(mat: np.ndarray, n_components: int):
    """(mean, components): mean is the float64 column mean of the input
    (fixed row order -> deterministic), components is (n_components x
    dims) with the sign convention above."""
    mat = np.asarray(mat, dtype=np.float64)
    mean = mat.mean(axis=0)
    _, _, vt = np.linalg.svd(mat - mean, full_matrices=False)
    comp = vt[:n_components].copy()
    for j in range(comp.shape[0]):
        i = int(np.argmax(np.abs(comp[j])))
        if comp[j, i] < 0:
            comp[j] = -comp[j]
    return mean, comp


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ids, mat = load_embeddings_sorted(sf_dir)
    mean, comp = fit_pca(mat, k)
    np.savez(ARTIFACT, mean=mean, components=comp, fit_sf_dir=np.array(sf_dir))
    print(f"fitted {k} components on {len(ids)} vectors -> {ARTIFACT}")


if __name__ == "__main__":
    main()
