"""Fit the IVF coarse quantizer offline and ship it as a repo artifact.

Production IVF indexes are built exactly this way: k-means runs once on a
corpus sample, and the resulting centroid matrix is a versioned constant
that every query-time assignment (and every correctness oracle) reuses —
the data-dependent analog of the deterministic hyperplane matrix.  This
script reads an embeddings table SORTED BY vec_id (fixing the row order
makes ``fit_ivf_centroids`` a pure function — byte-identical refits), fits
spherical k-means, and writes ``learnhtml_spark/artifacts/ivf_centroids.npz``.

Usage: python scripts/fit_ivf.py [sf_dir] [n_centroids] [n_iter]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from learnhtml_spark.functions.similarity import fit_ivf_centroids

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "learnhtml_spark",
    "artifacts",
    "ivf_centroids.npz",
)


def load_embeddings_sorted(sf_dir: str):
    """(ids, mat) sorted by vec_id, read without a Spark session (pyarrow)
    so oracles and scripts can refit/verify cheaply."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id"))
    mat = np.array(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ids, mat = load_embeddings_sorted(sf_dir)
    cent = fit_ivf_centroids(mat, n_centroids, n_iter)
    np.savez(
        ARTIFACT,
        centroids=cent,
        fit_sf_dir=np.array(sf_dir),
        n_iter=np.array(n_iter),
        n_vectors=np.array(len(ids)),
    )
    print(
        f"fitted {n_centroids} centroids ({cent.shape[1]} dims) on "
        f"{len(ids)} vectors from {sf_dir} -> {ARTIFACT}"
    )


if __name__ == "__main__":
    main()
