"""Longest-common-subsequence inclusion kernel (vectorized numpy).

Replicates the semantics of the reference's Cython DP kernel
(learnhtml/dataset_conversion/lcs.pyx): same uint16 DP matrix bound
(``min(m+1, n+1) < 65535``) and the same backtrack tie-breaking, so the
per-token inclusion bits — and therefore every labeling golden — match
bit-for-bit.  The row recurrence is vectorized:

    B[j]   = max(C[i-1][j], C[i-1][j-1] + eq[j])
    C[i][j] = running-max(B[1..j])

which is equivalent to the classic recurrence because C[i][j-1] is the
prefix maximum of B (a standard LCS identity), giving O(m) numpy ops
instead of O(m*n) Python steps.
"""

from __future__ import annotations

import numpy as np


def longest_common_subsequence(x: list, y: list) -> np.ndarray:
    """Full (m+1)x(n+1) uint16 LCS DP matrix for token lists x, y."""
    m, n = len(x), len(y)
    assert min(m + 1, n + 1) < 65535
    c = np.zeros((m + 1, n + 1), dtype=np.uint16)
    if m == 0 or n == 0:
        return c

    # intern tokens to ints for fast vectorized equality
    ids: dict = {}
    xa = np.fromiter((ids.setdefault(t, len(ids)) for t in x), np.int64, m)
    ya = np.fromiter((ids.setdefault(t, len(ids)) for t in y), np.int64, n)

    prev = c[0]
    for i in range(1, m + 1):
        eq = (ya == xa[i - 1]).astype(np.uint16)
        b = np.maximum(prev[1:], prev[:-1] + eq)
        row = c[i]
        np.maximum.accumulate(b, out=row[1:])
        prev = row
    return c


def check_inclusion(x: list, y: list) -> list[bool]:
    """For each token of x, whether it participates in the LCS with y —
    identical backtrack and tie-breaks as the reference (lcs.pyx:75-100)."""
    if len(y) == 0:
        return [False] * len(x)
    c = longest_common_subsequence(x, y)
    i, j = len(x), len(y)
    ret = []
    while i > 0 or j > 0:
        if i > 0 and j > 0 and x[i - 1] == y[j - 1]:
            ret.append(True)
            i -= 1
            j -= 1
        else:
            if j > 0 and (i == 0 or c[i][j - 1] >= c[i - 1][j]):
                j -= 1
            elif i > 0 and (j == 0 or c[i][j - 1] < c[i - 1][j]):
                ret.append(False)
                i -= 1
    ret.reverse()
    return ret
