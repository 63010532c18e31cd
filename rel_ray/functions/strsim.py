"""Pairwise string similarity kernels (REL local-score feature analogs).

Jaro-Winkler runs per pair in pure Python — acceptable because pairs reach the
scorer only after LSH blocking + caps (SURVEY.md §2.8); the vectorized bulk
feature is exact n-gram Jaccard over precomputed shingle sets.
"""

from __future__ import annotations


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    match_window = max(n1, n2) // 2 - 1
    if match_window < 0:
        match_window = 0
    f1 = [False] * n1
    f2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(n2, i + match_window + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = True
                f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if f1[i]:
            while not f2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def sigmoid(x):
    """Vectorized logistic squash for raw scores (REL:src/REL/utils.py /
    torch sigmoid analog)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    """Numerically-stable softmax over candidate score vectors
    (REL ED candidate normalization analog)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    """Reference values: jaro_winkler("MARTHA","MARHTA") == 0.9611111..."""
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)
