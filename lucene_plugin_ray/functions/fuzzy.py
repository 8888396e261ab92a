"""Fuzzy term expansion — Damerau-Levenshtein over a sorted term dictionary.

Q10 fuzzy queries (``term~``, ``term~1``) expand against each segment's term
dictionary, like Lucene's FuzzyQuery enumerating the term index with a
Levenshtein automaton (reference accepts these through the classic
QueryParser, LuceneIndexBean.java:727-735).  We use TRUE Damerau-Levenshtein
(unrestricted transpositions) so the engine agrees exactly with DuckDB's
``damerau_levenshtein`` — the conformance oracle; documented deviation from
Lucene's automaton in functions/queryparse.py.

Scale shape: one vectorized OSA (restricted-transposition) dynamic program
over ALL length-filtered candidates at once — ``len(base) × max_len`` numpy
passes over the candidate axis, no per-term Python in the common path.  OSA
is an upper bound on true DL, and for max_edits ≤ 2 the gap is at most 1
(proof sketch in :func:`fuzzy_match_mask`), so only the thin ``osa == 3``
slice is rescreened with the exact scalar DP.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fuzzy_match_mask", "damerau_levenshtein", "osa_distances"]


def osa_distances(base: str, terms: np.ndarray, cap: int) -> np.ndarray:
    """Optimal-string-alignment distance from ``base`` to every term.

    ``terms``: object-dtype array of str.  Distances are exact up to ``cap``
    + 1; larger values may be reported as any value > cap (band-free full DP
    here — the caller length-filters first, so rows are short).
    """
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int64)
    # pad into a codepoint matrix: numpy's U-dtype is fixed-width UTF-32
    u = terms.astype(str)  # '<U{maxlen}'
    maxlen = u.dtype.itemsize // 4
    mat = u.view(np.uint32).reshape(n, maxlen)
    lens = np.count_nonzero(mat, axis=1).astype(np.int64)  # terms have no \0
    a = np.frombuffer(base.encode("utf-32-le"), dtype=np.uint32)
    m = len(a)

    # DP rows vectorized over the candidate axis
    prev2 = None
    prev = np.broadcast_to(
        np.arange(maxlen + 1, dtype=np.int32), (n, maxlen + 1)
    ).copy()
    for i in range(1, m + 1):
        cur = np.empty((n, maxlen + 1), np.int32)
        cur[:, 0] = i
        ai = a[i - 1]
        for j in range(1, maxlen + 1):
            cost = (mat[:, j - 1] != ai).astype(np.int32)
            v = np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1)
            v = np.minimum(v, prev[:, j - 1] + cost)
            if i > 1 and j > 1:
                tr = (mat[:, j - 1] == a[i - 2]) & (mat[:, j - 2] == ai)
                v = np.where(tr, np.minimum(v, prev2[:, j - 2] + 1), v)
            cur[:, j] = v
        prev2, prev = prev, cur
    return prev[np.arange(n), lens].astype(np.int64)


def damerau_levenshtein(a: str, b: str) -> int:
    """Exact TRUE Damerau-Levenshtein (unrestricted transpositions) — the
    scalar reference, identical to DuckDB's ``damerau_levenshtein``."""
    m, n = len(a), len(b)
    inf = m + n
    da: dict[str, int] = {}
    d = [[inf] * (n + 2) for _ in range(m + 2)]
    for i in range(m + 1):
        d[i + 1][1] = i
    for j in range(n + 1):
        d[1][j + 1] = j
    for i in range(1, m + 1):
        db = 0
        for j in range(1, n + 1):
            k = da.get(b[j - 1], 0)
            ll = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ll] + (i - k - 1) + 1 + (j - ll - 1),
            )
        da[a[i - 1]] = i
    return d[m + 1][n + 1]


def fuzzy_match_mask(base: str, terms: np.ndarray, max_edits: int) -> np.ndarray:
    """bool[len(terms)] — true DL distance(base, term) <= max_edits (≤ 2).

    Exactness: DL ≤ OSA always, so ``osa <= e`` accepts correctly.  For the
    converse gap: DL ≤ 1 means a single simple edit (a cost-1 transposition
    is adjacent) so OSA = DL; DL = 2 admits at most one gapped transposition
    with ONE intervening character (cost 1 + 1 gap), which OSA realises as a
    substitution + insert + delete = 3.  Hence DL ≤ 2 ⇒ OSA ≤ 3, and only
    the ``osa == e + 1 == 3`` slice can be a false negative — rescreened with
    the exact scalar DP (tiny: candidates already length-filtered to ±e).
    """
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    n = len(terms)
    if n == 0:
        return np.empty(0, bool)
    lens = np.fromiter((len(t) for t in terms), np.int64, n)
    cand = np.abs(lens - len(base)) <= max_edits
    mask = np.zeros(n, bool)
    idx = np.flatnonzero(cand)
    if idx.size == 0:
        return mask
    # Bag-distance prefilter before the O(m·maxlen) DP: every edit op
    # (sub/ins/del) changes each side's character bag by ≤ 1 and a
    # transposition by 0, so BD = max(|base|,|t|) − Σ_c min(cnt) is a true
    # lower bound on DL — rejecting BD > e is exact.  One padded-matrix
    # pass per DISTINCT base char (≪ the DP's m×maxlen passes) typically
    # prunes most length-filtered candidates, shrinking the DP input.
    if idx.size > 64 and base:
        u = terms[idx].astype(str)
        mat_w = u.dtype.itemsize // 4
        common = np.zeros(idx.size, np.int64)
        if mat_w:
            bag_mat = u.view(np.uint32).reshape(idx.size, mat_w)
            counts: dict[str, int] = {}
            for ch in base:
                counts[ch] = counts.get(ch, 0) + 1
            for ch, kc in counts.items():
                common += np.minimum(
                    np.count_nonzero(bag_mat == ord(ch), axis=1), kc
                )
        bd = np.maximum(lens[idx], len(base)) - common
        idx = idx[bd <= max_edits]
        if idx.size == 0:
            return mask
    osa = osa_distances(base, terms[idx], max_edits + 1)
    mask[idx[osa <= max_edits]] = True
    if max_edits == 2:
        for i in idx[osa == 3]:
            if damerau_levenshtein(base, str(terms[i])) <= 2:
                mask[i] = True
    return mask
