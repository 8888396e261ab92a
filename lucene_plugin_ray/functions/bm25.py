"""Okapi BM25 scoring — the rank-identity contract (SURVEY.md §2.9).

BASELINE.json is authoritative: Okapi BM25, k1=1.2, b=0.75, Lucene-style idf,
EXACT integer doc length |D| (token count after analysis, not Lucene's lossy
1-byte norm), ties broken by ascending docid.

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(D,Q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*|D|/avgdl))

Shared verbatim by the engine (pipelines/query.py), the brute-force oracle
(pipelines/oracle.py), and mirrored in the DuckDB oracle SQL
(__ray_entry__.oracle_sql) — one formula, three executors.

All arithmetic is float64 so the engine and the DuckDB oracle agree to ~1e-12;
compared outputs round to 4 decimals (driver value-hash).
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(df: float, n_docs: float) -> float:
    """Lucene BM25Similarity idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_scores(
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Vectorized per-posting BM25 contribution of one term (float64)."""
    tf = tfs.astype(np.float64)
    dl = doc_lens.astype(np.float64)
    w = idf(df, n_docs)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return w * (tf * (k1 + 1.0)) / denom

# SQL rendering of the same formula (DuckDB), with {tf}, {dl}, {df}, {n}, {avgdl}
# as sub-expressions.  Kept textually parallel to bm25_term_scores above.
SQL_BM25_TERM = (
    "ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    " * ({tf} * (1.2 + 1.0))"
    " / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl}))"
)
