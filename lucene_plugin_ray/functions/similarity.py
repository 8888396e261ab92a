"""Pluggable per-field scoring — Lucene ``IndexSearcher.setSimilarity``.

The reference runs BM25 only (BASELINE.json pins Okapi BM25 k1=1.2 b=0.75),
but Lucene's searcher accepts any ``Similarity`` and the four classics below
are the ones users actually switch to.  ``SearchEngine(similarity=...)``
mirrors the Lucene surface: similarity is a SEARCHER property, chosen at
engine construction, never persisted in the index — the same index answers
under any of them because the engine stores EXACT integer doc lengths and
term frequencies (functions/bm25.py's exactness note applies verbatim).

Implemented similarities and their per-term contracts (``tf`` = term
frequency in the doc, ``dl`` = exact doc length, ``df`` = corpus-global
document frequency, ``N`` = corpus doc count, ``ttf`` = corpus-global TOTAL
term frequency, ``sum_dl`` = corpus-global token count of the field):

* ``bm25`` — org.apache.lucene.search.similarities.BM25Similarity, the
  engine default.  w = ln(1 + (N − df + 0.5)/(df + 0.5));
  score = w · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

* ``classic`` — ClassicSimilarity (the TFIDFSimilarity default since
  queryNorm/coord were removed in LUCENE-7368): w = ln((N+1)/(df+1)) + 1;
  score = sqrt(tf) · w² · 1/sqrt(dl).  The w² shape is Lucene's
  query-weight × index-idf product; 1/sqrt(dl) is lengthNorm over the
  EXACT length (Lucene's 1-byte-lossy norm is deliberately not copied —
  same decision as BM25's exact |D|).

* ``boolean`` — BooleanSimilarity: every matching term contributes exactly
  the query boost (1.0 unboosted) regardless of tf/dl/df — a scored OR
  degenerates to a coordination count.

* ``lmdirichlet`` — LMDirichletSimilarity(mu=2000): p(t|C) = ttf/sum_dl;
  score = ln(1 + tf/(mu·p)) + ln(mu/(dl + mu)), CLAMPED at 0 per term
  (LMSimilarity.score returns ``score > 0 ? score : 0``) — so a doc can
  match with total score 0.0 and the engine's matched set must be tracked
  explicitly, not inferred from score > 0 (``positive`` False below).

* ``lmjelinekmercer`` — LMJelinekMercerSimilarity(λ=0.1):
  score = ln(1 + ((1−λ)·tf/dl)/(λ·ttf/sum_dl)) — strictly positive for a
  matching posting, so the LM clamp never binds.

* ``dfr_inl2`` — DFRSimilarity(I(n), L, H2(c=1)): tfn = tf·log2(1 +
  avgdl/dl); score = tfn/(1+tfn) · log2((N+1)/(df+0.5)).

Phrase clauses score as a pseudo-term (tf = phrase frequency): w is the SUM
of the constituent terms' weights for bm25/classic (Lucene PhraseWeight
aggregates idfs the same way); for lmdirichlet p(t|C) sums the constituent
ttfs; boolean phrases contribute the boost.  SynonymQuery groups score as
one pseudo-term with tf = Σ member tfs, df = max member df (Lucene's
SynonymQuery blend), ttf = Σ member ttfs.

Block-max strategies ('bmw'/'bmax') store BM25-specific upper bounds, so a
non-BM25 engine routes every scored query through the exact TAAT / galloping
paths (pipelines/query.py::_execute gates on ``sim.name``).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

from lucene_plugin_ray.functions.bm25 import bm25_term_scores, idf

ScoreFn = Callable[[np.ndarray, np.ndarray], np.ndarray]


class Similarity:
    """One scorer factory per similarity.  ``scorer`` binds the per-term
    corpus statistics once; the returned callable maps aligned (tfs, dls)
    posting arrays to float64 contributions — called per segment with that
    segment's rows, so the bind cost is paid once per (query term, query).

    ``needs_ttf``: phase 1 must gather corpus-global total term frequency
    (only lmdirichlet).  ``positive``: every matching posting contributes
    > 0, so `matched == score > 0` holds for pure-SHOULD levels; when
    False the boolean evaluator tracks the match set explicitly."""

    name: str = ""
    needs_ttf: bool = False
    positive: bool = True

    def scorer(
        self, df: int, ttf: int, n_docs: int, avgdl: float
    ) -> ScoreFn:
        raise NotImplementedError

    def phrase_scorer(
        self, dfs: Sequence[int], ttf_sum: int, n_docs: int, avgdl: float
    ) -> ScoreFn:
        raise NotImplementedError


class BM25Similarity(Similarity):
    name = "bm25"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = float(k1), float(b)

    def scorer(self, df, ttf, n_docs, avgdl):
        k1, b = self.k1, self.b

        def f(tfs, dls):
            return bm25_term_scores(tfs, dls, df, n_docs, avgdl, k1=k1, b=b)

        return f

    def phrase_scorer(self, dfs, ttf_sum, n_docs, avgdl):
        # PhraseQuery under BM25: w = Σ constituent idfs, BM25 shape on the
        # phrase frequency (pipelines/query.py scored phrases this way
        # before similarities became pluggable — the formula is unchanged)
        w = sum(idf(d, n_docs) for d in dfs if d > 0)
        k1, b = self.k1, self.b

        def f(tfs, dls):
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            return w * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )

        return f


def classic_idf(df: float, n_docs: float) -> float:
    """ClassicSimilarity idf: ln((N + 1)/(df + 1)) + 1 (≥ 1 since df ≤ N)."""
    return math.log((n_docs + 1.0) / (df + 1.0)) + 1.0


class ClassicSimilarity(Similarity):
    name = "classic"

    def scorer(self, df, ttf, n_docs, avgdl):
        w2 = classic_idf(df, n_docs) ** 2

        def f(tfs, dls):
            return (
                np.sqrt(tfs.astype(np.float64))
                * w2
                / np.sqrt(dls.astype(np.float64))
            )

        return f

    def phrase_scorer(self, dfs, ttf_sum, n_docs, avgdl):
        w2 = sum(classic_idf(d, n_docs) for d in dfs if d > 0) ** 2

        def f(tfs, dls):
            return (
                np.sqrt(tfs.astype(np.float64))
                * w2
                / np.sqrt(dls.astype(np.float64))
            )

        return f


class BooleanSimilarity(Similarity):
    name = "boolean"

    def scorer(self, df, ttf, n_docs, avgdl):
        def f(tfs, dls):
            return np.ones(len(tfs), dtype=np.float64)

        return f

    phrase_scorer = scorer


class LMDirichletSimilarity(Similarity):
    name = "lmdirichlet"
    needs_ttf = True
    positive = False  # common terms in short docs clamp to 0

    def __init__(self, mu: float = 2000.0):
        if mu <= 0:
            raise ValueError("mu must be positive")
        self.mu = float(mu)

    def _bound(self, ttf: int, n_docs: int, avgdl: float) -> ScoreFn:
        mu = self.mu
        # exact integer sum_dl reconstructed from (avgdl, n_docs): both are
        # derived from exact integer sums, and for sum_dl < 2^51 the float64
        # division-then-multiplication round-trips within 0.5, so round()
        # recovers the integer exactly (2^51 tokens ≈ 2 PB of text)
        sum_dl = round(avgdl * n_docs)
        if ttf <= 0 or sum_dl <= 0:
            return lambda tfs, dls: np.zeros(len(tfs), dtype=np.float64)
        mu_p = mu * (float(ttf) / float(sum_dl))

        def f(tfs, dls):
            s = np.log1p(tfs.astype(np.float64) / mu_p) + np.log(
                mu / (dls.astype(np.float64) + mu)
            )
            return np.maximum(s, 0.0)

        return f

    def scorer(self, df, ttf, n_docs, avgdl):
        return self._bound(ttf, n_docs, avgdl)

    def phrase_scorer(self, dfs, ttf_sum, n_docs, avgdl):
        return self._bound(ttf_sum, n_docs, avgdl)


class LMJelinekMercerSimilarity(Similarity):
    """LMJelinekMercerSimilarity(λ): per term
    ``ln(1 + ((1−λ)·tf/dl) / (λ·p(t|C)))`` with the house collection
    probability ``p = ttf/sum_dl`` (the lmdirichlet convention above).
    The argument of log1p is strictly positive for any matching posting
    (tf ≥ 1 ⇒ dl ≥ 1), so the LMSimilarity clamp never binds and
    ``positive`` stays True.  λ defaults to 0.1 (Lucene's short-query
    recommendation; constructor-tunable like mu)."""

    name = "lmjelinekmercer"
    needs_ttf = True

    def __init__(self, lam: float = 0.1):
        if not (0.0 < lam < 1.0):
            raise ValueError("lambda must be in (0, 1)")
        self.lam = float(lam)

    def _bound(self, ttf: int, n_docs: int, avgdl: float) -> ScoreFn:
        lam = self.lam
        sum_dl = round(avgdl * n_docs)  # exact — see LMDirichlet._bound
        if ttf <= 0 or sum_dl <= 0:
            return lambda tfs, dls: np.zeros(len(tfs), dtype=np.float64)
        lam_p = lam * (float(ttf) / float(sum_dl))

        def f(tfs, dls):
            return np.log1p(
                (1.0 - lam)
                * tfs.astype(np.float64)
                / dls.astype(np.float64)
                / lam_p
            )

        return f

    def scorer(self, df, ttf, n_docs, avgdl):
        return self._bound(ttf, n_docs, avgdl)

    def phrase_scorer(self, dfs, ttf_sum, n_docs, avgdl):
        return self._bound(ttf_sum, n_docs, avgdl)


_LOG2 = math.log(2.0)


class DFRInL2Similarity(Similarity):
    """DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2(c=1)) —
    the classic I(n)L2 divergence-from-randomness combination:

    * H2 length normalization: ``tfn = tf · log2(1 + c·avgdl/dl)``;
    * I(n) information content: ``tfn · log2((N+1)/(df+0.5))``;
    * L after-effect: ``1/(1+tfn)``;
    * score = product of the last two (boost multiplies outside, like
      every similarity here).

    Phrase pseudo-terms sum the constituent I(n) weights
    ``log2((N+1)/(df+0.5))`` (the bm25/classic summed-idf pattern) and
    normalize the PHRASE frequency."""

    name = "dfr_inl2"

    def __init__(self, c: float = 1.0):
        if c <= 0:
            raise ValueError("c must be positive")
        self.c = float(c)

    def _bound(self, w: float, avgdl: float) -> ScoreFn:
        c = self.c

        def f(tfs, dls):
            tfn = tfs.astype(np.float64) * (
                np.log1p(c * avgdl / dls.astype(np.float64)) / _LOG2
            )
            return w * tfn / (1.0 + tfn)

        return f

    def scorer(self, df, ttf, n_docs, avgdl):
        w = (
            math.log((n_docs + 1.0) / (df + 0.5)) / _LOG2 if df > 0 else 0.0
        )
        return self._bound(w, avgdl)

    def phrase_scorer(self, dfs, ttf_sum, n_docs, avgdl):
        w = sum(
            math.log((n_docs + 1.0) / (d + 0.5)) / _LOG2
            for d in dfs
            if d > 0
        )
        return self._bound(w, avgdl)


def resolve_similarity(
    spec: "str | Similarity | None", k1: float, b: float
) -> Similarity:
    """Engine-constructor resolution: None/'bm25' → BM25 with the config's
    k1/b; a Similarity INSTANCE passes through (callers tune mu etc. by
    constructing one); unknown names raise loudly."""
    if spec is None:
        return BM25Similarity(k1=k1, b=b)
    if isinstance(spec, Similarity):
        return spec
    if spec == "bm25":
        return BM25Similarity(k1=k1, b=b)
    if spec == "classic":
        return ClassicSimilarity()
    if spec == "boolean":
        return BooleanSimilarity()
    if spec == "lmdirichlet":
        return LMDirichletSimilarity()
    if spec == "lmjelinekmercer":
        return LMJelinekMercerSimilarity()
    if spec == "dfr_inl2":
        return DFRInL2Similarity()
    raise ValueError(
        f"unknown similarity {spec!r} "
        "(expected bm25 | classic | boolean | lmdirichlet | "
        "lmjelinekmercer | dfr_inl2, or a Similarity instance)"
    )
