"""Brute-force oracle (SURVEY.md §5.2 layer 3 — the rank-identity referee).

A deliberately simple, single-process, dictionary-based implementation of the
full semantics: upsert (last-write-wins by warc_ts), deletes, collection
isolation, analysis, and Okapi BM25 (k1=1.2, b=0.75, exact |D|) with
(score desc, docid asc) tiebreaks.  It shares ONLY the pure specification
functions with the engine (analyzer, BM25 formula, docid assignment, query
grammar) — never the engine's execution code: no Arrow, no Ray, no codec, no
segments.  Engine output must match this oracle exactly (urls + rank) and to
1e-6 on scores.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow as pa

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import (
    analyze_with_positions,
    sanitize_collection,
)
from lucene_plugin_ray.functions.bm25 import idf
from lucene_plugin_ray.functions.docid import assign_docids_reference
from lucene_plugin_ray.functions.queryparse import (
    DisMaxClause,
    GroupClause,
    SynonymClause,
    MatchAllClause,
    MUST,
    MultiTermClause,
    PhraseClause,
    RangeClause,
    TermClause,
    parse_query,
)


class OracleIndex:
    """In-memory inverted index built row-at-a-time from the raw corpus."""

    def __init__(self, pages: pa.Table, cfg: IndexConfig, deletes: pa.Table | None = None):
        self.cfg = cfg
        rows = pages.to_pylist()
        # ---- upsert: last write wins by warc_ts, tiebreak max sha256(text)
        latest: dict[tuple[str, str], dict] = {}
        for r in rows:
            coll = sanitize_collection(str(r.get(cfg.collection_column) or "default"))
            url = r[cfg.url_column]
            key = (coll, url)
            ts = r[cfg.ts_column]
            tie = hashlib.sha256((r.get(cfg.text_column) or "").encode()).hexdigest()
            cur = latest.get(key)
            if cur is None or (ts, tie) > (cur["_ts"], cur["_tie"]):
                r = dict(r)
                r["_ts"], r["_tie"] = ts, tie
                latest[key] = r
        # ---- deletes (anti-join on (collection, url))
        if deletes is not None:
            for d in deletes.to_pylist():
                latest.pop((sanitize_collection(d["collection"]), d["url"]), None)

        # ---- deterministic docids (shared pure function)
        self.docids = assign_docids_reference(list(latest.keys()), cfg.num_partitions)
        self.url_of: dict[int, str] = {}
        self.coll_of: dict[int, str] = {}
        # postings[field][term] = {docid: tf}; doc_len[field][docid] = |D|
        self.postings: dict[str, dict[str, dict[int, int]]] = defaultdict(
            lambda: defaultdict(dict)
        )
        self.doc_len: dict[str, dict[int, int]] = defaultdict(dict)
        self.n_docs: dict[str, int] = defaultdict(int)  # per collection
        # full analyzed streams for phrase adjacency (Q8): (term, position)
        # with PRE-stop-filter positions (StopFilter posIncrement parity)
        self.toks: dict[str, dict[int, list[tuple[str, int]]]] = defaultdict(
            dict
        )

        for (coll, url), r in latest.items():
            docid = self.docids[(coll, url)]
            self.url_of[docid] = url
            self.coll_of[docid] = coll
            self.n_docs[coll] += 1
            for field in cfg.fields():
                val = r.get(field)
                toks = (
                    analyze_with_positions(str(val)) if val is not None else []
                )
                self.doc_len[field][docid] = len(toks)
                self.toks[field][docid] = toks
                for t, _ in toks:
                    d = self.postings[field][t]
                    d[docid] = d.get(docid, 0) + 1

    # -- global stats -----------------------------------------------------
    def _avgdl(self, field: str, coll: str) -> float:
        lens = [l for d, l in self.doc_len[field].items() if self.coll_of[d] == coll]
        return sum(lens) / len(lens) if lens else 0.0

    def _df(self, field: str, term: str, coll: str) -> int:
        return sum(1 for d in self.postings[field].get(term, {}) if self.coll_of[d] == coll)

    def _phrase_freq(self, c: PhraseClause, docid: int) -> float:
        """Phrase frequency over the analyzed stream, with PRE-stop-filter
        positions on BOTH sides (doc tokens carry them; the clause's
        ``offsets`` carry the query's).  Slop 0: overlapping exact
        occurrences counted — a start q matches iff the doc holds term i at
        position q+offsets[i] for every i.  Slop > 0 (Q14): the
        min-move-distance-per-anchor contract (queryparse module docstring)
        brute-forced independently of the engine — for every occurrence p₀
        of the first term, enumerate ALL combinations of one occurrence per
        remaining term (distinct actual positions), take the minimal
        max(pᵢ−offᵢ)−min(pᵢ−offᵢ), and sum 1/(1+d) over anchors with
        d ≤ slop."""
        from lucene_plugin_ray.functions.queryparse import phrase_offsets

        toks = self.toks[c.field].get(docid, [])
        k = len(c.terms)
        offs = phrase_offsets(c)
        if c.slop == 0:
            at = {p: t for t, p in toks}
            return sum(
                1
                for t0, p0 in toks
                if t0 == c.terms[0]
                and all(at.get(p0 + offs[i]) == c.terms[i] for i in range(1, k))
            )
        from itertools import product

        pos: dict[str, list[int]] = {}
        for t in set(c.terms):
            pos[t] = [p for x, p in toks if x == t]
        if any(not pos[t] for t in c.terms):
            return 0.0
        freq = 0.0
        rest = [
            [(p - offs[i], p) for p in pos[c.terms[i]]] for i in range(1, k)
        ]
        for p0 in pos[c.terms[0]]:
            best: int | None = None
            for combo in product(*rest):
                actual = {p0}
                valid = True
                for _, p in combo:
                    if p in actual:
                        valid = False
                        break
                    actual.add(p)
                if not valid:
                    continue
                vals = [p0] + [s for s, _ in combo]
                d = max(vals) - min(vals)
                if best is None or d < best:
                    best = d
            if best is not None and best <= c.slop:
                freq += 1.0 / (1.0 + best)
        return freq

    def _expanded_terms(self, c: MultiTermClause) -> list[str]:
        """Vocabulary terms matched by a prefix/wildcard/fuzzy clause."""
        import re

        from lucene_plugin_ray.functions.fuzzy import damerau_levenshtein

        vocab = self.postings[c.field].keys()
        if c.kind == "prefix":
            return [t for t in vocab if t.startswith(c.pattern)]
        if c.kind == "wildcard":
            rx = re.compile(
                "".join(
                    ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                    for ch in c.pattern
                ),
                re.DOTALL,
            )
            return [t for t in vocab if rx.fullmatch(t)]
        if c.kind == "regexp":
            rx = re.compile(c.pattern, re.DOTALL)
            return [t for t in vocab if rx.fullmatch(t)]
        return [
            t for t in vocab if damerau_levenshtein(c.pattern, t) <= c.max_edits
        ]

    # -- search -----------------------------------------------------------
    def search(self, query: str, collection: str = "default",
               limit: int | None = None,
               synonyms: dict[str, list[str]] | None = None,
               fields: dict[str, float] | None = None,
               tie_breaker: float = 0.0,
               min_should_match: int = 0):
        """Return [(url, score), ...] — top-k, (score desc, docid asc)."""
        from lucene_plugin_ray.functions.queryparse import (
            apply_fields,
            apply_synonyms,
        )

        cfg = self.cfg
        limit = limit if limit is not None else cfg.result_limit
        coll = sanitize_collection(collection)
        clauses = parse_query(query, default_field=cfg.text_column)
        if synonyms:
            clauses = list(apply_synonyms(tuple(clauses), synonyms))
        if fields:
            clauses = list(
                apply_fields(tuple(clauses), fields, tie_breaker, cfg.text_column)
            )
        if not clauses:
            return []
        n = self.n_docs.get(coll, 0)
        if n == 0:
            return []
        scores, matched = self._eval_clauses(
            tuple(clauses), coll, n, min_should=min_should_match
        )
        ranked = sorted(
            ((d, scores.get(d, 0.0)) for d in matched),
            key=lambda x: (-x[1], self.url_of[x[0]]),
        )
        return [(self.url_of[d], s) for d, s in ranked[:limit]]

    def _eval_clauses(
        self, clauses: tuple, coll: str, n: int, min_should: int = 0
    ) -> tuple[dict, set]:
        """(scores by doc, matched doc set) for one boolean level — the
        recursive twin of the engine's _eval_boolean (GroupClause nests)."""
        cfg = self.cfg
        musts, shoulds, nots = [], [], []
        for c in clauses:
            if c.occur == MUST:
                musts.append(c)
            elif c.occur == "MUST_NOT":
                nots.append(c)
            else:
                shoulds.append(c)

        def clause_docs(c) -> set[int]:
            if isinstance(c, TermClause):
                return {
                    d for d in self.postings[c.field].get(c.term, {}) if self.coll_of[d] == coll
                }
            if isinstance(c, PhraseClause):
                cand: set[int] | None = None
                for t in c.terms:
                    ds = {
                        d
                        for d in self.postings[c.field].get(t, {})
                        if self.coll_of[d] == coll
                    }
                    cand = ds if cand is None else (cand & ds)
                    if not cand:
                        return set()
                return {d for d in cand if self._phrase_freq(c, d) > 0}
            if isinstance(c, GroupClause):
                return self._eval_clauses(c.clauses, coll, n)[1]
            if isinstance(c, DisMaxClause):
                out: set[int] = set()
                for leg in c.clauses:
                    out |= clause_docs(leg)
                return out
            if isinstance(c, SynonymClause):
                out: set[int] = set()
                for t in c.terms:
                    out.update(
                        d
                        for d in self.postings[c.field].get(t, {})
                        if self.coll_of[d] == coll
                    )
                return out
            if isinstance(c, MultiTermClause):
                out: set[int] = set()
                for t in self._expanded_terms(c):
                    out.update(
                        d
                        for d in self.postings[c.field][t]
                        if self.coll_of[d] == coll
                    )
                return out
            if isinstance(c, MatchAllClause):
                # *:* — every doc of the collection (constant-score path
                # below contributes the boost)
                return {d for d, cc in self.coll_of.items() if cc == coll}
            assert isinstance(c, RangeClause)
            out = set()
            for t, posting in self.postings[c.field].items():
                lo_ok = (
                    c.lo is None or (t >= c.lo if c.lo_inc else t > c.lo)
                )
                hi_ok = (
                    c.hi is None or (t <= c.hi if c.hi_inc else t < c.hi)
                )
                if lo_ok and hi_ok:
                    out.update(d for d in posting if self.coll_of[d] == coll)
            return out

        if musts:
            candidates: set[int] | None = None
            for c in musts:
                ds = clause_docs(c)
                candidates = ds if candidates is None else (candidates & ds)
                if not candidates:
                    return {}, set()
        else:
            candidates = set()
            for c in shoulds:
                candidates |= clause_docs(c)
        if min_should > 0:
            from collections import Counter

            sc = Counter()
            for c in shoulds:
                for d in clause_docs(c):
                    sc[d] += 1
            candidates = {d for d in candidates if sc.get(d, 0) >= min_should}
        for c in nots:
            candidates -= clause_docs(c)
        if not candidates:
            return {}, set()

        scores: dict[int, float] = defaultdict(float)
        for c in musts + shoulds:
            if isinstance(c, TermClause):
                posting = self.postings[c.field].get(c.term, {})
                df = self._df(c.field, c.term, coll)
                if df == 0:
                    continue
                avgdl = self._avgdl(c.field, coll)
                w = idf(df, n)
                for d in candidates:
                    tf = posting.get(d)
                    if tf:
                        dl = self.doc_len[c.field][d]
                        denom = tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
                        scores[d] += (w * (tf * (cfg.k1 + 1)) / denom) * c.boost
            elif isinstance(c, SynonymClause):
                # Lucene SynonymQuery: tf summed over members, idf from the
                # MAX member df
                df = max(
                    (self._df(c.field, t, coll) for t in c.terms), default=0
                )
                if df == 0:
                    continue
                w = idf(df, n)
                avgdl = self._avgdl(c.field, coll)
                for d in candidates:
                    tf = sum(
                        self.postings[c.field].get(t, {}).get(d, 0)
                        for t in c.terms
                    )
                    if tf:
                        dl = self.doc_len[c.field][d]
                        denom = tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
                        scores[d] += (w * (tf * (cfg.k1 + 1)) / denom) * c.boost
            elif isinstance(c, PhraseClause):
                # BM25 on phrase frequency, idf = sum of per-term idfs
                # (Lucene PhraseQuery under BM25Similarity)
                w = sum(
                    idf(df, n)
                    for df in (self._df(c.field, t, coll) for t in c.terms)
                    if df > 0
                )
                avgdl = self._avgdl(c.field, coll)
                for d in candidates:
                    pf = self._phrase_freq(c, d)
                    if pf:
                        dl = self.doc_len[c.field][d]
                        denom = pf + cfg.k1 * (1 - cfg.b + cfg.b * dl / avgdl)
                        scores[d] += (w * (pf * (cfg.k1 + 1)) / denom) * c.boost
            elif isinstance(c, GroupClause):
                g_scores, g_match = self._eval_clauses(c.clauses, coll, n)
                for d in candidates:
                    if d in g_match:
                        scores[d] += g_scores.get(d, 0.0) * c.boost
            elif isinstance(c, DisMaxClause):
                # DisjunctionMaxQuery: max matching leg + tie · (Σ others)
                legs = [self._eval_clauses((leg,), coll, n) for leg in c.clauses]
                for d in candidates:
                    vals = [ls.get(d, 0.0) for ls, lm in legs if d in lm]
                    if vals:
                        m = max(vals)
                        scores[d] += (m + c.tie * (sum(vals) - m)) * c.boost
            else:
                hits = clause_docs(c)
                for d in candidates:
                    if d in hits:
                        # constant-score: range + multi-term contribute the
                        # boost (Lucene 5.x CONSTANT_SCORE rewrite)
                        scores[d] += c.boost

        # NOTE the caller (search) applies the (score desc, url asc)
        # tiebreak + top-k; this level just reports scores + matches.
        return dict(scores), candidates
