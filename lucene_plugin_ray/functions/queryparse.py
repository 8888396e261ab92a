"""Query grammar Q1–Q7 (SURVEY.md §2.8) — the conformance subset of Lucene's
classic QueryParser (the reference delegates to it with default field "text"
and StandardAnalyzer, LuceneIndexBean.java:727-735).

Supported (the forms exercised by the reference's own tests/clients):
  Q1  single term                      ``lamb``, ``Lorem``
  Q2  field-scoped term                ``data:lamb``, ``count:32``
  Q3  term range (string-lexicographic)``age:[23 TO 23]``
  Q4  implicit multi-term (default OR) ``mary lamb``
  Q5  explicit AND / required terms    ``a AND b``, ``+a +b``
  Q7  query-side analysis              same analyzer as index side

Unsupported QueryParser syntax (phrase, wildcard, fuzzy, boost, proximity,
NOT/-, parentheses) is rejected loudly (SURVEY.md §2.8 "out of conformance
scope ... reject the rest loudly").

Scoring semantics encoded in the AST (shared by engine and oracle):
* TERM clauses score BM25;
* RANGE clauses are constant-score 1.0 (Lucene 5.2.1 MultiTermQuery
  CONSTANT_SCORE rewrite — range hits score the boost, not BM25);
* a document matches iff it matches ALL MUST clauses, or (when there are no
  MUST clauses) at least one SHOULD clause; every matching clause contributes
  to the score (Lucene BooleanQuery semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from lucene_plugin_ray.functions.analysis import analyze

DEFAULT_FIELD = "text"

MUST = "MUST"
SHOULD = "SHOULD"

_FORBIDDEN = re.compile(r'["*?~^()]|(?:^|\s)-')
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", re.S)


class QueryParseError(ValueError):
    """Raised for syntax outside the Q1–Q7 conformance subset."""


@dataclass(frozen=True)
class TermClause:
    occur: str
    field: str
    term: str


@dataclass(frozen=True)
class RangeClause:
    occur: str
    field: str
    lo: str
    hi: str


Clause = TermClause | RangeClause


def parse_query(query: str, default_field: str = DEFAULT_FIELD) -> list[Clause]:
    """Parse a query string into analyzed clauses (LRU-cached — ≙ T3, the
    reference's 1024-entry parsed-query cache, LuceneIndexBean.java:104,
    380-396; safe because clauses are frozen dataclasses).

    Returns [] when every term analyzes away (pure stop-word query → 0 hits,
    FIXTURES.md §5 'stopword').
    """
    return list(_parse_query_cached(query, default_field))


from functools import lru_cache


@lru_cache(maxsize=1024)
def _parse_query_cached(query: str, default_field: str) -> tuple[Clause, ...]:
    if query is None or not query.strip():
        raise QueryParseError("empty query")
    if _FORBIDDEN.search(query):
        raise QueryParseError(f"unsupported query syntax: {query!r}")

    # re-join bracketed ranges that whitespace-splitting broke apart
    raw = query.split()
    toks: list[str] = []
    i = 0
    while i < len(raw):
        t = raw[i]
        if "[" in t and "]" not in t:
            j = i
            merged = t
            while "]" not in merged:
                j += 1
                if j >= len(raw):
                    raise QueryParseError(f"unterminated range in {query!r}")
                merged += " " + raw[j]
            toks.append(merged)
            i = j + 1
        else:
            toks.append(t)
            i += 1

    # AND/OR connective pass: AND promotes both neighbours to MUST
    occurs: list[str | None] = []
    items: list[str] = []
    for t in toks:
        if t == "AND":
            if not items:
                raise QueryParseError("AND with no left operand")
            occurs[-1] = MUST
            occurs.append(MUST)  # placeholder for the next item
        elif t == "OR":
            if not items:
                raise QueryParseError("OR with no left operand")
            occurs.append(None)
        else:
            if len(occurs) == len(items):
                occurs.append(None)
            items.append(t)
    if len(items) != len(occurs):
        raise QueryParseError(f"dangling connective in {query!r}")

    clauses: list[Clause] = []
    for occ_override, item in zip(occurs, items):
        occur = SHOULD
        if item.startswith("+"):
            occur = MUST
            item = item[1:]
            if not item:
                raise QueryParseError("bare '+'")
        if occ_override == MUST:
            occur = MUST
        field = default_field
        m = _FIELD_RE.match(item)
        if m:
            field, item = m.group(1), m.group(2)
            if not item:
                raise QueryParseError(f"empty term for field {field!r}")
        rm = re.match(r"^\[(.+)\s+TO\s+(.+)\]$", item)
        if rm:
            lo, hi = rm.group(1).lower(), rm.group(2).lower()
            clauses.append(RangeClause(occur, field, lo, hi))
            continue
        terms = analyze(item)  # Q7: query-side analysis, same analyzer
        for term in terms:
            clauses.append(TermClause(occur, field, term))
    return tuple(clauses)
