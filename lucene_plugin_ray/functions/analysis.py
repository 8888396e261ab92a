"""Analyzer — the single source of truth for tokenization (SURVEY.md §2.2 M4).

Re-expresses the reference's StandardAnalyzer behavior (Lucene 5.2.1
StandardAnalyzer constructed at LuceneIndexBean.java:666,730): word-break,
lowercase, the fixed 33-word English stop set, max token length 255.

The analyzer defines BOTH the term universe and per-doc token counts
(doc_len), so it must be bit-deterministic and shared verbatim by:
  * the index build (vectorized Arrow path, :func:`tokenize_column`),
  * query-side analysis (:func:`analyze`, ≙ LuceneIndexBean.java:730-734 —
    same analyzer for index and query, so ``Lorem`` matches ``lorem``),
  * the brute-force oracle (pipelines/oracle.py),
  * the DuckDB oracle SQL (__ray_entry__.oracle_sql — the SQL fragment in
    :data:`SQL_TOKENIZE_SPEC` implements the identical spec).

Tokenization spec (documented simplification of UAX#29, SURVEY.md §7.4
"Tokenizer fidelity"): tokens are maximal runs of ``[a-z0-9]`` over the
lowercased text; everything else is a separator.  This matches
StandardTokenizer exactly on plain alphanumeric English text (the whole
reference test corpus, TestSearch*.java) and diverges only on intra-word
punctuation (``can't``, ``3.14``) and non-Latin scripts, which the reference
tests never exercise.  The divergence is pinned by unit tests so any future
tightening is deliberate.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Lucene's StopAnalyzer.ENGLISH_STOP_WORDS_SET — the 33-word default stop set
# used by StandardAnalyzer (the analyzer the reference constructs at
# LuceneIndexBean.java:666).
STOP_WORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    }
)

# StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH
MAX_TOKEN_LENGTH = 255

# Separator pattern: anything that is not [a-z0-9] after lowercasing.
# Kept RE2-compatible so the IDENTICAL pattern runs in pyarrow.compute
# (split_pattern_regex), Python `re`, and DuckDB (string_split_regex).
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)

# The same spec as a DuckDB SQL fragment (used by __ray_entry__.oracle_sql):
#   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
#   ... WHERE term <> '' AND length(term) <= 255 AND term NOT IN (STOP_WORDS)
SQL_STOPWORD_LIST = "(" + ", ".join(f"'{w}'" for w in sorted(STOP_WORDS)) + ")"
SQL_TOKENIZE_SPEC = (
    "unnest(string_split_regex(lower({col}), '[^a-z0-9]+')) AS term"
)

_STOP_ARRAY = pa.array(sorted(STOP_WORDS), type=pa.string())

# Characters the reference strips from collection names at every entry point
# (LuceneIndexBean.java:553-586; applied at 206,292,318,388,468,517).
_COLLECTION_STRIP = '+-!(){}[]^"~*?:\\'
_COLLECTION_TRANS = str.maketrans("", "", _COLLECTION_STRIP)


def sanitize_collection(name: str) -> str:
    """M5 collection-name sanitizer: strip Lucene query-special characters.

    ≙ LuceneIndexBean.escape() (LuceneIndexBean.java:553-586), which *removes*
    (not escapes) the characters ``+ - ! ( ) { } [ ] ^ " ~ * ? : \\``.
    """
    return name.translate(_COLLECTION_TRANS)


def analyze(text: str) -> list[str]:
    """Reference Python tokenizer: lowercase → split → drop empty/stop/long.

    Used by query parsing and the brute-force oracle.  MUST stay semantically
    identical to :func:`tokenize_column` (property-tested in
    tests/test_analysis.py).
    """
    out = []
    for tok in _SPLIT_RE.split(text.lower()):
        if tok and len(tok) <= MAX_TOKEN_LENGTH and tok not in STOP_WORDS:
            out.append(tok)
    return out


def tokenize_column(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized Arrow tokenizer for one batch column.

    Returns ``(parent_index, terms, doc_len)`` where

    * ``parent_index``: int64 np.ndarray, row index (within the batch) of each
      surviving token, non-decreasing;
    * ``terms``: the surviving tokens as a pyarrow StringArray (same length);
    * ``doc_len``: int32 np.ndarray of per-row surviving-token counts (exact
      |D| for BM25, SURVEY.md §2.9 — NOT Lucene's lossy 1-byte norm).

    Null text ⇒ doc_len 0, no tokens (≙ M7 empty short-circuit,
    LuceneIndexBean.java:312-316).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return (
            np.empty(0, np.int64),
            pa.array([], type=pa.string()),
            np.empty(0, np.int32),
        )
    lower = pc.utf8_lower(texts)
    split = pc.split_pattern_regex(lower, pattern=TOKEN_SPLIT_PATTERN)
    # flatten() drops nulls; compute parents from offsets (null → length 0).
    lengths = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    parents = np.repeat(np.arange(n, dtype=np.int64), lengths)
    flat = pc.list_flatten(split)
    keep = pc.and_(
        pc.and_(
            pc.not_equal(flat, ""),
            pc.less_equal(pc.utf8_length(flat), MAX_TOKEN_LENGTH),
        ),
        pc.invert(pc.is_in(flat, value_set=_STOP_ARRAY)),
    )
    keep_np = keep.to_numpy(zero_copy_only=False)
    terms = flat.filter(keep)
    parents = parents[keep_np]
    doc_len = np.bincount(parents, minlength=n).astype(np.int32)
    return parents, terms, doc_len


def term_frequencies(
    parents: np.ndarray, terms: pa.Array
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Aggregate (row, term) pairs into (row, term, tf) — the A1 partial
    aggregate (per-batch combine before any shuffle, SURVEY.md §2.5).

    Vectorized via Arrow group_by (C++ hash aggregation, no Python loop).
    Returns ``(row_index, term, tf)`` sorted by (row_index, term).
    """
    if len(parents) == 0:
        return np.empty(0, np.int64), pa.array([], type=pa.string()), np.empty(0, np.int32)
    t = pa.table({"row": pa.array(parents, type=pa.int64()), "term": terms})
    agg = t.group_by(["row", "term"]).aggregate([([], "count_all")])
    # deterministic order within the batch
    agg = agg.sort_by([("row", "ascending"), ("term", "ascending")])
    return (
        agg["row"].to_numpy(zero_copy_only=False),
        agg["term"].combine_chunks(),
        agg["count_all"].to_numpy(zero_copy_only=False).astype(np.int32),
    )


def analyze_query_term(term: str) -> list[str]:
    """Query-side analysis of a single syntactic term (Q7): same analyzer.

    A stop word or empty term analyzes to [] and contributes no clause —
    matching Lucene QueryParser + StandardAnalyzer behavior where stop words
    vanish from queries (FIXTURES.md §5 'stopword' kind → 0 hits).
    """
    return analyze(term)
