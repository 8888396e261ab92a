"""Unit tests for the analyzer (SURVEY.md §5.2 layer 1)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_plugin_ray.functions.analysis import (
    MAX_TOKEN_LENGTH,
    STOP_WORDS,
    analyze,
    sanitize_collection,
    term_frequencies,
    tokenize_column,
)


def test_stop_set_is_lucene_33():
    assert len(STOP_WORDS) == 33
    assert "the" in STOP_WORDS and "with" in STOP_WORDS and "lamb" not in STOP_WORDS


def test_analyze_basic():
    # ≙ reference: 'Lorem' matches 'lorem' (TestSearchByFirstWord.java:39)
    assert analyze("Mary had a little Lamb.") == ["mary", "had", "little", "lamb"]
    assert analyze("The THE the") == []          # stopword query → empty (Q7)
    assert analyze("") == []
    assert analyze("x" * 256) == []              # max token length 255
    assert analyze("x" * 255) == ["x" * 255]
    assert analyze("age:23") == ["age", "23"]    # ':' is a separator


def test_tokenize_column_matches_analyze():
    texts = [
        "Mary had a little Lamb",
        "",
        None,
        "The the THE",
        "Lorem ipsum dolor versions",
        "x" * 256 + " ok",
    ]
    parents, terms, doc_len = tokenize_column(pa.array(texts, type=pa.string()))
    got = [[] for _ in texts]
    for p, t in zip(parents, terms.to_pylist()):
        got[p].append(t)
    expected = [analyze(t) if t else [] for t in texts]
    assert got == expected
    assert doc_len.tolist() == [len(e) for e in expected]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=8))
def test_tokenize_column_property(texts):
    parents, terms, doc_len = tokenize_column(pa.array(texts, type=pa.string()))
    got = [[] for _ in texts]
    for p, t in zip(parents, terms.to_pylist()):
        got[p].append(t)
    assert got == [analyze(t) for t in texts]
    assert doc_len.tolist() == [len(analyze(t)) for t in texts]


def test_term_frequencies():
    texts = ["lamb lamb mary", "lamb"]
    parents, terms, _ = tokenize_column(pa.array(texts))
    rows, tf_terms, tfs = term_frequencies(parents, terms)
    triples = sorted(zip(rows.tolist(), tf_terms.to_pylist(), tfs.tolist()))
    assert triples == [(0, "lamb", 2), (0, "mary", 1), (1, "lamb", 1)]


def test_sanitize_collection():
    # ≙ LuceneIndexBean.escape (LuceneIndexBean.java:553-586): strips specials
    assert sanitize_collection('a+b-c!d(e)f{g}h[i]j^k"l~m*n?o:p\\q') == "abcdefghijklmnopq"
    assert sanitize_collection("plain") == "plain"
