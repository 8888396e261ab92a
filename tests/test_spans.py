"""Span-query family (Lucene queries.spans: SpanNearQuery ordered/
unordered, SpanFirstQuery, SpanNotQuery) — the SpanClause contract of
functions/queryparse.py over unit term spans.

Referee: a brute-force python evaluation of the documented contract over
the analyzed token streams, with scores recomputed INDEPENDENTLY from the
corpus statistics (pseudo-term BM25 with summed constituent idfs — the
PhraseWeight shape).  Plus identity pins (slop-0 ordered pair == phrase;
span_first at end ≥ max dl == term search; span_not with an absent
exclude == term search), sharded identity, facade + HTTP round trips and
loud-validation tests.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze, analyze_with_positions
from lucene_plugin_ray.pipelines.fixtures import make_pages

TEXTS = [
    "spark merge window spark stream merge",
    "merge spark",
    "window stream table",
    "spark the merge lake",            # stop word hole between spark/merge
    "spark alpha beta gamma merge",
    "merge merge spark spark",
    "no spark here at all window",     # stop words consume positions
    "table lake stream",
    "spark spark spark",               # repeated anchor term
    "merge window spark window merge spark merge",
]


def _rows():
    return [
        {"url": f"u{i:03d}", "warc_ts": 1_600_000_000_000_000 + i,
         "html": b"", "text": t, "lang": "en"}
        for i, t in enumerate(TEXTS)
    ]


@pytest.fixture(scope="module")
def span_built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    rows = _rows()
    extra = make_pages(120, seed=91)
    root = str(tmp_path_factory.mktemp("idx_spans"))
    cfg = IndexConfig(index_root=root, num_partitions=3)
    base = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    build_index(base, cfg)
    build_delta(extra, cfg)  # spans must work across generations
    corpus = rows + extra.to_pylist()
    return corpus, cfg, SearchEngine(root, cfg=cfg)


# ---------------------------------------------------------------------------
# brute-force contract reference + independent BM25
# ---------------------------------------------------------------------------
def _live(corpus):
    """url → text under last-write-wins on warc_ts (make_pages emits
    OLDER duplicate versions appended later in the table)."""
    best = {}
    for r in corpus:
        cur = best.get(r["url"])
        if cur is None or r["warc_ts"] > cur["warc_ts"]:
            best[r["url"]] = r
    return best


def _span_freqs(corpus, kind, terms, slop=0, in_order=True, end=0,
                exclude=(), pre=0, post=0):
    """Per-url span frequency under the SpanClause contract — pure python
    over the analyzed streams, no engine code."""
    import itertools

    out = {}
    for r in _live(corpus).values():
        posof = {}
        for t, p in analyze_with_positions(r["text"]):
            posof.setdefault(t, []).append(p)
        w = 0.0
        if kind == "near":
            k = len(terms)
            for p0 in posof.get(terms[0], []):
                if in_order:
                    cur, ok = p0, True
                    for t in terms[1:]:
                        nxt = [p for p in posof.get(t, []) if p > cur]
                        if not nxt:
                            ok = False
                            break
                        cur = min(nxt)
                    if ok and cur - p0 - (k - 1) <= slop:
                        w += 1.0 / (1 + cur - p0 - (k - 1))
                else:
                    lists = [posof.get(t, []) for t in terms[1:]]
                    if all(lists):
                        best = min(
                            max([p0, *combo]) - min([p0, *combo])
                            for combo in itertools.product(*lists)
                        )
                        if best - (k - 1) <= slop:
                            w += 1.0 / (1 + best - (k - 1))
        elif kind == "first":
            w = float(sum(1 for p in posof.get(terms[0], []) if p + 1 <= end))
        else:  # 'not'
            expos = sorted(q for t in exclude for q in posof.get(t, []))
            for p in posof.get(terms[0], []):
                if not any(p - pre <= q <= p + post for q in expos):
                    w += 1.0
        if w > 0:
            out[r["url"]] = w
    return out


def _bm25_expected(corpus, terms, freqs):
    """Independent pseudo-term BM25: summed idfs over ``terms``, exact dl."""
    live = {u: r["text"] for u, r in _live(corpus).items()}
    dls = {u: len(analyze(t)) for u, t in live.items()}
    n = len(live)
    avgdl = sum(dls.values()) / n
    w = 0.0
    for t in terms:
        df = sum(1 for txt in live.values() if t in analyze(txt))
        w += math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for u, pf in freqs.items():
        dl = dls[u]
        out[u] = w * pf * (1.2 + 1.0) / (pf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    return out


CASES = [
    ("near", dict(terms=("spark", "merge"), slop=0, in_order=True)),
    ("near", dict(terms=("spark", "merge"), slop=2, in_order=True)),
    ("near", dict(terms=("merge", "spark"), slop=1, in_order=False)),
    ("near", dict(terms=("spark", "spark"), slop=3, in_order=True)),  # repeats
    ("near", dict(terms=("spark", "window", "merge"), slop=4, in_order=True)),
    ("near", dict(terms=("merge", "window", "spark"), slop=3, in_order=False)),
    ("first", dict(terms=("spark",), end=1)),
    ("first", dict(terms=("spark",), end=3)),
    ("first", dict(terms=("window",), end=5)),
    ("not", dict(terms=("spark",), exclude=("merge",), pre=0, post=1)),
    ("not", dict(terms=("spark",), exclude=("merge", "window"), pre=2, post=2)),
    ("not", dict(terms=("merge",), exclude=("zzznope",), pre=1, post=1)),
]


def _run(engine, kind, p):
    if kind == "near":
        return engine.span_near(
            list(p["terms"]), slop=p["slop"], in_order=p["in_order"],
            limit=1_000_000_000,
        )
    if kind == "first":
        return engine.span_first(p["terms"][0], p["end"], limit=1_000_000_000)
    return engine.span_not(
        p["terms"][0], p["exclude"], pre=p.get("pre", 0),
        post=p.get("post", 0), limit=1_000_000_000,
    )


def test_spans_match_bruteforce(span_built):
    corpus, cfg, engine = span_built
    nonempty = 0
    for kind, p in CASES:
        got = _run(engine, kind, p)
        freqs = _span_freqs(corpus, kind, **p)
        exp = _bm25_expected(corpus, p["terms"], freqs)
        urls = got["url"].to_pylist()
        assert set(urls) == set(exp), (kind, p, sorted(set(urls) ^ set(exp)))
        for u, s in zip(urls, got["score"].to_pylist()):
            assert abs(s - exp[u]) < 1e-9, (kind, p, u, s, exp[u])
        # ordering: (score desc, url asc)
        pairs = list(zip(got["score"].to_pylist(), urls))
        assert pairs == sorted(pairs, key=lambda x: (-x[0], x[1]))
        nonempty += bool(urls)
    assert nonempty >= 10  # the corpus must actually exercise the paths


def test_span_near_slop0_is_phrase(span_built):
    """An ordered pair at slop 0 scores bit-identically to the phrase —
    every adjacency anchor weighs 1/(1+0) and the pseudo-term statistics
    coincide."""
    _, _, engine = span_built
    a = engine.span_near(["spark", "merge"], slop=0)
    b = engine.search('"spark merge"', limit=255)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_span_first_unbounded_is_term_search(span_built):
    """end ≥ the longest document ⇒ freq == tf ⇒ bit-identical to the
    plain term query (phrase_scorer over one df == term scorer)."""
    _, _, engine = span_built
    a = engine.span_first("spark", 1 << 20)
    b = engine.search("spark", limit=255)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_span_not_absent_exclude_is_term_search(span_built):
    _, _, engine = span_built
    a = engine.span_not("merge", "qqqabsent", pre=5, post=5)
    b = engine.search("merge", limit=255)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_span_ordered_docs_subset_of_unordered(span_built):
    """Every ordered match window is a candidate unordered window, so the
    ordered doc set is contained in the unordered one at equal slop."""
    _, _, engine = span_built
    o = set(engine.span_near(["spark", "merge"], slop=1)["url"].to_pylist())
    u = set(
        engine.span_near(["spark", "merge"], slop=1, in_order=False)[
            "url"
        ].to_pylist()
    )
    assert o <= u


def test_span_validation(span_built):
    _, _, engine = span_built
    with pytest.raises(ValueError, match="analyze to exactly one"):
        engine.span_near(["the", "spark"])          # stop word
    with pytest.raises(ValueError, match="analyze to exactly one"):
        engine.span_first("two words", 5)           # multi-token
    with pytest.raises(ValueError, match="at least two terms"):
        engine.span_near(["spark"])
    with pytest.raises(ValueError, match="repeated terms"):
        engine.span_near(["spark", "spark"], in_order=False)
    with pytest.raises(ValueError, match="end must be"):
        engine.span_first("spark", 0)
    with pytest.raises(ValueError, match="exclude"):
        engine.span_not("spark", ())
    with pytest.raises(ValueError, match="slop must be"):
        engine.span_near(["spark", "merge"], slop=-1)
    with pytest.raises(ValueError, match="limit must be positive"):
        engine.span_near(["spark", "merge"], limit=0)
    with pytest.raises(ValueError, match="unknown span kind"):
        from lucene_plugin_ray.pipelines.query import make_span_clause

        make_span_clause("weird", ("spark",), "text")


def test_spans_sharded_identity(span_built, ray_session):
    """ShardedSearcherService span results are identical to the single
    engine at 1 and 3 shards (doc-disjoint partials + injected global
    stats + exact total-order merge)."""
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    _, cfg, engine = span_built
    for shards in (1, 3):
        svc = ShardedSearcherService(
            cfg.index_root, cfg=cfg, num_shards=shards
        )
        pairs = [
            (engine.span_near(["spark", "merge"], slop=2),
             svc.span_near(["spark", "merge"], slop=2)),
            (engine.span_near(["merge", "spark"], slop=1, in_order=False),
             svc.span_near(["merge", "spark"], slop=1, in_order=False)),
            (engine.span_first("spark", 3), svc.span_first("spark", 3)),
            (engine.span_not("spark", "merge", pre=1, post=1),
             svc.span_not("spark", "merge", pre=1, post=1)),
        ]
        for a, b in pairs:
            assert a["url"].to_pylist() == b["url"].to_pylist()
            assert a["score"].to_pylist() == b["score"].to_pylist()
        with pytest.raises(ValueError):
            svc.span_near(["the", "spark"])  # driver-side validation


def test_spans_facade_http_roundtrip(ray_session, tmp_path):
    """Facade + HTTP surface: hit identity with the engine and the
    400-never-500 contract on bad input."""
    import urllib.error
    import urllib.parse
    import urllib.request

    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    svc = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "http_idx"), num_partitions=2),
        host="127.0.0.1", port=0,
    ).start()
    try:
        c = LuceneHttpClient(svc.url)
        c.index_text("col", "a", "spark merge window")
        c.index_text("col", "b", "spark window window merge")
        c.index_text("col", "c", "window merge then spark")

        near = c.span_near("col", ["spark", "merge"], slop=2)
        fac = svc.facade.span_near("col", ["spark", "merge"], slop=2)
        assert [e["_externalId"] for e in near] == [
            e.external_id for e in fac
        ]
        assert [e["_score"] for e in near] == [e.score for e in fac]

        first = c.span_first("col", "spark", 1)
        assert {e["_externalId"] for e in first} == {"a", "b"}

        nt = c.span_not("col", "spark", ["merge"], pre=1, post=1)
        fac_nt = svc.facade.span_not("col", "spark", ["merge"], pre=1, post=1)
        assert [e["_externalId"] for e in nt] == [
            e.external_id for e in fac_nt
        ]

        def _status(op, params):
            try:
                urllib.request.urlopen(
                    f"{svc.url}/{op}?" + urllib.parse.urlencode(params)
                )
                return 200
            except urllib.error.HTTPError as e:
                return e.code

        # 400s: malformed JSON list, stopword term, bad end, bad in_order
        assert _status("span-near", {"collection": "col", "terms": "notjson"}) == 400
        assert _status(
            "span-near",
            {"collection": "col", "terms": '["the", "spark"]'},
        ) == 400
        assert _status(
            "span-near",
            {"collection": "col", "terms": '["spark", "merge"]',
             "in_order": "maybe"},
        ) == 400
        assert _status(
            "span-first", {"collection": "col", "term": "spark", "end": "x"}
        ) == 400
        assert _status(
            "span-first", {"collection": "col", "term": "spark", "end": 0}
        ) == 400
        assert _status(
            "span-not",
            {"collection": "col", "term": "spark", "exclude": "[]"},
        ) == 400
    finally:
        svc.shutdown()
