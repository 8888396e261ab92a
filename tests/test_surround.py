"""Surround query language (queryparser-surround module): W/N proximity
compiled onto the span engine, AND/OR/NOT composition, precedence, loud
rejections, sharded/facade/HTTP parity."""

import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.surround import (
    SurroundParseError,
    parse_surround,
)
from lucene_plugin_ray.pipelines.fixtures import make_pages

TEXTS = [
    "spark merge window spark stream merge",
    "merge spark",
    "window stream table",
    "spark alpha beta gamma merge",
    "merge window spark window merge spark merge",
    "table lake stream window",
    "stream window lake",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    rows = pa.table({
        "url": [f"u{i:02d}" for i in range(len(TEXTS))],
        "warc_ts": [1_600_000_000_000_000 + i for i in range(len(TEXTS))],
        "html": [b""] * len(TEXTS),
        "text": TEXTS,
        "lang": ["en"] * len(TEXTS),
    })
    root = str(tmp_path_factory.mktemp("idx_surround"))
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(rows, cfg)
    build_delta(make_pages(80, seed=3), cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def _eq(a, b):
    assert a["url"].to_pylist() == b["url"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_surround_wn_equals_span_api(built):
    """Every W/N form is bit-identical to the corresponding span_near:
    distance n = slop n − 1, infix == prefix, chains fold to one near."""
    _, _, eng = built
    _eq(eng.search_surround("spark w merge"),
        eng.span_near(["spark", "merge"], slop=0))
    _eq(eng.search_surround("3w(spark, merge)"),
        eng.span_near(["spark", "merge"], slop=2))
    _eq(eng.search_surround("spark 3w merge"),
        eng.span_near(["spark", "merge"], slop=2))
    _eq(eng.search_surround("spark 2n merge"),
        eng.span_near(["spark", "merge"], slop=1, in_order=False))
    _eq(eng.search_surround("2N(merge, spark)"),
        eng.span_near(["merge", "spark"], slop=1, in_order=False))
    # chain: a W b W c is ONE 3-term ordered near at the shared distance
    _eq(eng.search_surround("spark 2w merge 2w window"),
        eng.span_near(["spark", "merge", "window"], slop=1))


def test_surround_boolean_composition(built):
    """OR sums matching legs, AND requires both, NOT excludes — pinned
    against the classic-parser equivalents where one exists."""
    _, _, eng = built
    # NOT == classic '-': scores come from the positive side only
    _eq(eng.search_surround("window NOT table"),
        eng.search("window -table", limit=255))
    _eq(eng.search_surround("stream AND window"),
        eng.search("+stream +window", limit=255))
    _eq(eng.search_surround("stream OR window"),
        eng.search("stream window", limit=255))
    # OR of two spans: per-doc score = sum of the matching span scores
    got = eng.search_surround(
        "spark 3w merge OR window 2n stream", limit=10**9
    )
    s1 = eng.span_near(["spark", "merge"], slop=2, limit=10**9)
    s2 = eng.span_near(["window", "stream"], slop=1, in_order=False,
                       limit=10**9)
    m1 = dict(zip(s1["url"].to_pylist(), s1["score"].to_pylist()))
    m2 = dict(zip(s2["url"].to_pylist(), s2["score"].to_pylist()))
    exp = {u: m1.get(u, 0.0) + m2.get(u, 0.0) for u in set(m1) | set(m2)}
    got_map = dict(zip(got["url"].to_pylist(), got["score"].to_pylist()))
    assert got_map == exp
    # precedence: OR loosest, AND tighter, W tightest:
    # 'a AND b w c OR d' == '(a AND (b w c)) OR d'
    a = eng.search_surround("table AND window w stream OR merge", limit=10**9)
    b = eng.search_surround("(table AND (window w stream)) OR merge",
                            limit=10**9)
    _eq(a, b)


def test_surround_span_inside_and(built):
    """A span as a MUST leg: docs must carry the proximity AND the term."""
    _, _, eng = built
    got = eng.search_surround("(spark w merge) AND window", limit=10**9)
    span_docs = set(
        eng.span_near(["spark", "merge"], slop=0, limit=10**9)[
            "url"
        ].to_pylist()
    )
    window_docs = set(eng.search("window", limit=10**9)["url"].to_pylist())
    assert set(got["url"].to_pylist()) == span_docs & window_docs
    assert got.num_rows > 0  # non-vacuous on the fixture


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("", "empty"),
        ("   ", "empty"),
        ("spark w", "trailing"),
        ("w(spark)", ">= 2 arguments"),
        ("spark n spark", "repeated terms"),
        ("the w merge", "exactly one index token"),
        ("spar* w merge", "truncation"),
        ("spark 2w merge 3w window", "ambiguous"),
        ("spark w merge n window", "ambiguous"),
        ("(spark w merge", "unbalanced"),
        ("2w(spark, (merge AND window))", "plain terms"),
    ],
)
def test_surround_rejections(built, bad, msg):
    _, _, eng = built
    with pytest.raises(SurroundParseError, match=msg):
        eng.search_surround(bad)


def test_surround_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    for shards in (1, 2):
        svc = ShardedSearcherService(root, cfg=cfg, num_shards=shards)
        try:
            for q in ("spark 3w merge OR window 2n stream",
                      "(spark w merge) AND window",
                      "window NOT table"):
                a = eng.search_surround(q, limit=255)
                b = svc.search_surround(q, limit=255)
                _eq(a, b)
            with pytest.raises(SurroundParseError):
                svc.search_surround("spark w")  # driver-side, no fan-out
        finally:
            svc.shutdown()


def test_surround_facade_http_round_trip(ray_session, tmp_path):
    import urllib.error
    import urllib.parse
    import urllib.request

    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    svc = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2),
        host="127.0.0.1", port=0,
    ).start()
    try:
        c = LuceneHttpClient(svc.url)
        c.index_text("col", "a", "alpha beta gamma")
        c.index_text("col", "b", "alpha gamma beta")
        c.index_text("col", "c", "beta alpha")
        rows = c.search_surround("col", "alpha w beta")
        fac = svc.facade.search_surround("col", "alpha w beta")
        assert [r["_externalId"] for r in rows] == [
            e.external_id for e in fac
        ]
        assert {r["_externalId"] for r in rows} == {"a"}

        def _status(params):
            try:
                urllib.request.urlopen(
                    f"{svc.url}/search-surround?"
                    + urllib.parse.urlencode(params)
                )
                return 200
            except urllib.error.HTTPError as e:
                return e.code

        assert _status({"collection": "col", "query": "alpha w"}) == 400
        assert _status({"collection": "col", "query": "the w beta"}) == 400
    finally:
        svc.shutdown()


def test_surround_trailing_whitespace_accepted(built):
    """Trailing whitespace must not turn a valid query into a parse
    error — review-fix regression pin."""
    _, _, eng = built
    a = eng.search_surround("spark w merge \n")
    b = eng.search_surround("spark w merge")
    _eq(a, b)


def test_count_surround(built):
    """Score-free surround counting: equals the scored match-set size,
    composes with NOT, validates syntax, sharded twin sums exactly."""
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    for q in ("spark 3w merge", "spark 3w merge NOT window",
              "(spark w merge) AND window", "table OR stream"):
        n = eng.count(q, syntax="surround")
        assert n == eng.search_surround(q, limit=10**9).num_rows, q
    assert eng.count("window", syntax="surround") == eng.count("window")
    with pytest.raises(SurroundParseError):
        eng.count("spark w", syntax="surround")
    with pytest.raises(ValueError, match="syntax must be"):
        eng.count("spark", syntax="weird")
    with pytest.raises(ValueError, match="composes with none"):
        eng.count("spark", syntax="surround", min_should_match=1)
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=2)
    try:
        assert svc.count("spark 3w merge NOT window", syntax="surround") == \
            eng.count("spark 3w merge NOT window", syntax="surround")
        with pytest.raises(SurroundParseError):
            svc.count("spark w", syntax="surround")
    finally:
        svc.shutdown()


def test_facets_surround(ray_session, tmp_path):
    """Proximity-conditioned facet counts: the surround match set drives
    the facet pass; totals reconcile with count(syntax='surround');
    sharded identity; syntax validation."""
    import pyarrow.compute as pc_

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    rows = pa.table({
        "url": [f"f{i}" for i in range(5)],
        "warc_ts": [1_600_000_000_000_000 + i for i in range(5)],
        "html": [b""] * 5,
        "text": ["spark merge stream", "spark zz merge", "merge spark",
                 "spark only here", "spark aa bb merge"],
        "lang": ["en", "de", "en", "en", "de"],
    })
    cfg = IndexConfig(index_root=str(tmp_path / "sf"), num_partitions=2,
                      field_columns=("lang",))
    build_index(rows, cfg)
    eng = SearchEngine(cfg.index_root, cfg=cfg)
    t = eng.facets("spark 3w merge", "lang", syntax="surround")
    # docs 0 (adjacent), 1 (distance 2), 4 (distance 3) match → en 1, de 2
    assert dict(zip(t["value"].to_pylist(), t["count"].to_pylist())) == {
        "en": 1, "de": 2,
    }
    assert int(pc_.sum(t["count"]).as_py() or 0) == eng.count(
        "spark 3w merge", syntax="surround"
    )
    # classic default unchanged
    assert eng.facets("spark", "lang").equals(
        eng.facets("spark", "lang", syntax="classic")
    )
    with pytest.raises(ValueError, match="syntax must be"):
        eng.facets("spark", "lang", syntax="weird")
    with pytest.raises(SurroundParseError):
        eng.facets("spark w", "lang", syntax="surround")
    svc = ShardedSearcherService(cfg.index_root, cfg=cfg, num_shards=2)
    try:
        assert svc.facets("spark 3w merge", "lang",
                          syntax="surround").equals(t)
        with pytest.raises(SurroundParseError):
            svc.facets("spark w", "lang", syntax="surround")
    finally:
        svc.shutdown()
