"""Deep pagination — Lucene IndexSearcher.searchAfter(ScoreDoc) analogue
(SearchEngine.search_after, ShardedSearcherService.search_after, facade,
HTTP).  The contract: pages anchored on the previous page's last
(full-precision score, url) concatenate to EXACTLY search(limit=Σ pages)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_after"))
    cfg = IndexConfig(
        index_root=root, num_partitions=6, field_columns=("foo",)
    )
    build_index(make_pages(600, seed=91, with_fields=True), cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def _paginate(fn_first, fn_after, page: int, max_rows: int) -> pa.Table:
    pages = []
    pg = fn_first(page)
    while pg.num_rows:
        pages.append(pg)
        if sum(p.num_rows for p in pages) >= max_rows:
            break
        last = pg.num_rows - 1
        pg = fn_after(pg["score"][last].as_py(), pg["url"][last].as_py(), page)
    return pa.concat_tables(pages) if pages else pg


@pytest.mark.parametrize(
    "query,kwargs",
    [
        ("w00001", {}),
        ("w00001 w00002 w00010", {}),
        ("w00001 AND w00002", {}),
        ("w00001 -w00005", {}),
        ("w0000*", {}),
        ('"w00001 w00002"~4', {}),
        ("w00001 w00002", {"min_should_match": 1}),
        ("w00001 w00002", {"synonyms": {"w00001": ["w00003"]}}),
        ("w00001 w00002", {"fields": {"text": 2.0, "foo": 1.0},
                           "tie_breaker": 0.3}),
    ],
)
def test_pages_concatenate_to_full_search(built, query, kwargs):
    _root, _cfg, eng = built
    full = eng.search(query, limit=1_000_000, **kwargs)
    assert full.num_rows > 3, "fixture query must match enough docs"
    for page in (1, 3, 7):
        cat = _paginate(
            lambda p: eng.search(query, limit=p, **kwargs),
            lambda s, u, p: eng.search_after(query, s, u, limit=p, **kwargs),
            page, full.num_rows,
        ).slice(0, full.num_rows)
        assert cat.equals(full), (query, page)


def test_past_the_end_is_empty(built):
    _root, _cfg, eng = built
    full = eng.search("w00001", limit=1_000_000)
    n = full.num_rows - 1
    t = eng.search_after(
        "w00001", full["score"][n].as_py(), full["url"][n].as_py(), limit=9
    )
    assert t.num_rows == 0
    assert t.schema.names == ["url", "score", "docid"]


def test_anchor_mid_tie_respects_url_order(built):
    """An anchor INSIDE a run of equal scores must resume at url order —
    the predicate (score == anchor) & (url > anchor_url)."""
    _root, _cfg, eng = built
    full = eng.search("w00001", limit=1_000_000)
    sc = full["score"].to_numpy()
    # find any adjacent equal-score pair; constant-score queries guarantee one
    const = eng.search("w0000*", limit=1_000_000)
    csc = const["score"].to_numpy()
    ties = np.flatnonzero(csc[1:] == csc[:-1])
    assert ties.size, "wildcard constant-score query must produce ties"
    i = int(ties[0])
    t = eng.search_after(
        "w0000*", const["score"][i].as_py(), const["url"][i].as_py(), limit=3
    )
    assert t["url"][0].as_py() == const["url"][i + 1].as_py()
    assert sc is not None


def test_validation(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError):
        eng.search_after("w00001", float("nan"), "u")
    with pytest.raises(ValueError):
        eng.search_after("w00001", float("inf"), "u")
    with pytest.raises(ValueError):
        eng.search_after("w00001", 1.0, 5)  # type: ignore[arg-type]
    with pytest.raises(ValueError):
        eng.search_after("w00001", 1.0, "u", limit=0)
    with pytest.raises(ValueError):
        eng.search_after("w00001", 1.0, "u", tie_breaker=0.5)


def test_sharded_identity(built):
    """Fleet pagination == single-engine pagination, page by page."""
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        q = "w00001 w00002"
        full = eng.search(q, limit=1_000_000)
        assert full.num_rows > 6
        anchor = (full["score"][4].as_py(), full["url"][4].as_py())
        single = eng.search_after(q, anchor[0], anchor[1], limit=5)
        fleet = svc.search_after(q, anchor[0], anchor[1], limit=5)
        assert fleet.equals(single)
        with pytest.raises(ValueError):
            svc.search_after(q, float("nan"), "u")
        with pytest.raises(ValueError):
            svc.search_after(q, 1.0, "u", limit=0)
    finally:
        svc.shutdown()


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    for i in range(30):
        facade.index_text("default", f"doc{i:02d}", f"alpha beta w{i % 3}")
    facade.commit()
    page1 = facade.search("default", "alpha", limit=4)
    assert len(page1) == 4
    page2 = facade.search_after(
        "default", "alpha", page1[-1].score, page1[-1].external_id, limit=4
    )
    assert [e.external_id for e in page2] == [
        e.external_id for e in facade.search("default", "alpha", limit=8)[4:]
    ]
    with pytest.raises(Exception):
        facade.search_after("default", "alpha", 1.0, None)  # type: ignore

    try:
        client = LuceneHttpClient(service.url)
        h2 = client.search_after(
            "default", "alpha", page1[-1].score, page1[-1].external_id, limit=4
        )
        assert [r["_externalId"] for r in h2] == [
            e.external_id for e in page2
        ]
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            client.search_after("default", "alpha", float("nan"), "u")
    finally:
        service.shutdown()


# ------------------------- sorted pagination (searchAfter(FieldDoc)) --------


def _sorted_paginate(eng, query, page, max_rows, descending=True):
    pages = []
    pg = eng.search_sorted(query, limit=page, descending=descending)
    while pg.num_rows:
        pages.append(pg)
        if sum(p.num_rows for p in pages) >= max_rows:
            break
        last = pg.num_rows - 1
        pg = eng.search_sorted(
            query, limit=page, descending=descending,
            after_ts=pg["warc_ts"][last].as_py(),
            after_url=pg["url"][last].as_py(),
        )
    return pa.concat_tables(pages) if pages else pg


@pytest.mark.parametrize("descending", [True, False])
def test_sorted_pages_concatenate(built, descending):
    """Sorted pages anchored on (warc_ts, url) concatenate to
    search_sorted(limit=ALL) exactly — integer keys, bit-for-bit."""
    _root, _cfg, eng = built
    full = eng.search_sorted("w00001", limit=1_000_000, descending=descending)
    assert full.num_rows > 5
    for page in (1, 4, 9):
        cat = _sorted_paginate(eng, "w00001", page, full.num_rows, descending)
        assert cat.equals(full), (page, descending)


def test_sorted_after_tie_resumes_by_url(ray_session, tmp_path):
    """Docs sharing a warc_ts are ordered url-asc; an anchor INSIDE the tie
    run resumes at the next url, not the next timestamp."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    base = make_pages(8, seed=17)
    # collapse every warc_ts to one value -> the whole match set is one tie
    ts = pa.array([1_600_000_000_000_000] * base.num_rows,
                  type=base["warc_ts"].type)
    tied = base.set_column(base.schema.get_field_index("warc_ts"), "warc_ts", ts)
    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    build_index(tied, cfg)
    eng = SearchEngine(cfg.index_root, cfg=cfg)
    full = eng.search_sorted("w00001 w00002 w00003", limit=1_000_000)
    assert full.num_rows >= 3
    urls = full["url"].to_pylist()
    assert urls == sorted(urls), "tie run must be url-asc"
    mid = full.num_rows // 2
    nxt = eng.search_sorted(
        "w00001 w00002 w00003", limit=1_000_000,
        after_ts=full["warc_ts"][mid].as_py(),
        after_url=full["url"][mid].as_py(),
    )
    assert nxt["url"].to_pylist() == urls[mid + 1:]


def test_sorted_after_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        full = eng.search_sorted("w00001 w00002", limit=1_000_000)
        pos = full.num_rows // 3
        a_ts = full["warc_ts"][pos].as_py()
        a_url = full["url"][pos].as_py()
        for limit in (5, 50, 1_000_000):
            single = eng.search_sorted(
                "w00001 w00002", limit=limit, after_ts=a_ts, after_url=a_url
            )
            fleet = svc.search_sorted(
                "w00001 w00002", limit=limit, after_ts=a_ts, after_url=a_url
            )
            assert fleet.equals(single), limit
        with pytest.raises(ValueError):
            svc.search_sorted("a", after_ts=1, after_url=7)  # type: ignore[arg-type]
    finally:
        svc.shutdown()


def test_sorted_after_validation_and_http(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    for i in range(20):
        facade.index_text("default", f"doc{i:02d}", f"alpha gam{i % 3}")
    facade.commit()
    rows = facade.search_sorted("default", "alpha", limit=1_000_000)
    assert len(rows) == 20
    mid = rows[9]
    rest = facade.search_sorted(
        "default", "alpha", after_ts=mid["ts_us"], after_url=mid["external_id"]
    )
    assert [r["external_id"] for r in rest] == [
        r["external_id"] for r in rows[10:]
    ]
    with pytest.raises(ValueError):
        facade.search_sorted("default", "alpha", after_ts=5, after_url=3)  # type: ignore[arg-type]
    try:
        client = LuceneHttpClient(service.url)
        h = client.search_sorted("default", "alpha", after_ts=mid["ts_us"],
                                 after_url=mid["external_id"])
        assert [r["external_id"] for r in h] == [
            r["external_id"] for r in rest
        ]
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            client._get("search-sorted", {"collection": "default",
                                          "query": "alpha", "after_ts": "zz"})
    finally:
        service.shutdown()


# -------------------------------------------- multi-key field sort ----------


def test_sorted_by_matches_bruteforce(built):
    """(doc_len desc, warc_ts asc, url asc) recomputed from the single-key
    sorted surface — permutation identity on the full match set."""
    _root, _cfg, eng = built
    full = eng.search_sorted_by(
        "w00001 w00002", [("doc_len", "desc"), ("warc_ts", "asc")],
        limit=10**9,
    )
    assert full.num_rows > 10
    rows = list(zip(full["url"].to_pylist(), full["doc_len"].to_pylist(),
                    full["warc_ts"].to_pylist()))
    want = sorted(rows, key=lambda r: (-r[1], r[2], r[0]))
    assert rows == want
    # same match set as the boolean count
    assert full.num_rows == eng.count("w00001 w00002")


def test_sorted_by_truncation_is_global_topk(built):
    _root, _cfg, eng = built
    full = eng.search_sorted_by(
        "w00001", [("doc_len", "asc"), ("warc_ts", "desc")], limit=10**9
    )
    top5 = eng.search_sorted_by(
        "w00001", [("doc_len", "asc"), ("warc_ts", "desc")], limit=5
    )
    assert top5.equals(full.slice(0, 5))


def test_sorted_by_single_key_equals_search_sorted(built):
    """[(warc_ts, desc)] must reproduce the dedicated recency surface."""
    _root, _cfg, eng = built
    multi = eng.search_sorted_by("w00001", [("warc_ts", "desc")], limit=50)
    single = eng.search_sorted("w00001", limit=50)
    assert multi["url"].equals(single["url"])
    assert multi["warc_ts"].equals(single["warc_ts"])
    assert multi["docid"].equals(single["docid"])


def test_sorted_by_validation(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError):
        eng.search_sorted_by("w00001", [])
    with pytest.raises(ValueError):
        eng.search_sorted_by("w00001", [("score", "desc")])
    with pytest.raises(ValueError):
        eng.search_sorted_by("w00001", [("warc_ts", "down")])
    with pytest.raises(ValueError):
        eng.search_sorted_by(
            "w00001", [("warc_ts", "desc"), ("warc_ts", "asc")]
        )
    with pytest.raises(ValueError):
        eng.search_sorted_by("w00001", [("warc_ts", "desc")], limit=0)


def test_sorted_by_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=3)
    try:
        for sort in ([("doc_len", "desc"), ("warc_ts", "asc")],
                     [("warc_ts", "asc")]):
            for limit in (5, 1_000_000):
                single = eng.search_sorted_by("w00001 w00002", sort, limit=limit)
                fleet = svc.search_sorted_by("w00001 w00002", sort, limit=limit)
                assert fleet.equals(single), (sort, limit)
        with pytest.raises(ValueError):
            svc.search_sorted_by("w00001", [("nope", "asc")])
    finally:
        svc.shutdown()


def test_sorted_by_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    try:
        c = LuceneHttpClient(service.url)
        c.index_text("col", "a", "alpha beta gamma delta")      # dl 4
        c.index_text("col", "b", "alpha beta")                  # dl 2
        c.index_text("col", "d", "alpha beta gamma")            # dl 3

        rows = c.search_sorted_by(
            "col", "alpha", [["doc_len", "desc"], ["warc_ts", "asc"]]
        )
        assert [r["externalId"] for r in rows] == ["a", "d", "b"]
        assert [r["doc_len"] for r in rows] == [4, 3, 2]
        ent = facade.search_sorted_by(
            "col", "alpha", [("doc_len", "desc"), ("warc_ts", "asc")]
        )
        assert ent == rows

        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_sorted_by("col", "alpha", [["score", "desc"]])
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c._get("search-sorted-by",
                   {"collection": "col", "query": "alpha", "sort": "nope"})
        assert ei.value.code == 400
        # malformed sort ENTRIES are 400s too, not 500s (review regression)
        for bad in ([5], [["warc_ts", "asc"], None], ["warc_ts"]):
            with pytest.raises(urllib.error.HTTPError) as ei:
                c.search_sorted_by("col", "alpha", bad)
            assert ei.value.code == 400, bad
    finally:
        service.shutdown()


# -------------------------------------------- STRING field sort -------------


def _str_key(rows, descending):
    """Missing-last composite key check helper: rows = (val|None, ts, url)."""
    out = sorted(rows, key=lambda r: (r[2],))
    out = sorted(out, key=lambda r: -r[1])
    if descending:
        out = sorted(
            out, key=lambda r: (r[0] is not None, r[0] or ""), reverse=True
        )
    else:
        out = sorted(out, key=lambda r: (r[0] is None, r[0] or ""))
    return out


def test_sorted_by_string_matches_bruteforce(built):
    """STRING sort (SortField.Type.STRING over reconstructed ordinals):
    (foo asc, warc_ts desc, url asc) full permutation identity, both
    directions."""
    _root, _cfg, eng = built
    for d in ("asc", "desc"):
        full = eng.search_sorted_by(
            "w00001 w00002", [("foo", d), ("warc_ts", "desc")], limit=10**9
        )
        assert full.num_rows > 10
        assert str(full.schema.field("foo").type) == "string"
        rows = list(zip(full["foo"].to_pylist(), full["warc_ts"].to_pylist(),
                        full["url"].to_pylist()))
        assert rows == _str_key(rows, d == "desc"), d
        assert full.num_rows == eng.count("w00001 w00002")


def test_sorted_by_string_truncation_is_global_topk(built):
    _root, _cfg, eng = built
    full = eng.search_sorted_by(
        "w00001", [("foo", "asc"), ("doc_len", "asc")], limit=10**9
    )
    top7 = eng.search_sorted_by(
        "w00001", [("foo", "asc"), ("doc_len", "asc")], limit=7
    )
    assert top7.equals(full.slice(0, 7))


def test_sorted_by_string_rejects_text_column(built):
    _root, _cfg, eng = built
    with pytest.raises(ValueError, match="tokenized text field"):
        eng.search_sorted_by("w00001", [("text", "asc")])
    with pytest.raises(ValueError, match="not an indexed field"):
        eng.search_sorted_by("w00001", [("nope", "asc")])


@pytest.fixture(scope="module")
def str_sort_built(ray_session, tmp_path_factory):
    """Tiny corpus pinning the corner semantics: multi-valued foo (min
    selector), empty foo (missing), a delta-only field (evolution
    missing on old segments)."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    rows = [
        ("u1", "common words here", "mid"),
        ("u2", "common words here", "zeta alpha"),   # multi-valued → 'alpha'
        ("u3", "common words here", ""),             # empty → missing
        ("u4", "common words here", "aaa"),
        ("u5", "common words here", "MID"),          # analyzes to 'mid' too
    ]
    root = str(tmp_path_factory.mktemp("idx_strsort"))
    cfg = IndexConfig(index_root=root, num_partitions=2,
                      field_columns=("foo",))
    base = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": [1_600_000_000_000_000 + i for i in range(len(rows))],
            "html": [b""] * len(rows),
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "foo": [r[2] for r in rows],
        }
    )
    build_index(base, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def test_sorted_by_string_min_selector_and_missing(str_sort_built):
    """Multi-valued docs sort by their MINIMUM analyzed term
    (SortedSetSortField 'min'); empty values are missing and sort LAST in
    BOTH directions (STRING_LAST missingValue)."""
    _root, _cfg, eng = str_sort_built
    asc = eng.search_sorted_by("common", [("foo", "asc")], limit=10)
    assert asc["url"].to_pylist() == ["u4", "u2", "u1", "u5", "u3"]
    assert asc["foo"].to_pylist() == ["aaa", "alpha", "mid", "mid", None]
    desc = eng.search_sorted_by("common", [("foo", "desc")], limit=10)
    assert desc["url"].to_pylist() == ["u1", "u5", "u2", "u4", "u3"]
    assert desc["foo"].to_pylist() == ["mid", "mid", "alpha", "aaa", None]


def test_sorted_by_string_field_evolution_missing(str_sort_built, tmp_path):
    """A field added by a later generation: old-segment docs carry no
    term and sort last — the append-only evolution contract."""
    import shutil

    from lucene_plugin_ray.pipelines.build import build_delta
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root0, cfg0, _ = str_sort_built
    root = str(tmp_path / "evo")
    shutil.copytree(root0, root)
    cfg2 = IndexConfig(index_root=root, num_partitions=2,
                       field_columns=("foo", "bar"))
    delta = pa.table(
        {
            "url": ["u6"],
            "warc_ts": [1_600_000_000_900_000],
            "html": [b""],
            "text": ["common words here"],
            "lang": ["en"],
            "foo": ["bbb"],
            "bar": ["first"],
        }
    )
    build_delta(delta, cfg2)
    eng = SearchEngine(root, cfg=cfg2)
    t = eng.search_sorted_by("common", [("bar", "asc")], limit=10)
    assert t["url"].to_pylist()[0] == "u6"          # the only doc WITH bar
    assert t["bar"].to_pylist()[0] == "first"
    assert set(t["bar"].to_pylist()[1:]) == {None}  # evolution missing, last
    assert t.num_rows == 6


def test_sorted_by_string_sharded_identity(str_sort_built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng = str_sort_built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=2)
    try:
        for sort in ([("foo", "asc")], [("foo", "desc"), ("warc_ts", "asc")]):
            for limit in (2, 100):
                single = eng.search_sorted_by("common", sort, limit=limit)
                fleet = svc.search_sorted_by("common", sort, limit=limit)
                assert fleet.equals(single), (sort, limit)
        with pytest.raises(ValueError):
            svc.search_sorted_by("common", [("text", "asc")])
        with pytest.raises(ValueError):
            svc.search_sorted_by("common", [("nope", "asc")])
    finally:
        svc.shutdown()


def test_sorted_by_string_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2,
                      field_columns=("foo",))
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    try:
        c = LuceneHttpClient(service.url)
        c.index_map("col", "a", {"text": "alpha beta", "foo": "zz"})
        c.index_map("col", "b", {"text": "alpha", "foo": "aa"})
        rows = c.search_sorted_by("col", "alpha", [["foo", "asc"]])
        assert [r["externalId"] for r in rows] == ["b", "a"]
        assert [r["foo"] for r in rows] == ["aa", "zz"]
    finally:
        service.shutdown()


def test_sorted_by_unknown_field_loud_even_on_empty_collection(built):
    """A typo'd field (or collection) must stay a loud ValueError even when
    the collection holds no segments — review-fix regression pin."""
    _root, _cfg, eng = built
    with pytest.raises(ValueError, match="unsupported sort field"):
        eng.search_sorted_by(
            "w00001", [("nope", "asc")], collection="no-such-collection"
        )
    with pytest.raises(ValueError, match="tokenized text field"):
        eng.search_sorted_by(
            "w00001", [("text", "asc")], collection="no-such-collection"
        )


# --------------------------- searchAfter(FieldDoc) on arbitrary Sort --------


def test_sorted_by_after_pages_concatenate(built):
    """Multi-key searchAfter: pages anchored on (key values…, url)
    concatenate to the unanchored result exactly — numeric and STRING
    keys, including paging THROUGH ties and the missing-last block."""
    _root, _cfg, eng = built
    for sort in ([("foo", "asc"), ("warc_ts", "desc")],
                 [("doc_len", "desc"), ("foo", "desc")]):
        full = eng.search_sorted_by("w00001 w00002", sort, limit=10**9)
        assert full.num_rows > 10
        for page in (3, 7):
            pages = []
            ak, au = None, ""
            while True:
                pg = eng.search_sorted_by(
                    "w00001 w00002", sort, limit=page,
                    after_keys=ak, after_url=au,
                )
                if pg.num_rows == 0:
                    break
                pages.append(pg)
                last = pg.num_rows - 1
                ak = [pg[f][last].as_py() for f, _ in sort]
                au = pg["url"][last].as_py()
            assert pa.concat_tables(pages).equals(full), (sort, page)


def test_sorted_by_after_strictly_after_semantics(built):
    """The anchor row itself never reappears; the next page starts at the
    immediately following row of the total order."""
    _root, _cfg, eng = built
    sort = [("foo", "asc"), ("warc_ts", "asc")]
    full = eng.search_sorted_by("w00001", sort, limit=10**9)
    k = min(6, full.num_rows - 1)
    ak = [full[f][k - 1].as_py() for f, _ in sort]
    au = full["url"][k - 1].as_py()
    nxt = eng.search_sorted_by("w00001", sort, limit=10**9,
                               after_keys=ak, after_url=au)
    assert nxt.equals(full.slice(k))


def test_sorted_by_after_validation(built):
    _root, _cfg, eng = built
    sort = [("foo", "asc"), ("warc_ts", "desc")]
    with pytest.raises(ValueError, match="one value per sort field"):
        eng.search_sorted_by("w00001", sort, after_keys=[1])
    with pytest.raises(ValueError, match="must be a string or None"):
        eng.search_sorted_by("w00001", sort, after_keys=[5, 1])
    with pytest.raises(ValueError, match="must be a number"):
        eng.search_sorted_by("w00001", sort, after_keys=["x", "y"])
    with pytest.raises(ValueError, match="integral"):
        eng.search_sorted_by("w00001", sort, after_keys=["x", 1.5])


def test_sorted_by_after_sharded_and_http(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=3,
                      field_columns=("foo",))
    build_index(make_pages(200, seed=41, with_fields=True), cfg)
    eng = SearchEngine(cfg.index_root, cfg=cfg)
    sort = [("foo", "asc"), ("warc_ts", "desc")]
    full = eng.search_sorted_by("w00001", sort, limit=10**9)
    k = 4
    ak = [full[f][k - 1].as_py() for f, _ in sort]
    au = full["url"][k - 1].as_py()
    exp = eng.search_sorted_by("w00001", sort, limit=6,
                               after_keys=ak, after_url=au)
    svc = ShardedSearcherService(cfg.index_root, cfg=cfg, num_shards=2)
    try:
        got = svc.search_sorted_by("w00001", sort, limit=6,
                                   after_keys=ak, after_url=au)
        assert got.equals(exp)
        with pytest.raises(ValueError):
            svc.search_sorted_by("w00001", sort, after_keys=[1])
    finally:
        svc.shutdown()

    http = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "h"), num_partitions=2),
        host="127.0.0.1", port=0,
    ).start()
    try:
        c = LuceneHttpClient(http.url)
        c.index_text("col", "a", "alpha beta gamma delta")   # dl 4
        c.index_text("col", "b", "alpha beta")               # dl 2
        c.index_text("col", "d", "alpha beta gamma")         # dl 3
        rows = c.search_sorted_by("col", "alpha",
                                  [["doc_len", "desc"]])
        anchor = rows[0]
        rest = c.search_sorted_by(
            "col", "alpha", [["doc_len", "desc"]],
            after_keys=[anchor["doc_len"]],
            after_url=anchor["externalId"],
        )
        assert [r["externalId"] for r in rest] == [
            r["externalId"] for r in rows[1:]
        ]
        import urllib.error
        import urllib.parse
        import urllib.request

        try:
            urllib.request.urlopen(
                f"{http.url}/search-sorted-by?" + urllib.parse.urlencode(
                    {"collection": "col", "query": "alpha",
                     "sort": '[["doc_len", "desc"]]',
                     "after_keys": "notjson"}
                )
            )
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        http.shutdown()


def test_sorted_by_after_url_type_is_loud(built):
    """after_url=None (a plausible 'no anchor' mistake) must be a clean
    ValueError, not a numpy TypeError — review-fix regression pin."""
    _root, _cfg, eng = built
    with pytest.raises(ValueError, match="after_url must be a string"):
        eng.search_sorted_by(
            "w00001", [("foo", "asc")], after_keys=["v1"], after_url=None
        )
