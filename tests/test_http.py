"""HTTP serving surface round-trip (≙ the reference's @Path("/lucene")
endpoints, LuceneFacadeImpl.java:29-151, driven through the Python twin of
lucene-client.js)."""

import urllib.error

import pytest

from lucene_plugin_ray import IndexConfig
from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService


@pytest.fixture()
def svc(ray_session, tmp_path):
    service = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2),
        soft_commit_max_docs=100,
    ).start()
    yield service
    service.shutdown()


def test_http_index_search_delete_clear(svc, tmp_path):
    """index-text / index-map / search / delete / clear over the wire,
    mirroring lucene-client.js call shapes (ids read from _externalId)."""
    c = LuceneHttpClient(svc.url)
    assert c.index_text("my-collection", "my-id", "mary had a little lamb") is True
    assert c.index_text("my-collection", "other", "grey wolves howl") is True
    # the js-client README example: search('my-collection','mary') → {'my-id'}
    assert c.search("my-collection", "mary") == ["my-id"]
    assert c.search("my-collection", "wolves") == ["other"]
    assert c.search("my-collection", "absent") == []

    # index-map: field-scoped search (search_field shape)
    assert c.index_map("my-collection", "mapped", {"text": "quantum entangled"}) is True
    assert c.search("my-collection", "quantum") == ["mapped"]

    # upsert over the wire: same id, new content — old term gone
    c.index_text("my-collection", "my-id", "replaced entirely now")
    assert c.search("my-collection", "mary") == []
    assert c.search("my-collection", "replaced") == ["my-id"]

    # delete one id
    assert c.delete("my-collection", "other") is True
    assert c.search("my-collection", "wolves") == []

    # clear the collection
    assert c.clear("my-collection") is None
    assert c.search("my-collection", "replaced") == []


def test_http_index_file(svc, tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("zebra crossing stripes")
    c = LuceneHttpClient(svc.url)
    assert c._post("index-file", {"collection": "files", "path": str(p)}) is True
    assert c.search("files", "zebra") == [str(p)]


def test_http_validation_errors(svc):
    """LuceneException → HTTP 400 with {'error': ...}; unknown routes → 404
    (the probe-error-paths contract)."""
    c = LuceneHttpClient(svc.url)
    with pytest.raises(urllib.error.HTTPError) as e:
        c.index_text("", "id1", "text")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        c.search("coll", "")  # empty query
    assert e.value.code == 400
    c.index_text("coll", "seed", "seeded so the searcher lease exists")
    with pytest.raises(urllib.error.HTTPError) as e:
        c.search("coll", "boost^bad")  # malformed boost → parse error 400
    assert e.value.code == 400
    # wildcard is VALID grammar now (Q9) — serves 200 through HTTP
    assert c.search("coll", "seed*") == ["seed"]
    with pytest.raises(urllib.error.HTTPError) as e:
        c._post("no-such-op", {})
    assert e.value.code == 404


def test_http_bad_limit_is_400(svc):
    """Malformed limit query param is client error, not a defensive 500."""
    import json
    import urllib.parse
    import urllib.request

    c = LuceneHttpClient(svc.url)
    c.index_text("coll2", "d1", "findable content")
    qs = urllib.parse.urlencode(
        {"collection": "coll2", "query": "findable", "limit": "abc"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{svc.url}/search?{qs}")
    assert e.value.code == 400
    assert "limit" in json.loads(e.value.read().decode())["error"]


def test_http_file_root_confinement(ray_session, tmp_path):
    """With file_root set, index-file rejects paths resolving outside it
    (incl. symlink escapes); paths inside it still index."""
    root = tmp_path / "served"
    root.mkdir()
    (root / "ok.txt").write_text("permitted zebra content")
    outside = tmp_path / "secret.txt"
    outside.write_text("forbidden llama content")
    (root / "sneaky.txt").symlink_to(outside)
    service = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "idx2"), num_partitions=2),
        file_root=str(root),
        soft_commit_max_docs=100,
    ).start()
    try:
        c = LuceneHttpClient(service.url)
        assert c._post(
            "index-file", {"collection": "f", "path": str(root / "ok.txt")}
        ) is True
        for bad in (str(outside), str(root / "../secret.txt"),
                    str(root / "sneaky.txt")):
            with pytest.raises(urllib.error.HTTPError) as e:
                c._post("index-file", {"collection": "f", "path": bad})
            assert e.value.code == 400
        assert c.search("f", "zebra") != []
        assert c.search("f", "llama") == []
    finally:
        service.shutdown()


def test_http_count_facets_sorted_mlt(ray_session, tmp_path):
    """The round-3 read extensions over the wire: count, facets,
    search-sorted (recency order), more-like-this — all with
    read-your-writes (a pending buffered doc is committed before the
    read)."""
    service = LuceneHttpService(
        IndexConfig(
            index_root=str(tmp_path / "idx3"),
            num_partitions=2,
            field_columns=("tag",),
        ),
        soft_commit_max_docs=100,
    ).start()
    try:
        c = LuceneHttpClient(service.url)
        c.index_map("col", "a", {"text": "shared words here", "tag": "red"})
        c.index_map("col", "b", {"text": "shared words there", "tag": "red"})
        c.index_map("col", "d", {"text": "shared something else", "tag": "blue"})
        c.index_map("col", "e", {"text": "unrelated entirely", "tag": "blue"})

        assert c.count("col", "shared") == 3  # read-your-writes commit
        assert c.facets("col", "shared", "tag") == [
            {"value": "red", "count": 2},
            {"value": "blue", "count": 1},
        ]

        rows = c.search_sorted("col", "shared")
        # facade warc_ts is the ingest sequence: recency = reverse insert
        assert [r["external_id"] for r in rows] == ["d", "b", "a"]
        asc = c.search_sorted("col", "shared", order="asc")
        assert [r["external_id"] for r in asc] == ["a", "b", "d"]

        like = c.more_like_this("col", "shared words", exclude_id="a")
        assert like and "a" not in like and like[0] in ("b", "d")

        # malformed input is a 400, not a 500
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_sorted("col", "shared", limit="nope")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.count("col", "")
        assert ei.value.code == 400
        # a typo'd order must not silently mean descending
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.search_sorted("col", "shared", order="ASC")
        assert ei.value.code == 400
        # max_query_terms <= 0 would silently slice a DIFFERENT query
        with pytest.raises(urllib.error.HTTPError) as ei:
            c.more_like_this("col", "shared words", max_query_terms=0)
        assert ei.value.code == 400
    finally:
        service.shutdown()


def test_http_explain_and_suggest(ray_session, tmp_path):
    service = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "idxes"), num_partitions=2),
        soft_commit_max_docs=100,
    ).start()
    try:
        c = LuceneHttpClient(service.url)
        c.index_text("col", "d1", "quantum entangled photons")
        c.index_text("col", "d2", "classical optics experiment")
        ex = c.explain("col", "quantum", "d1")
        assert ex["matched"] is True and ex["score"] > 0
        assert ex["clauses"][0]["kind"] == "term"
        ex2 = c.explain("col", "quantum", "d2")
        assert ex2["matched"] is False and ex2["score"] == 0.0
        with pytest.raises(urllib.error.HTTPError) as e:
            c.explain("col", "quantum", "no-such-doc")
        assert e.value.code == 400
        sug = c.suggest("col", "quantun")
        assert sug[0]["term"] == "quantum" and sug[0]["distance"] == 1
        with pytest.raises(urllib.error.HTTPError) as e:
            c.suggest("col", "quantun", max_edits=7)
        assert e.value.code == 400
        # suggest goes through the facade like every endpoint: an empty
        # probe term is a 400, not a junk distance-len(term) scan
        with pytest.raises(urllib.error.HTTPError) as e:
            c.suggest("col", "")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            c.suggest("", "quantun")
        assert e.value.code == 400
        # autocomplete round-trip: (df desc, term asc), empty prefix a 400
        comp = c.complete("col", "qua")
        assert comp[0]["term"] == "quantum" and comp[0]["df"] == 1
        with pytest.raises(urllib.error.HTTPError) as e:
            c.complete("col", "")
        assert e.value.code == 400
    finally:
        service.shutdown()


def test_http_snippets(ray_session, tmp_path):
    """POST /snippets: hit bodies travel as a JSON object in the form; the
    response carries the best-window spans in rank order; malformed texts
    and a missing hit body are 400s."""
    service = LuceneHttpService(
        IndexConfig(index_root=str(tmp_path / "idxsn"), num_partitions=2),
        soft_commit_max_docs=100,
    ).start()
    try:
        c = LuceneHttpClient(service.url)
        c.index_text("col", "d1", "falcon dives at the falcon nest")
        c.index_text("col", "d2", "a falcon above the valley")
        c.index_text("col", "d3", "nothing to see here")
        texts = {
            "d1": "falcon dives at the falcon nest",
            "d2": "a falcon above the valley",
        }
        out = c.snippets("col", "falcon", texts, k=5, window=2)
        assert [r["external_id"] for r in out] == ["d1", "d2"]
        assert all(r["n_terms"] == 1 and "falcon" in r["snippet"] for r in out)
        with pytest.raises(urllib.error.HTTPError) as e:
            c.snippets("col", "falcon", {"d1": texts["d1"]})  # d2 body missing
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            c._post("snippets", {"collection": "col", "query": "falcon",
                                 "texts": "not-json"})
        assert e.value.code == 400
    finally:
        service.shutdown()


def test_http_demo_ui_served(svc):
    """GET / serves the demo page and /lucene-client.js the browser client
    (≙ the reference's public/index.html + lucene-client.js); the page's
    calls target live endpoints (probed via the same wire shapes the JS
    issues)."""
    import json
    import urllib.parse
    import urllib.request

    with urllib.request.urlopen(f"{svc.url.rsplit('/', 1)[0]}/") as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        page = r.read().decode()
    assert "lucene-client.js" in page
    assert 'id="text"' in page and 'id="map"' in page  # the two demo forms

    base = svc.url.rsplit("/", 1)[0]
    with urllib.request.urlopen(f"{base}/lucene-client.js") as r:
        assert r.status == 200
        assert "javascript" in r.headers["Content-Type"]
        js = r.read().decode()
    for call in ("indexText", "indexMap", "search", "deleteDoc", "clear"):
        assert f"LuceneClient.prototype.{call}" in js

    # the page's index→search round trip, exactly as the JS issues it
    body = urllib.parse.urlencode(
        {"collection": "ui", "id": "d1", "text": "browser demo works"}
    ).encode()
    req = urllib.request.Request(
        f"{svc.url}/index-text", data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read()) is True
    qs = urllib.parse.urlencode(
        {"collection": "ui", "query": "browser", "limit": 255}
    )
    with urllib.request.urlopen(f"{svc.url}/search?{qs}") as r:
        hits = json.loads(r.read())
    assert [h["_externalId"] for h in hits] == ["d1"]
