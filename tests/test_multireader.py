"""MultiReader analogue (sharded.py::MultiIndexSearcherService): a federated
searcher over several independently built roots answers every API
bit-identically (urls + scores) to a single index built over the union
corpus — the doc-disjoint + injected-global-stats exactness argument — and
the routed point lookups probe roots in order."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages


def _split_by_url(pages: pa.Table, n_ways: int) -> list[pa.Table]:
    """Doc-disjoint split: every version of a url stays in one part (the
    MultiReader contract; splitting versions would change LWW locally).
    Seed-stable hashing (md5, not the salted builtin) so the split — and
    therefore which probe paths each test run exercises — is identical
    across pytest runs."""
    import hashlib

    urls = np.asarray(pages["url"].to_pylist(), dtype=object)
    buckets = np.array(
        [int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "big") % n_ways
         for u in urls],
        dtype=np.int64,
    )
    return [
        pages.filter(pa.array(buckets == k)) for k in range(n_ways)
    ]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    pages = make_pages(300, seed=17, with_fields=True)
    base = tmp_path_factory.mktemp("mr")
    union_root = str(base / "union")
    ucfg = IndexConfig(
        index_root=union_root, num_partitions=4,
        field_columns=("foo", "age"),
    )
    build_index(pages, ucfg)
    roots, parts = [], _split_by_url(pages, 2)
    for k, part in enumerate(parts):
        root = str(base / f"sub{k}")
        cfg = IndexConfig(
            # deliberately DIFFERENT partition counts per root — the
            # federation must not assume a uniform layout
            index_root=root, num_partitions=2 + k,
            field_columns=("foo", "age"),
        )
        build_index(part, cfg)
        roots.append(root)
    engine = SearchEngine(union_root, cfg=ucfg)
    return pages, union_root, ucfg, roots, engine


def _pairs(t: pa.Table) -> list[tuple]:
    return list(zip(t["url"].to_pylist(),
                    [round(s, 10) for s in t["score"].to_pylist()]))


def test_federation_equals_union_index(built):
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    pages, _union_root, ucfg, roots, engine = built
    svc = MultiIndexSearcherService(roots, cfg=ucfg)
    try:
        # ranked search through the batch protocol
        q = pa.table({"qid": [0, 1, 2],
                      "query": ["pagehit", "w00001 w00002", "+w00001 -w00002"],
                      "k": [25, 25, 25]})
        got = svc.search_batch(q)
        exp_rows = []
        for qid, query in enumerate(
            ["pagehit", "w00001 w00002", "+w00001 -w00002"]
        ):
            e = engine.search(query, limit=25)
            exp_rows += [
                (qid, r, u, round(s, 10))
                for r, (u, s) in enumerate(
                    zip(e["url"].to_pylist(), e["score"].to_pylist())
                )
            ]
        got_rows = [
            (r["qid"], r["rank"], r["url"], round(r["score"], 10))
            for r in got.to_pylist()
        ]
        assert got_rows == exp_rows

        # count / facets / top_terms (TPUT exact top-k across roots)
        assert svc.count("pagehit") == engine.count("pagehit")
        assert svc.facets("pagehit", "foo").equals(
            engine.facets("pagehit", "foo")
        )
        assert svc.top_terms(k=15).equals(engine.top_terms(k=15))

        # filtered search / query-time join through the inherited partials
        assert _pairs(
            svc.search_filtered("pagehit", "foo:v1 foo:v3", limit=20)
        ) == _pairs(
            engine.search_filtered("pagehit", "foo:v1 foo:v3", limit=20)
        )
        for mode in ("none", "max", "total"):
            assert _pairs(
                svc.search_join("pagehit", "foo", "foo",
                                score_mode=mode, limit=20)
            ) == _pairs(
                engine.search_join("pagehit", "foo", "foo",
                                   score_mode=mode, limit=20)
            )
    finally:
        svc.shutdown()


def test_routed_lookups_probe_roots(built):
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    pages, _union_root, ucfg, roots, engine = built
    svc = MultiIndexSearcherService(roots, cfg=ucfg)
    try:
        # one live url from EACH sub-root (deterministic split) — both
        # probe branches of the first-sub-reader rule run every time
        probe_urls = [p["url"][0].as_py() for p in _split_by_url(pages, 2)]
        for url in probe_urls:
            tv = svc.term_vector(url)
            assert tv.equals(engine.term_vector(url))
            ex = svc.explain("pagehit w00001", url)
            exe = engine.explain("pagehit w00001", url)
            # docid is SUB-INDEX-LOCAL by contract (leaf docids, no
            # MultiReader docBase rebase) — everything else, including the
            # federation-global score arithmetic, must agree exactly
            ex.pop("docid"), exe.pop("docid")
            assert ex == exe
        with pytest.raises(KeyError, match="not live"):
            svc.term_vector("doc://nowhere")
        with pytest.raises(ValueError, match="not analyzed"):
            svc.term_vector(probe_urls[0], field="nope")
    finally:
        svc.shutdown()


def test_three_roots_and_per_root_generations(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    pages = make_pages(200, seed=23)
    parts = _split_by_url(pages, 3)
    delta = make_pages(40, seed=24)
    # the delta's urls overlap pages' — route them to the SAME sub-root the
    # base version lives in (url-disjointness across roots must survive)
    dparts = _split_by_url(delta, 3)
    roots = []
    for k, part in enumerate(parts):
        root = str(tmp_path / f"s{k}")
        cfg = IndexConfig(index_root=root, num_partitions=2)
        build_index(part, cfg)
        if dparts[k].num_rows:
            build_delta(dparts[k], cfg)  # sub-roots at generation 1
        roots.append(root)
    union_root = str(tmp_path / "u")
    ucfg = IndexConfig(index_root=union_root, num_partitions=4)
    build_index(pages, ucfg)
    build_delta(delta, ucfg)
    engine = SearchEngine(union_root, cfg=ucfg)
    svc = MultiIndexSearcherService(roots, cfg=ucfg)
    try:
        q = pa.table({"qid": [0], "query": ["w00001 w00003"], "k": [30]})
        got = [(r["rank"], r["url"], round(r["score"], 10))
               for r in svc.search_batch(q).to_pylist()]
        e = engine.search("w00001 w00003", limit=30)
        exp = [(r, u, round(s, 10)) for r, (u, s) in enumerate(
            zip(e["url"].to_pylist(), e["score"].to_pylist()))]
        assert got == exp
        assert svc.count("w00001") == engine.count("w00001")
    finally:
        svc.shutdown()


def test_validation(built):
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    _pages, _union_root, ucfg, roots, _engine = built
    with pytest.raises(ValueError, match="distinct"):
        MultiIndexSearcherService([roots[0], roots[0]], cfg=ucfg)
    with pytest.raises(ValueError, match="distinct"):
        MultiIndexSearcherService([], cfg=ucfg)
    with pytest.raises(ValueError, match="align"):
        MultiIndexSearcherService(roots, cfg=ucfg, generations=[0])


def test_text_column_mismatch_is_loud(built, tmp_path):
    """A root that analyzed a DIFFERENT text column would silently answer
    empty for every query — construction must refuse it."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    _pages, _union_root, ucfg, roots, _engine = built
    pages = make_pages(30, seed=5)
    body_root = str(tmp_path / "body")
    body_cfg = IndexConfig(
        index_root=body_root, num_partitions=2, text_column="body"
    )
    build_index(pages.rename_columns(
        ["body" if c == "text" else c for c in pages.column_names]
    ), body_cfg)
    with pytest.raises(ValueError, match="never indexed text column"):
        MultiIndexSearcherService([roots[0], body_root], cfg=ucfg)


def test_federation_session9_surfaces_equal_union(built):
    """The session-9 read APIs inherited by the federation are
    bit-identical to the union index: spans, surround, expression,
    common-terms, boosting, diversified, STRING sort, infix complete."""
    from lucene_plugin_ray.pipelines.sharded import MultiIndexSearcherService

    pages, _union_root, ucfg, roots, engine = built
    svc = MultiIndexSearcherService(roots, cfg=ucfg)
    try:
        assert _pairs(svc.span_near(["w00001", "w00002"], slop=2)) == _pairs(
            engine.span_near(["w00001", "w00002"], slop=2)
        )
        assert _pairs(
            svc.span_near(["w00002", "w00001"], slop=1, in_order=False)
        ) == _pairs(
            engine.span_near(["w00002", "w00001"], slop=1, in_order=False)
        )
        assert _pairs(svc.span_first("w00001", 4)) == _pairs(
            engine.span_first("w00001", 4)
        )
        assert _pairs(
            svc.span_not("w00001", "w00002", pre=1, post=1)
        ) == _pairs(engine.span_not("w00001", "w00002", pre=1, post=1))
        assert _pairs(
            svc.search_surround("w00001 3w w00002 OR pagehit")
        ) == _pairs(engine.search_surround("w00001 3w w00002 OR pagehit"))
        assert _pairs(
            svc.search_expression(
                "pagehit", "_score * k / (k + doc_len)", bindings={"k": 9.0}
            )
        ) == _pairs(
            engine.search_expression(
                "pagehit", "_score * k / (k + doc_len)", bindings={"k": 9.0}
            )
        )
        df0 = float(engine.count("w00001"))
        assert _pairs(
            svc.search_common("w00001 w00002 pagehit",
                              max_term_frequency=df0)
        ) == _pairs(
            engine.search_common("w00001 w00002 pagehit",
                                 max_term_frequency=df0)
        )
        assert _pairs(
            svc.search_boosting("w00001 w00002", "pagehit", demote=0.25)
        ) == _pairs(
            engine.search_boosting("w00001 w00002", "pagehit", demote=0.25)
        )
        a = svc.search_diversified("w00001 w00002", "foo", max_per_key=2)
        b = engine.search_diversified("w00001 w00002", "foo", max_per_key=2)
        assert _pairs(a) == _pairs(b)
        assert a["key"].to_pylist() == b["key"].to_pylist()
        a = svc.search_sorted_by(
            "pagehit", [("foo", "asc"), ("warc_ts", "desc")], limit=50
        )
        b = engine.search_sorted_by(
            "pagehit", [("foo", "asc"), ("warc_ts", "desc")], limit=50
        )
        # docids are SUB-INDEX-LOCAL by the federation contract
        assert a.drop_columns(["docid"]).equals(b.drop_columns(["docid"]))
        assert svc.complete_infix("agehi", k=5).equals(
            engine.complete_infix("agehi", k=5)
        )
        # the union field list validates (foo indexed by every root here)
        with pytest.raises(ValueError):
            svc.search_diversified("pagehit", "nope")
        with pytest.raises(ValueError):
            svc.search_sorted_by("pagehit", [("nope", "asc")])
    finally:
        svc.shutdown()
