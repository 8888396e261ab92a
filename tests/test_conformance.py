"""Conformance tests — the reference's 11 test scenarios restated over the
synthetic corpus (SURVEY.md §5.1/§5.2 layer 2).  Each test cites the Java
test it mirrors."""

import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_delete_set, make_pages
from lucene_plugin_ray.pipelines.oracle import OracleIndex


@pytest.fixture(scope="module")
def coll_built(ray_session, tmp_path_factory):
    """Corpus with a collection column (FIXTURES.md §2)."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(300, seed=43, with_collections=True)
    root = str(tmp_path_factory.mktemp("idx_coll"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(corpus, cfg)
    return corpus, cfg, SearchEngine(root, cfg=cfg), OracleIndex(corpus, cfg)


@pytest.fixture(scope="module")
def fields_built(ray_session, tmp_path_factory):
    """Corpus with extra analyzed fields (FIXTURES.md §3, indexMap semantics)."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(200, seed=44, with_fields=True)
    root = str(tmp_path_factory.mktemp("idx_fields"))
    cfg = IndexConfig(
        index_root=root, num_partitions=4,
        field_columns=("lang", "foo", "age", "count"),
    )
    build_index(corpus, cfg)
    return corpus, cfg, SearchEngine(root, cfg=cfg), OracleIndex(corpus, cfg)


def _ranks(engine, oracle, query, coll="default", k=255):
    got = engine.search(query, collection=coll, limit=k)
    exp = oracle.search(query, collection=coll, limit=k)
    assert got["url"].to_pylist() == [u for u, _ in exp], query
    for s, (_, es) in zip(got["score"].to_pylist(), exp):
        assert abs(s - es) < 1e-6
    return got


# --- TestSearchCollection.java:28-53: collection isolation ---------------
def test_collection_isolation(coll_built):
    corpus, cfg, engine, oracle = coll_built
    colls = engine.collections()
    assert set(colls) >= {"default", "foo"} or set(colls) >= {"default", "bar"}
    # a head term appears in every collection; hits are scoped per collection
    for c in colls:
        got = engine.search("w00000", collection=c, limit=255)
        for u in got["url"].to_pylist():
            assert oracle.coll_of[oracle.docids[(c, u)]] == c
        _ranks(engine, oracle, "w00000", coll=c)


def test_clear_collection_scoping(coll_built, tmp_path_factory):
    # ≙ TestSearchCollection.java:44-52: clear one collection, other intact
    from lucene_plugin_ray.pipelines.build import clear_collection
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus, cfg, engine, oracle = coll_built
    target = [c for c in engine.collections() if c != "default"][0]
    clear_collection(cfg, target)
    eng2 = SearchEngine(cfg.index_root, cfg=cfg)
    assert eng2.search("w00000", collection=target, limit=255).num_rows == 0
    before = engine.search("w00000", collection="default", limit=255)
    after = eng2.search("w00000", collection="default", limit=255)
    assert before["url"].to_pylist() == after["url"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()


# --- TestSearchMap.java:30-59: field-scoped + range queries --------------
def test_field_scoped_term(fields_built):
    corpus, cfg, engine, oracle = fields_built
    got = _ranks(engine, oracle, "foo:lamb")
    assert got.num_rows > 0
    # ≙ TestDelete.java:69 'foo:lamb' only matches via the foo field
    assert engine.search("text:qqqnope", limit=255).num_rows == 0


def test_field_term_not_in_default_field(fields_built):
    corpus, cfg, engine, oracle = fields_built
    # 'lamb' only exists in field foo → default-field query misses it
    assert engine.search("lamb", limit=255).num_rows == 0


def test_string_range_positive(fields_built):
    # ≙ TestSearchMap.java:51-54: age:[23 TO 23] — lexicographic term range
    corpus, cfg, engine, oracle = fields_built
    got = _ranks(engine, oracle, "age:[23 TO 23]")
    expect = sum(
        1 for r in corpus.to_pylist()
        if r["age"] == "23"
        and (r["url"], r["warc_ts"]) in {
            (rr["url"], max(x["warc_ts"] for x in corpus.to_pylist() if x["url"] == rr["url"]))
            for rr in corpus.to_pylist() if rr["age"] == "23"
        }
    )
    assert got.num_rows > 0
    # all hits score exactly 1.0 (constant-score range, Lucene 5.x parity)
    assert all(s == 1.0 for s in got["score"].to_pylist())


def test_string_range_negative(fields_built):
    # ≙ TestSearchMap.java:56-58: count:[33 TO 34] → 0 (values are 30..32)
    corpus, cfg, engine, oracle = fields_built
    assert engine.search("count:[33 TO 34]", limit=255).num_rows == 0


def test_lang_field_term(fields_built):
    corpus, cfg, engine, oracle = fields_built
    _ranks(engine, oracle, "lang:de")
    _ranks(engine, oracle, "lang:en")


# --- TestDelete.java:29-79: delete by id ---------------------------------
def test_batch_delete(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(200, seed=45)
    deletes = make_delete_set(corpus, every=10)
    root = str(tmp_path_factory.mktemp("idx_del"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(corpus, cfg, deletes=deletes)
    engine = SearchEngine(root, cfg=cfg)
    oracle = OracleIndex(corpus, cfg, deletes=deletes)
    deleted_urls = set(deletes["url"].to_pylist())
    got = engine.search("w00000", limit=255)
    assert not (set(got["url"].to_pylist()) & deleted_urls)
    _ranks(engine, oracle, "w00000")
    # total doc count excludes deleted
    n, _ = engine._stats("default")
    assert n == len(set(corpus["url"].to_pylist())) - len(deleted_urls)


def test_incremental_delete_and_delta(ray_session, tmp_path_factory):
    """≙ TestDelete (incremental path) + TestIndexFile.java:32-59 growth +
    TestSearchWithUpdate.java:28-43 upsert across generations."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index, delete_docs
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(300, seed=46)
    # split: first 200 unique urls vs rest (plus overlapping upsert rows)
    urls = sorted(set(corpus["url"].to_pylist()))
    half = set(urls[:200])
    import pyarrow.compute as pc

    mask = pc.is_in(corpus["url"], value_set=pa.array(sorted(half)))
    part1 = corpus.filter(mask)
    part2 = corpus.filter(pc.invert(mask))

    root = str(tmp_path_factory.mktemp("idx_inc"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(part1, cfg)
    m2 = build_delta(part2, cfg)
    assert m2.generation == 1
    engine = SearchEngine(root, cfg=cfg)

    # incremental == full rebuild (rank + score identity vs oracle on full)
    oracle = OracleIndex(corpus, cfg)
    for q in ["w00000", "w00010 w00100", "pagehit", "dupmarker0", "oldmarker0"]:
        got = engine.search(q, limit=255)
        exp = oracle.search(q, limit=255)
        # docids differ across build paths; compare (url, score) multisets and
        # score-descending order
        g = sorted(zip(got["url"].to_pylist(), [round(s, 9) for s in got["score"].to_pylist()]))
        e = sorted((u, round(s, 9)) for u, s in exp)
        assert g == e, q

    # delete a known-visible url incrementally
    victim = engine.search("pagehit", limit=1)["url"].to_pylist()
    if victim:
        delete_docs(cfg, pa.table({"collection": ["default"], "url": victim}))
        eng3 = SearchEngine(root, cfg=cfg)
        assert victim[0] not in eng3.search("pagehit", limit=255)["url"].to_pylist()


def test_upsert_across_generations(ray_session, tmp_path_factory):
    # ≙ TestSearchWithUpdate.java:32-42: re-index id → old content gone
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    base = pa.table(
        {
            "url": ["u://0", "u://1"],
            "warc_ts": pa.array([1_000_000, 2_000_000], type=pa.timestamp("us")),
            "text": ["mary had a little lamb", "old content zebra"],
        }
    )
    delta = pa.table(
        {
            "url": ["u://1"],
            "warc_ts": pa.array([3_000_000], type=pa.timestamp("us")),
            "text": ["new content giraffe"],
        }
    )
    root = str(tmp_path_factory.mktemp("idx_up"))
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(base, cfg)
    build_delta(delta, cfg)
    eng = SearchEngine(root, cfg=cfg)
    assert eng.search("zebra").num_rows == 0          # old content gone
    assert eng.search("giraffe").num_rows == 1        # new content found
    assert eng.search("lamb").num_rows == 1           # untouched doc intact


def test_late_data_loses(ray_session, tmp_path_factory):
    """SURVEY.md §2.10: a delta row with OLDER warc_ts than the indexed
    version must lose the max-aggregate (order-independent last-write-wins),
    and a row-split incremental build equals the full rebuild."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    base = pa.table(
        {
            "url": ["u://0"],
            "warc_ts": pa.array([5_000_000], type=pa.timestamp("us")),
            "text": ["current version gazelle"],
        }
    )
    stale_delta = pa.table(
        {
            "url": ["u://0", "u://9"],
            "warc_ts": pa.array([1_000_000, 1_000_000], type=pa.timestamp("us")),
            "text": ["ancient version trilobite", "fresh doc quokka"],
        }
    )
    root = str(tmp_path_factory.mktemp("idx_late"))
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(base, cfg)
    build_delta(stale_delta, cfg)
    eng = SearchEngine(root, cfg=cfg)
    assert eng.search("gazelle").num_rows == 1    # newer version survives
    assert eng.search("trilobite").num_rows == 0  # stale delta row dropped
    assert eng.search("quokka").num_rows == 1     # genuinely-new row indexed


def test_row_split_incremental_equals_full(ray_session, tmp_path_factory):
    """Arbitrary ROW split (dup-url versions scattered across generations in
    both directions) — incremental chain == full rebuild == oracle."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.oracle import OracleIndex
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(250, seed=52)
    root = str(tmp_path_factory.mktemp("idx_rowsplit"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(corpus.slice(0, 150), cfg)
    build_delta(corpus.slice(150), cfg)
    engine = SearchEngine(root, cfg=cfg)
    oracle = OracleIndex(corpus, cfg)
    for q in ["w00000", "pagehit", "dupmarker0", "oldmarker0", "dupmarker1",
              "oldmarker1", "w00010 w00100"]:
        got = engine.search(q, limit=100)
        exp = oracle.search(q, limit=100)
        g = sorted(zip(got["url"].to_pylist(),
                       [round(s, 9) for s in got["score"].to_pylist()]))
        e = sorted((u, round(s, 9)) for u, s in exp)
        assert g == e, q


def test_unicode_corpus_build(ray_session, tmp_path_factory):
    """Non-ASCII text forces the exact Unicode tokenize path inside the
    segment build (the ASCII fast path must decline) — engine == oracle."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    rows = [
        ("u://0", 1, "Grüße aus München the straße café"),
        ("u://1", 2, "café CRÈME brûlée and naïve résumé"),
        ("u://2", 3, "日本語テキスト mixed with english words café"),
        ("u://3", 4, "Kelvin sign \u212aelvin temperature"),  # K → 'k' folding
        ("u://4", 5, "plain ascii only lamb"),
    ]
    corpus = pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] * 1_000_000 for r in rows], type=pa.timestamp("us")),
            "text": [r[2] for r in rows],
        }
    )
    root = str(tmp_path_factory.mktemp("idx_uni"))
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(corpus, cfg)
    engine = SearchEngine(root, cfg=cfg)
    oracle = OracleIndex(corpus, cfg)
    for q in ["caf", "english", "lamb", "kelvin", "gr", "e"]:
        got = engine.search(q, limit=10)
        exp = oracle.search(q, limit=10)
        assert got["url"].to_pylist() == [u for u, _ in exp], q
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6


def test_generation_pinning(ray_session, tmp_path_factory):
    """≙ T2 searcher versioning: a SearchEngine pinned to an older
    generation sees the pre-delta state (time travel)."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    base = pa.table(
        {
            "url": ["u://0"],
            "warc_ts": pa.array([1_000_000], type=pa.timestamp("us")),
            "text": ["original aardwolf content"],
        }
    )
    delta = pa.table(
        {
            "url": ["u://0"],
            "warc_ts": pa.array([2_000_000], type=pa.timestamp("us")),
            "text": ["replacement bandicoot content"],
        }
    )
    root = str(tmp_path_factory.mktemp("idx_pin"))
    cfg = IndexConfig(index_root=root, num_partitions=2)
    build_index(base, cfg)
    build_delta(delta, cfg)
    latest = SearchEngine(root, cfg=cfg)
    pinned = SearchEngine(root, generation=0, cfg=cfg)
    assert latest.generation == 1 and pinned.generation == 0
    assert latest.search("bandicoot").num_rows == 1
    assert latest.search("aardwolf").num_rows == 0
    assert pinned.search("aardwolf").num_rows == 1   # old generation intact
    assert pinned.search("bandicoot").num_rows == 0


def test_mixed_must_and_range(fields_built):
    """Mixed clause kinds: required term + range + optional term — engine
    must match the oracle's BooleanQuery semantics (all-MUST gate, every
    matching clause contributes; range contributes constant 1.0)."""
    corpus, cfg, engine, oracle = fields_built
    for q in [
        "+foo:lamb age:[23 TO 23]",          # MUST term + SHOULD range
        "+age:[22 TO 24] foo:lamb",          # MUST range + SHOULD term
        "+foo:lamb +age:[20 TO 29]",         # MUST term + MUST range
        "foo:lamb age:[23 TO 23] w00001",    # all SHOULD, mixed kinds
    ]:
        got = engine.search(q, limit=255)
        exp = oracle.search(q, limit=255)
        assert got["url"].to_pylist() == [u for u, _ in exp], q
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, q


def test_must_not_rank_identity(fields_built):
    """MUST_NOT (-term / NOT): prohibited clauses exclude their matches and
    never score — engine vs brute-force oracle across clause kinds, incl.
    prohibited phrase / range / prefix clauses and the no-positive-clause
    degenerate (matches nothing, Lucene BooleanQuery)."""
    corpus, cfg, engine, oracle = fields_built
    for q in [
        "pagehit -w00000",
        "pagehit NOT w00000",
        "+w00000 AND NOT w00001",
        "w00000 w00001 -w00002",
        "+foo:lamb -age:[23 TO 23]",
        "pagehit -w0000*",
        'w00000 -"w00001 w00002"',
        "pagehit -zzznope",            # prohibited term absent: no-op
        "-pagehit",                    # no positive clause: empty
    ]:
        got = engine.search(q, limit=255)
        exp = oracle.search(q, limit=255)
        assert got["url"].to_pylist() == [u for u, _ in exp], q
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, q
        # count/facet twin agrees with the full match set
        assert engine.count(q) == len(oracle.search(q, limit=10**9)), q


def test_synonym_query_rank_identity(fields_built):
    """SynonymQuery semantics (Lucene org.apache.lucene.search.SynonymQuery
    under BM25): the group scores as ONE pseudo-term — per-doc tf is the
    SUM of member tfs, idf uses the MAX member df.  Engine vs brute-force
    oracle, incl. MUST / MUST_NOT synonym groups and absent members."""
    corpus, cfg, engine, oracle = fields_built
    cases = [
        ("w00000", {"w00000": ["w00001"]}),
        ("w00000 w00005", {"w00000": ["w00001", "w00002"]}),
        ("+w00000 +w00003", {"w00000": ["w00001"]}),
        ("pagehit -w00000", {"w00000": ["w00001"]}),     # prohibited group
        ("w00000", {"w00000": ["zzznope"]}),             # absent member
        ("w00000", {"other": ["w00001"]}),               # map misses: plain
        ("(w00000) w00005", {"w00000": ["w00001", "w00002"]}),  # in a group
    ]
    for q, syn in cases:
        got = engine.search(q, limit=255, synonyms=syn)
        exp = oracle.search(q, limit=255, synonyms=syn)
        assert got["url"].to_pylist() == [u for u, _ in exp], (q, syn)
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, (q, syn)
        assert engine.count(q, synonyms=syn) == len(
            oracle.search(q, limit=10**9, synonyms=syn)
        ), (q, syn)
    # a synonym group strictly widens the match set
    plain = engine.count("w00000")
    grouped = engine.count("w00000", synonyms={"w00000": ["w00001"]})
    assert grouped >= plain
    # no synonyms arg == plain query (cache keys must not collide)
    a = engine.search("w00000", limit=10)
    b = engine.search("w00000", limit=10, synonyms={"w00000": ["w00001"]})
    c = engine.search("w00000", limit=10)
    assert a.equals(c) and not a.equals(b)
    # synonym rewrite recurses into parenthesized groups: '(a) b' expands
    # exactly like 'a b' (a 1-term group contributes the same score), and
    # prohibiting a grouped synonym term prohibits every member
    syn = {"w00000": ["w00001", "w00002"]}
    assert engine.search("(w00000) w00005", limit=255, synonyms=syn).equals(
        engine.search("w00000 w00005", limit=255, synonyms=syn)
    )
    assert engine.count("pagehit -(w00000)", synonyms=syn) == engine.count(
        "pagehit -w00000", synonyms=syn
    )


def test_boost_rank_identity(fields_built):
    """Boost (Q12): ^n multiplies the clause score; constant-score clauses
    contribute the boost itself.  Engine vs brute-force oracle across
    clause kinds, plus a direct doubling check."""
    corpus, cfg, engine, oracle = fields_built
    for q in [
        "w00000^2 w00001",
        "w00000^0.5 w00001^3",
        "+w00000^2 +w00001",
        '"w00000 w00001"^2 w00002',
        "+foo:lamb age:[23 TO 23]^5",
        "w0000*^2 w00005",
        "pagehit -w00000^9",          # boost on a prohibited clause: inert
    ]:
        got = engine.search(q, limit=255)
        exp = oracle.search(q, limit=255)
        assert got["url"].to_pylist() == [u for u, _ in exp], q
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, q
    # ^2 exactly doubles a single-term query's scores
    base = engine.search("w00000", limit=20)
    twice = engine.search("w00000^2", limit=20)
    assert base["url"].to_pylist() == twice["url"].to_pylist()
    for a, b in zip(base["score"].to_pylist(), twice["score"].to_pylist()):
        assert abs(b - 2.0 * a) < 1e-9
    # explain still sums bit-for-bit under boosts
    url = base["url"][0].as_py()
    ex = engine.explain("w00000^2 w00001^0.5", url)
    assert ex["score"] == engine.search(
        "w00000^2 w00001^0.5", limit=255
    ).filter(pa.compute.equal(
        engine.search("w00000^2 w00001^0.5", limit=255)["url"], url
    ))["score"][0].as_py()


def test_group_rank_identity(fields_built):
    """Parenthesized groups (Q13, nested BooleanQuery): a group matches per
    its inner semantics and contributes its inner sum x boost.  Engine vs
    brute-force oracle over nested / boosted / prohibited / field-scoped
    groups and mixed kinds."""
    corpus, cfg, engine, oracle = fields_built
    for q in [
        "(w00000 w00001) AND w00002",
        "(w00000 w00001)^2 w00002",
        "-(w00000 w00001) pagehit",
        "((w00000 AND w00001) w00002) w00003",
        "(+w00000 +w00001) OR (w00002 w00003)",
        "foo:(lamb little) w00000",
        '(pagehit "w00000 w00001") -(lorem)',
        "(age:[23 TO 23] foo:lamb) AND w00000",
        "(w0000* w00005)^3",
    ]:
        got = engine.search(q, limit=255)
        exp = oracle.search(q, limit=255)
        assert got["url"].to_pylist() == [u for u, _ in exp], q
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, q
        assert engine.count(q) == len(oracle.search(q, limit=10**9)), q


def test_dismax_rank_identity(fields_built):
    """DisjunctionMaxQuery (Solr dismax): every default-field TERM clause
    expands across the field→weight map; per doc the max weighted leg plus
    tie·(sum − max).  Engine vs brute-force oracle across occur kinds,
    weights and ties; explicitly field-scoped clauses stay untouched."""
    corpus, cfg, engine, oracle = fields_built
    cases = [
        ("lamb", {"text": 1.0, "foo": 1.0}, 0.0),
        ("lamb", {"text": 1.0, "foo": 2.0}, 0.5),
        ("w00000 lamb", {"text": 1.0, "foo": 3.0}, 0.1),
        ("+w00000 +lamb", {"text": 1.0, "foo": 1.0}, 1.0),
        ("pagehit -lamb", {"text": 1.0, "foo": 1.0}, 0.0),   # prohibited dismax
        ("(w00000 lamb) w00005", {"text": 1.0, "foo": 2.0}, 0.3),  # in groups
        ("foo:lamb w00000", {"text": 1.0, "foo": 2.0}, 0.3),  # scoped stays
        ("w00000^2 lamb", {"text": 1.0, "foo": 2.0}, 0.3),    # boost on dismax
    ]
    for q, f, tie in cases:
        got = engine.search(q, limit=255, fields=f, tie_breaker=tie)
        exp = oracle.search(q, limit=255, fields=f, tie_breaker=tie)
        assert got["url"].to_pylist() == [u for u, _ in exp], (q, f, tie)
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, (q, f, tie)
        assert engine.count(q, fields=f) == len(
            oracle.search(q, limit=10**9, fields=f)
        ), (q, f)
    # single-field weight-1 dismax == the plain query (max of one leg)
    a = engine.search("w00000 w00005", limit=255)
    b = engine.search(
        "w00000 w00005", limit=255, fields={"text": 1.0}, tie_breaker=0.7
    )
    assert a.equals(b)
    # cache keys must not collide across fields variants (no same-term
    # field overlap in this corpus, so tie distinctness is asserted in
    # test_dismax_tie_math_with_overlapping_fields instead)
    c = engine.search("lamb", limit=10, fields={"text": 1.0, "foo": 2.0})
    d = engine.search("lamb", limit=10)
    assert not c.equals(d)


def test_dismax_tie_math_with_overlapping_fields(ray_session, tmp_path):
    """A term living in BOTH fields exercises the max + tie·rest arithmetic:
    verified against legs computed via separate single-field searches."""
    import datetime as dt

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    ts = dt.datetime(2026, 1, 1)
    pages = pa.table(
        {
            "url": [f"doc://{i}" for i in range(4)],
            "warc_ts": pa.array([ts] * 4, pa.timestamp("us")),
            "text": [
                "alpha beta gamma",
                "beta beta alpha",
                "gamma delta",
                "alpha alpha alpha",
            ],
            "lang": ["alpha", "en", "alpha", "en"],
            "source": ["s0", "s1", "s0", "s1"],
        }
    )
    root = str(tmp_path / "dmx")
    cfg = IndexConfig(
        index_root=root, num_partitions=2, field_columns=("lang", "source")
    )
    build_index(pages, cfg)
    eng = SearchEngine(root, cfg=cfg)
    t_leg = {
        r["url"]: r["score"] for r in eng.search("alpha", limit=100).to_pylist()
    }
    l_leg = {
        r["url"]: r["score"]
        for r in eng.search("lang:alpha", limit=100).to_pylist()
    }
    assert set(t_leg) & set(l_leg)  # overlap exists: doc://0
    for tie in (0.0, 0.5, 1.0):
        got = {
            r["url"]: r["score"]
            for r in eng.search(
                "alpha",
                fields={"text": 1.0, "lang": 2.0},
                tie_breaker=tie,
                limit=100,
            ).to_pylist()
        }
        exp = {}
        for u in set(t_leg) | set(l_leg):
            a, b = t_leg.get(u, 0.0), 2.0 * l_leg.get(u, 0.0)
            exp[u] = max(a, b) + tie * (a + b - max(a, b))
        assert set(got) == set(exp)
        for u in exp:
            assert abs(got[u] - exp[u]) < 1e-12, (tie, u)
    # tie distinctness (cache keys must not collide): doc://0 carries both
    # legs, so different ties give different scores
    s0 = eng.search(
        "alpha", fields={"text": 1.0, "lang": 2.0}, tie_breaker=0.0, limit=100
    )
    s1 = eng.search(
        "alpha", fields={"text": 1.0, "lang": 2.0}, tie_breaker=1.0, limit=100
    )
    assert not s0.equals(s1)


def test_dismax_validation(fields_built):
    corpus, cfg, engine, oracle = fields_built
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dismax field"):
        engine.search("lamb", fields={"nope": 1.0})
    with _pytest.raises(ValueError, match="must be > 0"):
        engine.search("lamb", fields={"text": 0.0})
    with _pytest.raises(ValueError, match="tie_breaker"):
        engine.search("lamb", fields={"text": 1.0}, tie_breaker=1.5)
    with _pytest.raises(ValueError, match="non-empty"):
        engine.search("lamb", fields={})


def test_min_should_match_rank_identity(fields_built):
    """BooleanQuery.setMinimumNumberShouldMatch: a doc must match ≥ mm
    SHOULD clauses on top of every MUST; scores stay the full matching-sum.
    Engine vs brute-force oracle, incl. mm > |SHOULD| (zero hits, Lucene
    parity), mm with MUSTs, mm over groups/phrases, and count parity."""
    corpus, cfg, engine, oracle = fields_built
    cases = [
        ("w00000 w00001 w00002", 2),
        ("w00000 w00001 w00002", 3),
        ("pagehit w00000 w00001 w00002", 1),   # mm=1 ≡ plain OR
        ("+pagehit w00000 w00001", 1),         # MUST + mm over shoulds
        ("w00000 w00001 -w00002", 2),          # mm with a prohibited clause
        ('w00000 "w00001 w00002" foo:lamb', 2),  # mixed clause kinds
        ("w00000 w00001", 3),                  # mm > |SHOULD| → zero hits
    ]
    for q, mm in cases:
        got = engine.search(q, limit=255, min_should_match=mm)
        exp = oracle.search(q, limit=255, min_should_match=mm)
        assert got["url"].to_pylist() == [u for u, _ in exp], (q, mm)
        for s, (_, es) in zip(got["score"].to_pylist(), exp):
            assert abs(s - es) < 1e-6, (q, mm)
        assert engine.count(q, min_should_match=mm) == len(
            oracle.search(q, limit=10**9, min_should_match=mm)
        ), (q, mm)
    # mm=1 on a pure-OR equals the plain query; mm tightens monotonically
    a = engine.search("w00000 w00001 w00002", limit=255)
    b = engine.search("w00000 w00001 w00002", limit=255, min_should_match=1)
    assert a.equals(b)
    n1 = engine.count("w00000 w00001 w00002", min_should_match=1)
    n2 = engine.count("w00000 w00001 w00002", min_should_match=2)
    n3 = engine.count("w00000 w00001 w00002", min_should_match=3)
    assert n1 >= n2 >= n3
    # scores of surviving docs are unchanged by the filter
    surv = set(engine.search("w00000 w00001 w00002", limit=255,
                             min_should_match=2)["url"].to_pylist())
    full = {r["url"]: r["score"]
            for r in engine.search("w00000 w00001 w00002", limit=10**9).to_pylist()}
    for r in engine.search("w00000 w00001 w00002", limit=255,
                           min_should_match=2).to_pylist():
        assert abs(full[r["url"]] - r["score"]) < 1e-12
    assert surv <= set(full)
    with pytest.raises(ValueError):
        engine.search("w00000", min_should_match=-1)
