"""Index repartitioning (pipelines/repartition.py): re-sharding the live
view to any partition count preserves EVERY query answer bit-for-bit
(scores, facets, term vectors, phrase positions), passes CheckIndex, and
conserves the live doc census; guards are loud."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages
from lucene_plugin_ray.pipelines.repartition import repartition_index

_QUERIES = (
    "pagehit",
    "w00001 w00003",
    "+w00001 -w00002",
    '"w00001 w00002"~3',
    "foo:v1",
    "w0001*",
    "text:[w00001 TO w00004]",
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        delete_docs,
    )
    from lucene_plugin_ray.pipelines.query import SearchEngine

    src = str(tmp_path_factory.mktemp("rp") / "src")
    cfg = IndexConfig(
        index_root=src, num_partitions=3, field_columns=("foo", "age")
    )
    pages = make_pages(250, seed=9, with_fields=True)
    build_index(pages, cfg)
    build_delta(make_pages(40, seed=10, with_fields=True), cfg)
    delete_docs(
        cfg,
        pa.table({"collection": ["default"], "url": [pages["url"][0].as_py()]}),
    )
    return src, cfg, SearchEngine(src, cfg=cfg), pages


def _dst_engine(dst: str, P: int):
    from lucene_plugin_ray.pipelines.query import SearchEngine

    return SearchEngine(
        dst,
        cfg=IndexConfig(
            index_root=dst, num_partitions=P, field_columns=("foo", "age")
        ),
    )


@pytest.mark.parametrize("P", [1, 5, 8])
def test_every_answer_is_bit_identical(built, tmp_path, P):
    from lucene_plugin_ray.pipelines.check import check_index

    src, _cfg, eng, pages = built
    dst = str(tmp_path / f"dst{P}")
    m = repartition_index(src, dst, P)
    deng = _dst_engine(dst, P)
    for q in _QUERIES:
        a, b = eng.search(q, limit=10**9), deng.search(q, limit=10**9)
        assert a["url"].to_pylist() == b["url"].to_pylist(), (P, q)
        assert a["score"].to_pylist() == b["score"].to_pylist(), (P, q)
    assert eng.count("pagehit") == deng.count("pagehit")
    assert eng.facets("pagehit", "foo").equals(deng.facets("pagehit", "foo"))
    url = pages["url"][7].as_py()
    assert eng.term_vector(url).equals(deng.term_vector(url))
    chk = check_index(dst)
    assert chk.filter(pc.invert(chk["ok"])).num_rows == 0
    # live doc census conserved; the manifest records its lineage
    assert sum(r["n_docs"] for r in m.partitions) == eng.count("*:*")
    assert m.extra["repartitioned_from"] == src
    assert m.extra["old_partitions"] == 3
    assert m.num_partitions == P


def test_round_trip_back_to_original_count(built, tmp_path):
    src, _cfg, eng, _pages = built
    mid = str(tmp_path / "mid")
    back = str(tmp_path / "back")
    repartition_index(src, mid, 5)
    repartition_index(mid, back, 3)
    beng = _dst_engine(back, 3)
    for q in ("pagehit", '"w00001 w00002"~3'):
        a, b = eng.search(q, limit=10**9), beng.search(q, limit=10**9)
        assert a["url"].to_pylist() == b["url"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_sharded_service_over_destination(built, tmp_path):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    src, _cfg, eng, _pages = built
    dst = str(tmp_path / "dst_svc")
    repartition_index(src, dst, 6)
    svc = ShardedSearcherService(
        dst,
        cfg=IndexConfig(
            index_root=dst, num_partitions=6, field_columns=("foo", "age")
        ),
        num_shards=3,
    )
    try:
        q = pa.table({"qid": [0], "query": ["pagehit"], "k": [20]})
        got = svc.search_batch(q)
        exp = eng.search("pagehit", limit=20)
        assert got["url"].to_pylist() == exp["url"].to_pylist()
        assert got["score"].to_pylist() == exp["score"].to_pylist()
    finally:
        svc.shutdown()


def test_zero_term_segment_keeps_positions(ray_session, tmp_path):
    """A delta whose docs ALL analyze to zero tokens (stopword-only text)
    produces live-doc segments with an EMPTY dictionary — vacuously
    positions-capable (SegmentReader.has_positions parity).  Its blocks
    must not strip positions from the destination partitions they land in:
    phrase answers stay bit-identical and non-empty."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    src = str(tmp_path / "zsrc")
    cfg = IndexConfig(index_root=src, num_partitions=2, field_columns=())
    build_index(make_pages(60, seed=12), cfg)
    d = make_pages(8, seed=13)
    d = d.set_column(
        d.schema.get_field_index("text"),
        "text",
        pa.array(["the and of to"] * d.num_rows),
    )
    build_delta(d, cfg)
    eng = SearchEngine(src, cfg=cfg)

    dst = str(tmp_path / "zdst")
    repartition_index(src, dst, 3)
    deng = SearchEngine(
        dst, cfg=IndexConfig(index_root=dst, num_partitions=3)
    )
    for q in ('"w00001 w00002"~3', "pagehit"):
        a, b = eng.search(q, limit=10**9), deng.search(q, limit=10**9)
        assert a["url"].to_pylist() == b["url"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    assert eng.search('"w00001 w00002"~3', limit=10**9).num_rows > 0


def test_guards(built, tmp_path):
    src, _cfg, _eng, _pages = built
    with pytest.raises(ValueError, match="new_partitions"):
        repartition_index(src, str(tmp_path / "x"), 0)
    with pytest.raises(ValueError, match="same"):
        repartition_index(src, src + "/", 4)
    dst = str(tmp_path / "occupied")
    repartition_index(src, dst, 2)
    with pytest.raises(FileExistsError, match="already holds"):
        repartition_index(src, dst, 2)


# ------------------------------------------------------------ addIndexes ----


@pytest.fixture(scope="module")
def merge_built(ray_session, tmp_path_factory):
    """Two disjoint corpora in independently built roots (different
    partition counts) plus the union index they must equal after a
    physical merge."""
    import hashlib

    import numpy as np

    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    base = tmp_path_factory.mktemp("mi")
    pages = make_pages(260, seed=29, with_fields=True)
    urls = pages["url"].to_pylist()
    mask = pa.array(
        [int(hashlib.md5(u.encode()).hexdigest(), 16) % 2 == 0 for u in urls]
    )
    a_tab, b_tab = pages.filter(mask), pages.filter(pc.invert(mask))
    cfg_a = IndexConfig(index_root=str(base / "a"), num_partitions=2,
                        field_columns=("foo", "age"))
    cfg_b = IndexConfig(index_root=str(base / "b"), num_partitions=3,
                        field_columns=("foo", "age"))
    build_index(a_tab, cfg_a)
    build_index(b_tab, cfg_b)
    ucfg = IndexConfig(index_root=str(base / "u"), num_partitions=4,
                       field_columns=("foo", "age"))
    build_index(pages, ucfg)
    return base, cfg_a, cfg_b, ucfg, SearchEngine(ucfg.index_root, cfg=ucfg)


def test_merge_equals_union_index(merge_built, tmp_path):
    """addIndexes: the merged root answers every query shape identically
    to the index built over the union corpus, passes CheckIndex, and the
    manifest records lineage."""
    from lucene_plugin_ray.pipelines.check import check_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    base, cfg_a, cfg_b, ucfg, ueng = merge_built
    dst = str(tmp_path / "merged")
    m = merge_indexes([cfg_a.index_root, cfg_b.index_root], dst,
                      num_partitions=4)
    assert m.extra["merged_from"] == [cfg_a.index_root, cfg_b.index_root]
    dcfg = IndexConfig(index_root=dst, num_partitions=4,
                       field_columns=("foo", "age"))
    meng = SearchEngine(dst, cfg=dcfg)
    for q in _QUERIES:
        a = meng.search(q, limit=10**9)
        b = ueng.search(q, limit=10**9)
        assert a["url"].to_pylist() == b["url"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    assert meng.count("pagehit") == ueng.count("pagehit")
    assert meng.facets("pagehit", "foo").equals(ueng.facets("pagehit", "foo"))
    assert meng.top_terms(k=12).equals(ueng.top_terms(k=12))
    # a positional read off the merged index
    url = ueng.search("pagehit", limit=1)["url"][0].as_py()
    assert meng.term_vector(url).equals(ueng.term_vector(url))
    rep = check_index(dst)
    assert set(rep["ok"].to_pylist()) == {True}


def test_merge_default_partitions_is_max_source(merge_built, tmp_path):
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    base, cfg_a, cfg_b, _ucfg, _ueng = merge_built
    m = merge_indexes([cfg_a.index_root, cfg_b.index_root],
                      str(tmp_path / "dflt"))
    assert m.num_partitions == 3  # max(2, 3)


def test_merge_field_union_is_evolution_semantics(ray_session, tmp_path):
    """Sources with DIFFERENT field lists: the merged index carries the
    union; docs from the field-less root answer missing (string sort
    last, facet absent) — the append-only evolution contract."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    rows_a = pa.table({
        "url": ["a1", "a2"],
        "warc_ts": [1_600_000_000_000_000, 1_600_000_000_000_001],
        "html": [b"", b""],
        "text": ["common alpha", "common beta"],
        "lang": ["en", "en"],
        "foo": ["zz", "aa"],
    })
    rows_b = pa.table({
        "url": ["b1"],
        "warc_ts": [1_600_000_000_000_002],
        "html": [b""],
        "text": ["common gamma"],
        "lang": ["en"],
    })
    cfg_a = IndexConfig(index_root=str(tmp_path / "fa"), num_partitions=2,
                        field_columns=("foo",))
    cfg_b = IndexConfig(index_root=str(tmp_path / "fb"), num_partitions=1)
    build_index(rows_a, cfg_a)
    build_index(rows_b, cfg_b)
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    dst = str(tmp_path / "fm")
    m = merge_indexes([cfg_a.index_root, cfg_b.index_root], dst)
    assert m.fields == ["text", "foo"]
    dcfg = IndexConfig(index_root=dst, num_partitions=m.num_partitions,
                       field_columns=("foo",))
    eng = SearchEngine(dst, cfg=dcfg)
    t = eng.search_sorted_by("common", [("foo", "asc")], limit=10)
    assert t["url"].to_pylist() == ["a2", "a1", "b1"]  # missing LAST
    assert t["foo"].to_pylist() == ["aa", "zz", None]
    assert eng.count("foo:zz") == 1


def test_merge_guards(merge_built, tmp_path):
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    base, cfg_a, cfg_b, ucfg, _ueng = merge_built
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes([cfg_a.index_root], str(tmp_path / "x1"))
    with pytest.raises(ValueError, match="duplicate source roots"):
        merge_indexes([cfg_a.index_root, cfg_a.index_root + "/"],
                      str(tmp_path / "x2"))
    with pytest.raises(ValueError, match="destination must differ"):
        merge_indexes([cfg_a.index_root, cfg_b.index_root],
                      cfg_b.index_root)
    # overlapping urls (root a ⊂ union) → the single-live-doc invariant
    with pytest.raises(ValueError, match="duplicate live url"):
        merge_indexes([cfg_a.index_root, ucfg.index_root],
                      str(tmp_path / "x3"))
    # occupied destination
    dst = str(tmp_path / "x4")
    merge_indexes([cfg_a.index_root, cfg_b.index_root], dst)
    with pytest.raises(FileExistsError):
        merge_indexes([cfg_a.index_root, cfg_b.index_root], dst)


def test_merge_rejects_mixed_positions_capability(ray_session, tmp_path):
    """IndexOptions mismatch: one source with positions, one without —
    merging would strip positions partition-hash-dependently, so it is a
    loud refusal (Lucene addIndexes refuses mismatched postings formats
    the same way) — review-fix regression pin."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    rows = lambda pfx: pa.table({
        "url": [f"{pfx}{i}" for i in range(4)],
        "warc_ts": [1_600_000_000_000_000 + i for i in range(4)],
        "html": [b""] * 4,
        "text": ["alpha beta gamma delta"] * 4,
        "lang": ["en"] * 4,
    })
    cfg_p = IndexConfig(index_root=str(tmp_path / "wp"), num_partitions=2)
    cfg_n = IndexConfig(index_root=str(tmp_path / "np"), num_partitions=2,
                        index_positions=False)
    build_index(rows("p"), cfg_p)
    build_index(rows("n"), cfg_n)
    with pytest.raises(ValueError, match="positions capability"):
        merge_indexes([cfg_p.index_root, cfg_n.index_root],
                      str(tmp_path / "mx"))
    with pytest.raises(ValueError, match="num_partitions must be >= 1"):
        merge_indexes([cfg_p.index_root, cfg_n.index_root],
                      str(tmp_path / "mz"), num_partitions=0)


def test_repartition_inherits_term_vector_sidecar(ray_session, tmp_path):
    """A re-shard of a store_term_vectors index keeps the sidecar (round-4
    inheritance rule: caller flag OR any live source segment has
    tv.parquet) and term vectors stay identical."""
    import glob
    import os

    from lucene_plugin_ray.config import IndexConfig
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.fixtures import make_pages
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.pipelines.repartition import repartition_index

    src = str(tmp_path / "tvsrc")
    cfg = IndexConfig(index_root=src, num_partitions=4, store_term_vectors=True)
    corpus = make_pages(200, seed=17)
    build_index(corpus, cfg)
    dst = str(tmp_path / "tvdst")
    repartition_index(src, dst, 3)
    segs = glob.glob(os.path.join(dst, "default", "gen-*", "part-*"))
    assert segs and all(
        os.path.exists(os.path.join(d, "tv.parquet")) for d in segs
    )
    es = SearchEngine(src, cfg=cfg)
    ed = SearchEngine(
        dst, cfg=IndexConfig(index_root=dst, num_partitions=3,
                             store_term_vectors=True)
    )
    url = es.search("pagehit", limit=1)["url"][0].as_py()
    assert ed.term_vector(url).equals(es.term_vector(url))
