"""fsspec storage roots (≙ BfsDirectory, BfsDirectory.java:26-360):
an index root can be an fsspec URL; the commit protocol switches from
tmp+rename (local) to final-name writes with meta-last + manifest-last
(object stores).  file:// shares the local disk so Ray workers and the
driver see one store — the E2E proxy for s3://; memory:// (per-process)
unit-tests the protocol in-process."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages
from lucene_plugin_ray.state import storage


def test_storage_primitives_memory():
    root = "memory://storetest"
    storage.rmtree(root)
    assert not storage.exists(storage.join(root, "x.json"))
    storage.makedirs(root)
    storage.write_json(storage.join(root, "x.json"), {"a": 1}, atomic=True)
    assert storage.read_json(storage.join(root, "x.json")) == {"a": 1}
    storage.write_bytes(storage.join(root, "b.bin"), b"\x01\x02")
    assert storage.read_bytes(storage.join(root, "b.bin")) == b"\x01\x02"
    t = pa.table({"x": [1, 2, 3]})
    storage.write_parquet(t, storage.join(root, "t.parquet"))
    assert storage.read_parquet(storage.join(root, "t.parquet")).equals(t)
    names = storage.listdir_names(root)
    assert {"x.json", "b.bin", "t.parquet"} <= set(names)
    storage.rmtree(root)
    assert storage.listdir_names(root) == []


def test_segment_write_and_read_over_memory_url(ray_session):
    """Drive the segment writer + reader directly (in-process — memory:// is
    per-process) through the URL protocol: final-name writes, meta.json last,
    resume via digest, byte-identical query results vs a local-root build."""
    from lucene_plugin_ray.stages.segment_write import build_partition_segment
    from lucene_plugin_ray.stages.validate import ValidateAndPartition
    from lucene_plugin_ray.state.segment import SegmentReader

    corpus = make_pages(80, seed=80)
    root = "memory://segidx"
    storage.rmtree(root)
    cfg = IndexConfig(index_root=root, num_partitions=2)
    v = ValidateAndPartition(cfg)
    marked = v(corpus)
    rows_all = []
    for p in (0, 1):
        part = marked.filter(pa.compute.equal(marked["_p"], p))
        rows = build_partition_segment(part, p, cfg, generation=0)
        rows_all.extend(rows.to_pylist())
    assert all(r["path"].startswith("memory://") for r in rows_all)
    # resume: identical input → digest match → skipped
    part0 = marked.filter(pa.compute.equal(marked["_p"], 0))
    again = build_partition_segment(part0, 0, cfg, generation=0).to_pylist()
    assert all(r["resumed"] for r in again)
    # reader round-trip over the URL
    r = SegmentReader(rows_all[0]["path"])
    assert r.n_docs > 0
    row = r.lookup("text", "pagehit")
    if row >= 0:
        docids, tfs = r.postings(row)
        assert np.all(np.diff(docids) > 0)
    storage.rmtree(root)


def test_e2e_build_search_over_file_url(ray_session, tmp_path):
    """Full Ray pipeline (map_groups workers in separate processes) against a
    file:// root — exercises the URL code path end-to-end with a genuinely
    shared store.  Results must equal a plain-path build bit-for-bit."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(150, seed=81)
    delta = make_pages(40, seed=82)

    url_root = "file://" + str(tmp_path / "urlidx")
    cfg_u = IndexConfig(index_root=url_root, num_partitions=4)
    build_index(corpus, cfg_u)
    build_delta(delta, cfg_u)
    eng_u = SearchEngine(url_root, cfg=cfg_u)

    local_root = str(tmp_path / "localidx")
    cfg_l = IndexConfig(index_root=local_root, num_partitions=4)
    build_index(corpus, cfg_l)
    build_delta(delta, cfg_l)
    eng_l = SearchEngine(local_root, cfg=cfg_l)

    for q in ("pagehit", "pagehit w00001", "+pagehit +w00000", "dupmarker0"):
        a = eng_u.search(q, limit=50)
        b = eng_l.search(q, limit=50)
        assert a["url"].to_pylist() == b["url"].to_pylist(), q
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy())


def test_lazy_region_remote_postings(ray_session, tmp_path, monkeypatch):
    """Page-granular remote fetch (round 4): with the laziness threshold
    forced to 0 and tiny chunks, a URL-rooted engine must answer every
    query/phrase/term-vector probe bit-identically to a local-root build
    while fetching only the chunks the probes touch — never the whole
    postings region per segment open."""
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.state import segment as seg_mod

    corpus = make_pages(300, seed=77)
    url_root = "file://" + str(tmp_path / "lazyidx")
    cfg_u = IndexConfig(index_root=url_root, num_partitions=2)
    build_index(corpus, cfg_u)
    local_root = str(tmp_path / "lazyloc")
    cfg_l = IndexConfig(index_root=local_root, num_partitions=2)
    build_index(corpus, cfg_l)

    monkeypatch.setattr(seg_mod, "_LAZY_FETCH_THRESHOLD", 0)
    monkeypatch.setattr(seg_mod._LazyRegion, "CHUNK", 512)
    eng_u = SearchEngine(url_root, cfg=cfg_u)
    eng_l = SearchEngine(local_root, cfg=cfg_l)
    lazies = [
        s.reader.buf for s in eng_u._segments["default"]
    ] + [s.reader.pbuf for s in eng_u._segments["default"]]
    assert all(isinstance(b, seg_mod._LazyRegion) for b in lazies)

    url = eng_l.search("pagehit", limit=1)["url"][0].as_py()
    for probe in (
        lambda e: e.search("pagehit", limit=25),
        lambda e: e.search("+pagehit +w00010", limit=25),
        lambda e: e.search('"pagehit w00010"', limit=25),
        lambda e: e.search("w000*", limit=25),
        lambda e: e.term_vector(url),
        lambda e: e.more_like_this_url(url, limit=10),
    ):
        assert probe(eng_u).equals(probe(eng_l))

    total_size = sum(b.size for b in lazies)
    fetched = sum(b.bytes_fetched for b in lazies)
    assert 0 < fetched < total_size, (fetched, total_size)
    # a repeat of the same query costs zero new fetches (chunk LRU hot)
    eng_u._results_cache.clear()
    before = sum(b.fetches for b in lazies)
    eng_u.search("pagehit", limit=25)
    assert sum(b.fetches for b in lazies) == before


def test_compact_over_file_url_with_lazy_regions(ray_session, tmp_path, monkeypatch):
    """Generation compaction over a file:// root with lazy region reads
    forced on: the merge path's bulk decodes must work through
    _LazyRegion (sequential chunked fetches), and the compacted index
    must answer identically to a compacted local-root twin."""
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        compact_index,
    )
    from lucene_plugin_ray.pipelines.query import SearchEngine
    from lucene_plugin_ray.state import segment as seg_mod

    corpus = make_pages(200, seed=51)
    delta = make_pages(60, seed=52)

    url_root = "file://" + str(tmp_path / "lazycompact")
    cfg_u = IndexConfig(index_root=url_root, num_partitions=3)
    build_index(corpus, cfg_u)
    build_delta(delta, cfg_u)

    local_root = str(tmp_path / "lazycompact_loc")
    cfg_l = IndexConfig(index_root=local_root, num_partitions=3)
    build_index(corpus, cfg_l)
    build_delta(delta, cfg_l)
    compact_index(cfg_l)

    monkeypatch.setattr(seg_mod, "_LAZY_FETCH_THRESHOLD", 0)
    monkeypatch.setattr(seg_mod._LazyRegion, "CHUNK", 1024)
    compact_index(cfg_u)

    eng_u = SearchEngine(url_root, cfg=cfg_u)
    eng_l = SearchEngine(local_root, cfg=cfg_l)
    for q in ("pagehit", "+pagehit +w00001", '"pagehit w00010"', "w000*"):
        a, b = eng_u.search(q, limit=50), eng_l.search(q, limit=50)
        assert a["url"].to_pylist() == b["url"].to_pylist(), q
        np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy())
