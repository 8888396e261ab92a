"""K3 merge/compaction tests: compacted index ≡ pre-compaction chain ≡ full
rebuild (SURVEY.md §5.2-4c)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages

QUERIES = ["w00000", "pagehit", "dupmarker0", "oldmarker0", "w00010 w00100",
           "Firstword1", "w00003 AND w00030"]


def _result_map(engine):
    out = {}
    for q in QUERIES:
        t = engine.search(q, limit=100)
        out[q] = sorted(
            zip(t["url"].to_pylist(), [round(s, 9) for s in t["score"].to_pylist()])
        )
    return out


def test_compaction_preserves_results(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        compact_index,
        delete_docs,
    )
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(300, seed=51)
    urls = sorted(set(corpus["url"].to_pylist()))
    mask = pc.is_in(corpus["url"], value_set=pa.array(urls[:180]))
    part1, part2 = corpus.filter(mask), corpus.filter(pc.invert(mask))

    root = str(tmp_path / "idx")
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(part1, cfg)
    build_delta(part2, cfg)
    delete_docs(cfg, pa.table({"collection": ["default"], "url": [urls[5]]}))

    pre = _result_map(SearchEngine(root, cfg=cfg))

    m = compact_index(cfg)
    assert m.extra["compacted"] is True
    eng = SearchEngine(root, cfg=cfg)
    assert len(eng.chain) == 1  # chain truncated at the compacted manifest
    assert _result_map(eng) == pre

    # compacted index == full rebuild of the equivalent corpus (minus delete)
    from lucene_plugin_ray.pipelines.oracle import OracleIndex

    oracle = OracleIndex(
        corpus, cfg, deletes=pa.table({"collection": ["default"], "url": [urls[5]]})
    )
    for q in QUERIES:
        t = eng.search(q, limit=100)
        exp = oracle.search(q, limit=100)
        assert sorted(
            zip(t["url"].to_pylist(), [round(s, 9) for s in t["score"].to_pylist()])
        ) == sorted((u, round(s, 9)) for u, s in exp), q

    # a further delta on top of the compacted generation still works
    extra = pa.table(
        {
            "url": ["u://new1"],
            "warc_ts": pa.array([9_000_000_000], type=pa.timestamp("us")),
            "text": ["totally fresh xylophone content"],
        }
    )
    build_delta(extra, cfg)
    eng2 = SearchEngine(root, cfg=cfg)
    assert eng2.search("xylophone").num_rows == 1
    # hit SETS unchanged (scores legitimately shift: N/avgdl grew by one doc)
    post = _result_map(eng2)
    assert {q: [u for u, _ in rows] for q, rows in post.items()} == {
        q: [u for u, _ in rows] for q, rows in pre.items()
    }


def test_compaction_with_collections_and_fields(ray_session, tmp_path):
    """K3 over a multi-collection, multi-field index (+ a cleared collection
    in the chain): compaction preserves every query result."""
    import pyarrow.compute as pc

    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        clear_collection,
        compact_index,
    )
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(250, seed=62, with_collections=True, with_fields=True)
    root = str(tmp_path / "idx")
    cfg = IndexConfig(index_root=root, num_partitions=4,
                      field_columns=("lang", "foo", "age"))
    build_index(corpus.slice(0, 150), cfg)
    build_delta(corpus.slice(150), cfg)
    eng0 = SearchEngine(root, cfg=cfg)
    colls = eng0.collections()
    victim = [c for c in colls if c != "default"][0]
    clear_collection(cfg, victim)

    def snap(engine):
        out = {}
        for coll in colls:
            for q in ["w00000", "foo:lamb", "age:[23 TO 23]", "lang:en",
                      "dupmarker0", "+w00001 +w00010"]:
                t = engine.search(q, collection=coll, limit=100)
                out[(coll, q)] = sorted(
                    zip(t["url"].to_pylist(),
                        [round(s, 9) for s in t["score"].to_pylist()])
                )
        return out

    pre = snap(SearchEngine(root, cfg=cfg))
    compact_index(cfg)
    eng = SearchEngine(root, cfg=cfg)
    assert len(eng.chain) == 1
    assert snap(eng) == pre
    assert eng.search("w00000", collection=victim, limit=10).num_rows == 0


def test_merge_indexes_inherits_term_vector_sidecar(ray_session, tmp_path):
    """addIndexes over sources where ANY side carries tv.parquet writes
    the sidecar in the destination (round-4 inheritance rule)."""
    import glob
    import os

    from lucene_plugin_ray.config import IndexConfig
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.fixtures import make_pages
    from lucene_plugin_ray.pipelines.repartition import merge_indexes

    import hashlib

    import pyarrow.compute as pc_

    pages = make_pages(160, seed=23)
    urls = pages["url"].to_pylist()
    mask = pa.array(
        [int(hashlib.md5(u.encode()).hexdigest(), 16) % 2 == 0 for u in urls]
    )
    a = str(tmp_path / "ma")
    b = str(tmp_path / "mb")
    build_index(pages.filter(mask),
                IndexConfig(index_root=a, num_partitions=2,
                            store_term_vectors=True))
    build_index(pages.filter(pc_.invert(mask)),
                IndexConfig(index_root=b, num_partitions=2))
    dst = str(tmp_path / "mdst")
    merge_indexes([a, b], dst)
    segs = glob.glob(os.path.join(dst, "default", "gen-*", "part-*"))
    assert segs and all(
        os.path.exists(os.path.join(d, "tv.parquet")) for d in segs
    )
