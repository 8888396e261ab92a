"""Index replication (pipelines/replicate.py — the Lucene replicator-module
analogue): a replica serves queries identically to the source, incremental
calls copy only new generations, digest conflicts refuse to overwrite, and
the replica is a full citizen (passes check_index, accepts delta builds)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages
from lucene_plugin_ray.pipelines.replicate import _rewrite_path, replicate_index


@pytest.fixture()
def built(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        delete_docs,
    )

    src = str(tmp_path / "src")
    cfg = IndexConfig(index_root=src, num_partitions=3, field_columns=("foo",))
    pages = make_pages(120, seed=11, with_fields=True)
    build_index(pages, cfg)
    build_delta(make_pages(30, seed=12, with_fields=True), cfg)
    url = pages["url"][0].as_py()
    delete_docs(cfg, pa.table({"collection": ["default"], "url": [url]}))
    return cfg, pages


def _search_table(root: str, cfg: IndexConfig, query: str) -> pa.Table:
    from lucene_plugin_ray.pipelines.query import SearchEngine

    cfg2 = IndexConfig(
        index_root=root,
        num_partitions=cfg.num_partitions,
        field_columns=cfg.field_columns,
    )
    return SearchEngine(root, cfg=cfg2).search(query, limit=50)


def test_replica_serves_identical_results(built, tmp_path):
    from lucene_plugin_ray.pipelines.check import check_index

    cfg, _pages = built
    dst = str(tmp_path / "dst")
    report = replicate_index(cfg.index_root, dst)
    kinds = set(report["kind"].to_pylist())
    assert kinds == {"segment", "tombstone", "manifest"}
    assert not pc.any(report["skipped"]).as_py()
    # the replica is internally consistent (meta.json paths were re-rooted)
    chk = check_index(dst)
    bad = chk.filter(pc.invert(chk["ok"]))
    assert bad.num_rows == 0, bad.to_pylist()
    # and byte-equivalent for queries: same hits, same scores, same order
    a = _search_table(cfg.index_root, cfg, "w00001")
    b = _search_table(dst, cfg, "w00001")
    assert a.equals(b)
    assert a.num_rows > 0


def test_incremental_copies_only_new_generation(built, tmp_path):
    from lucene_plugin_ray.pipelines.build import build_delta

    cfg, _pages = built
    dst = str(tmp_path / "dst")
    replicate_index(cfg.index_root, dst)
    build_delta(make_pages(20, seed=13, with_fields=True), cfg)
    report = replicate_index(cfg.index_root, dst)
    rows = report.to_pylist()
    new_gen = max(r["generation"] for r in rows)
    for r in rows:
        if r["generation"] < new_gen:
            assert r["skipped"], r
        elif r["kind"] == "segment":
            assert not r["skipped"], r
    a = _search_table(cfg.index_root, cfg, "w00001")
    b = _search_table(dst, cfg, "w00001")
    assert a.equals(b)


def test_second_call_is_a_noop(built, tmp_path):
    cfg, _pages = built
    dst = str(tmp_path / "dst")
    replicate_index(cfg.index_root, dst)
    report = replicate_index(cfg.index_root, dst)
    assert pc.all(report["skipped"]).as_py()
    assert pc.sum(report["bytes_copied"]).as_py() == 0


def test_refuses_to_overwrite_a_different_index(built, tmp_path, ray_session):
    from lucene_plugin_ray.pipelines.build import build_index

    cfg, _pages = built
    dst = str(tmp_path / "dst")
    other = IndexConfig(
        index_root=dst, num_partitions=3, field_columns=("foo",)
    )
    build_index(make_pages(40, seed=99, with_fields=True), other)
    # same segment paths (coll/gen-0/part-*), different input digests
    with pytest.raises(Exception, match="different index"):
        replicate_index(cfg.index_root, dst)


def test_replica_accepts_delta_builds(built, tmp_path):
    from lucene_plugin_ray.pipelines.build import build_delta

    cfg, _pages = built
    dst = str(tmp_path / "dst")
    replicate_index(cfg.index_root, dst)
    cfg_dst = IndexConfig(
        index_root=dst, num_partitions=3, field_columns=("foo",)
    )
    extra = make_pages(15, seed=21, with_fields=True)
    build_delta(extra, cfg_dst)
    got = _search_table(dst, cfg, "w00001")
    assert got.num_rows > 0  # replica root is writable like any index root


def test_replicates_to_url_root(built, tmp_path):
    cfg, _pages = built
    dst = "file://" + str(tmp_path / "dst_url")
    report = replicate_index(cfg.index_root, dst)
    assert not pc.any(report["skipped"]).as_py()
    a = _search_table(cfg.index_root, cfg, "w00001")
    b = _search_table(dst, cfg, "w00001")
    assert a.equals(b)


def test_refuses_diverged_tombstones(ray_session, tmp_path):
    """Same corpus, DIFFERENT delete sets: segment digests agree at every
    generation, so only the tombstone byte comparison can catch the
    divergence — it must refuse, never silently accept dst as up to date."""
    from lucene_plugin_ray.pipelines.build import build_index, delete_docs

    pages = make_pages(60, seed=31)
    urls = pages["url"].to_pylist()
    roots = []
    for k, victim in enumerate((urls[0], urls[1])):
        root = str(tmp_path / f"src{k}")
        cfg = IndexConfig(index_root=root, num_partitions=2)
        build_index(pages, cfg)
        delete_docs(
            cfg, pa.table({"collection": ["default"], "url": [victim]})
        )
        roots.append(root)
    dst = str(tmp_path / "dst")
    replicate_index(roots[0], dst)
    with pytest.raises(Exception, match="different index"):
        replicate_index(roots[1], dst)


def test_refuses_diverged_manifest(ray_session, tmp_path):
    """dst's gen-1 is a delete (no partitions to digest-conflict), the new
    source's gen-1 is a delta build: the manifest content comparison must
    refuse instead of leaving the replica's manifest silently stale."""
    from lucene_plugin_ray.pipelines.build import (
        build_delta,
        build_index,
        delete_docs,
    )

    pages = make_pages(60, seed=32)
    src_a = str(tmp_path / "srcA")
    cfg_a = IndexConfig(index_root=src_a, num_partitions=2)
    build_index(pages, cfg_a)
    delete_docs(
        cfg_a,
        pa.table({"collection": ["default"], "url": [pages["url"][0].as_py()]}),
    )
    src_b = str(tmp_path / "srcB")
    cfg_b = IndexConfig(index_root=src_b, num_partitions=2)
    build_index(pages, cfg_b)
    build_delta(make_pages(10, seed=33), cfg_b)
    dst = str(tmp_path / "dst")
    replicate_index(src_a, dst)
    with pytest.raises(Exception, match="different index"):
        replicate_index(src_b, dst)


def test_generation_below_chain_is_loud(built):
    cfg, _pages = built
    with pytest.raises(ValueError, match="no manifest at or below"):
        replicate_index(cfg.index_root, cfg.index_root + "_x", generation=-1)


def test_rewrite_path_guard():
    assert (
        _rewrite_path("/a/b/coll/gen-0/part-1", "/a/b", "s3://x/y")
        == "s3://x/y/coll/gen-0/part-1"
    )
    with pytest.raises(ValueError, match="not under the source root"):
        _rewrite_path("/elsewhere/seg", "/a/b", "/c")


def test_same_root_rejected(built):
    cfg, _pages = built
    with pytest.raises(ValueError, match="same"):
        replicate_index(cfg.index_root, cfg.index_root + "/")


def test_replicate_copies_term_vector_sidecar(ray_session, tmp_path):
    """replicate_index enumerates segment files by listing (not a fixed
    name set), so tv.parquet rides along — pinned here."""
    import glob
    import os

    from lucene_plugin_ray.config import IndexConfig
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.fixtures import make_pages
    from lucene_plugin_ray.pipelines.replicate import replicate_index

    src = str(tmp_path / "tvsrc")
    build_index(
        make_pages(120, seed=9),
        IndexConfig(index_root=src, num_partitions=2,
                    store_term_vectors=True),
    )
    dst = str(tmp_path / "tvdst")
    replicate_index(src, dst)
    segs = glob.glob(os.path.join(dst, "default", "gen-*", "part-*"))
    assert segs and all(
        os.path.exists(os.path.join(d, "tv.parquet")) for d in segs
    )
