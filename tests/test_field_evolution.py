"""Append-only field evolution across generations — reference parity:
indexMap can introduce new field names over an index's life
(LuceneIndexBean.java:338-341).  A delta may EXTEND the analyzed-field
list; reorder / rename / drop stay rejected."""

import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig


def _pages(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
            **(
                {"tag": pa.array([r[3] for r in rows], pa.string())}
                if len(rows[0]) > 3 else {}
            ),
        }
    )


@pytest.fixture()
def evolved(ray_session, tmp_path):
    from lucene_plugin_ray.pipelines.build import build_delta, build_index

    root = str(tmp_path / "idx")
    cfg0 = IndexConfig(index_root=root, num_partitions=2)
    build_index(
        _pages([("doc://a", 1, "alpha beta"), ("doc://b", 2, "alpha gamma")]),
        cfg0,
    )
    cfg1 = IndexConfig(index_root=root, num_partitions=2, field_columns=("tag",))
    build_delta(
        _pages([("doc://c", 3, "alpha delta", "red"),
                ("doc://d", 4, "epsilon", "blue")]),
        cfg1,
    )
    return root, cfg1


def test_new_field_queries_span_generations(evolved):
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root, cfg = evolved
    eng = SearchEngine(root, cfg=cfg)
    # text search spans both generations
    assert eng.search("alpha", limit=10).num_rows == 3
    # the new field matches only new-generation docs; old segments answer
    # empty instead of erroring
    assert eng.search("tag:red", limit=10)["url"].to_pylist() == ["doc://c"]
    assert eng.count("tag:blue") == 1
    assert eng.search("tag:zzz").num_rows == 0
    # facets / grouping over the evolved field see only carriers
    assert eng.facets("alpha", "tag").to_pylist() == [
        {"value": "red", "count": 1}
    ]
    # avgdl semantics: the new field's dl sum is divided by the GLOBAL doc
    # count (old docs genuinely have length 0 in it) — scoring just works
    t = eng.search("tag:red epsilon", limit=10)
    assert t.num_rows == 2


def test_evolution_survives_compaction(evolved):
    from lucene_plugin_ray.pipelines.build import compact_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root, cfg = evolved
    before = SearchEngine(root, cfg=cfg)
    want_text = before.search("alpha", limit=10).drop_columns(["docid"])
    want_tag = before.search("tag:red", limit=10).drop_columns(["docid"])
    compact_index(cfg)
    after = SearchEngine(root, cfg=cfg)
    # docids are generation-scoped (compaction re-ranks); url + score are
    # the stable contract
    assert after.search("alpha", limit=10).drop_columns(["docid"]).equals(want_text)
    assert after.search("tag:red", limit=10).drop_columns(["docid"]).equals(want_tag)


def test_upsert_across_field_evolution(ray_session, tmp_path):
    """A delta that adds a field AND rewrites an old url: LWW still holds
    and the rewritten doc carries the new field."""
    from lucene_plugin_ray.pipelines.build import build_delta, build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root = str(tmp_path / "idx2")
    cfg0 = IndexConfig(index_root=root, num_partitions=2)
    build_index(_pages([("doc://a", 1, "oldword unique")]), cfg0)
    cfg1 = IndexConfig(index_root=root, num_partitions=2, field_columns=("tag",))
    build_delta(_pages([("doc://a", 9, "newword unique", "red")]), cfg1)
    eng = SearchEngine(root, cfg=cfg1)
    assert eng.search("oldword").num_rows == 0           # shadowed
    assert eng.search("newword")["url"].to_pylist() == ["doc://a"]
    assert eng.search("tag:red")["url"].to_pylist() == ["doc://a"]
    assert eng.count("unique") == 1                      # one live copy


def test_reorder_rename_drop_rejected(evolved):
    from lucene_plugin_ray.pipelines.build import build_delta

    root, _cfg = evolved
    bad = [
        IndexConfig(index_root=root, num_partitions=2),                      # drop
        IndexConfig(index_root=root, num_partitions=2,
                    field_columns=("nag",)),                                 # rename
        IndexConfig(index_root=root, num_partitions=2,
                    field_columns=("extra", "tag")),                         # reorder
    ]
    for cfg in bad:
        with pytest.raises(ValueError, match="APPENDED"):
            build_delta(
                _pages([("doc://x", 9, "zeta", "v")]).drop_columns(
                    [] if cfg.field_columns else ["tag"]
                ),
                cfg,
            )


def test_second_extension_appends_again(evolved):
    """gen2 may append ANOTHER field on top of gen1's extension."""
    from lucene_plugin_ray.pipelines.build import build_delta
    from lucene_plugin_ray.pipelines.query import SearchEngine

    root, _cfg = evolved
    cfg2 = IndexConfig(
        index_root=root, num_partitions=2, field_columns=("tag", "kind")
    )
    t = pa.table(
        {
            "url": pa.array(["doc://e"], pa.string()),
            "warc_ts": pa.array([5], pa.timestamp("us")),
            "text": pa.array(["omega"], pa.string()),
            "tag": pa.array(["red"], pa.string()),
            "kind": pa.array(["blog"], pa.string()),
        }
    )
    build_delta(t, cfg2)
    eng = SearchEngine(root, cfg=cfg2)
    assert eng.search("kind:blog")["url"].to_pylist() == ["doc://e"]
    assert eng.count("tag:red") == 2  # gen1's doc://c and gen2's doc://e


def test_facade_dynamic_fields(ray_session, tmp_path):
    """dynamic_fields=True restores indexMap's schema-less behavior: unseen
    keys widen the schema append-only, even MID-BUFFER (earlier rows
    backfill empty), and across commits (generation-level evolution)."""
    from lucene_plugin_ray.facade import LuceneException, LuceneFacade

    cfg = IndexConfig(index_root=str(tmp_path / "idx"), num_partitions=2)
    f = LuceneFacade(cfg, soft_commit_max_docs=100, dynamic_fields=True)
    f.index_text("col", "plain", "alpha beta")           # buffered pre-extension
    f.index_map("col", "tagged", {"text": "alpha", "tag": "red"})
    assert "tag" in f.cfg.field_columns
    f.commit()
    assert [e.external_id for e in f.search("col", "tag:red")] == ["tagged"]
    assert len(f.search("col", "alpha")) == 2            # pre-extension doc fine

    # second commit introduces ANOTHER field — append-only across gens
    f.index_map("col", "k2", {"text": "gamma", "kind": "blog"})
    f.commit()
    assert [e.external_id for e in f.search("col", "kind:blog")] == ["k2"]
    assert [e.external_id for e in f.search("col", "tag:red")] == ["tagged"]

    # bad dynamic names rejected loudly
    with pytest.raises(LuceneException):
        f.index_map("col", "x", {"Bad-Name": "v"})
    with pytest.raises(LuceneException):
        f.index_map("col", "x", {"warc_ts": "v"})

    # strict mode (default) still rejects unknown keys
    g = LuceneFacade(
        IndexConfig(index_root=str(tmp_path / "idx2"), num_partitions=2)
    )
    with pytest.raises(LuceneException):
        g.index_map("col", "y", {"tag": "red"})
