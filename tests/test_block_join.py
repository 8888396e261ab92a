"""Block join (Lucene join module, ToParentBlockJoinQuery /
ToChildBlockJoinQuery — query.py::block_join_parents/block_join_children):
parent hits equal a brute-force BM25 oracle under every ScoreMode, children
inherit their parent's score, the child-must-not-match-parent contract
raises, and the sharded twin is identical across shard counts."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.oracle import OracleIndex

_N_BLOCKS = 40
_CHILD_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
_PARENT_WORDS = ["headline", "summary", "overview", "abstract"]


def _block_corpus(seed: int = 7) -> tuple[pa.Table, dict[str, str], dict[str, str]]:
    """Blocks of 1 parent + 1-4 children keyed by a shared ``block`` field;
    parent texts draw from a token set DISJOINT from child texts (the
    ToParentBlockJoin contract).  Returns (pages, url→block, block→parent_url)."""
    rng = np.random.default_rng(seed)
    rows = []
    url_block: dict[str, str] = {}
    block_parent: dict[str, str] = {}
    ts0 = 1_700_000_000_000_000
    for b in range(_N_BLOCKS):
        block = f"blk{b:03d}"
        for c in range(int(rng.integers(1, 5))):
            url = f"doc://child/{b}/{c}"
            n = int(rng.integers(3, 12))
            text = " ".join(rng.choice(_CHILD_WORDS, size=n))
            rows.append((url, text, block, "child"))
            url_block[url] = block
        purl = f"doc://parent/{b}"
        n = int(rng.integers(2, 6))
        text = " ".join(rng.choice(_PARENT_WORDS, size=n))
        rows.append((purl, text, block, "parent"))
        url_block[purl] = block
        block_parent[block] = purl
    pages = pa.table(
        {
            "collection": ["default"] * len(rows),
            "url": [r[0] for r in rows],
            "warc_ts": pa.array(
                [ts0 + i for i in range(len(rows))], pa.timestamp("us")
            ),
            "text": [r[1] for r in rows],
            "block": [r[2] for r in rows],
            "kind": [r[3] for r in rows],
        }
    )
    return pages, url_block, block_parent


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    pages, url_block, block_parent = _block_corpus()
    root = str(tmp_path_factory.mktemp("bj"))
    cfg = IndexConfig(
        index_root=root, num_partitions=3, field_columns=("block", "kind")
    )
    build_index(pages, cfg)
    engine = SearchEngine(root, cfg=cfg)
    oracle = OracleIndex(pages, cfg)
    return root, cfg, engine, oracle, url_block, block_parent


def _expected_parents(oracle, url_block, block_parent, child_q, mode, limit):
    hits = oracle.search(child_q, limit=10**9)
    per_block: dict[str, list[float]] = {}
    for url, score in hits:
        per_block.setdefault(url_block[url], []).append(score)
    out = []
    for blk, scores in per_block.items():
        if mode == "none":
            s = 1.0
        elif mode == "max":
            s = max(scores)
        elif mode == "min":
            s = min(scores)
        elif mode == "total":
            s = sum(scores)
        else:
            s = sum(scores) / len(scores)
        out.append((block_parent[blk], s))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:limit]


@pytest.mark.parametrize("mode", ["none", "max", "min", "total", "avg"])
def test_parents_match_bruteforce_oracle(built, mode):
    _root, _cfg, engine, oracle, url_block, block_parent = built
    got = engine.block_join_parents(
        "alpha beta", "kind:parent", "block", score_mode=mode, limit=30
    )
    exp = _expected_parents(
        oracle, url_block, block_parent, "alpha beta", mode, 30
    )
    assert got["url"].to_pylist() == [u for u, _ in exp]
    assert got["score"].to_pylist() == pytest.approx(
        [s for _, s in exp], rel=1e-9
    )
    assert got.num_rows > 0


def test_children_inherit_parent_score(built):
    _root, _cfg, engine, oracle, url_block, block_parent = built
    got = engine.block_join_children(
        "headline overview", "kind:parent", "block", limit=10**6
    )
    parent_hits = dict(oracle.search("headline overview", limit=10**9))
    exp = []
    for url, blk in url_block.items():
        if url.startswith("doc://child/") and block_parent[blk] in parent_hits:
            exp.append((url, parent_hits[block_parent[blk]]))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert got["url"].to_pylist() == [u for u, _ in exp]
    assert got["score"].to_pylist() == pytest.approx(
        [s for _, s in exp], rel=1e-9
    )
    assert got.num_rows > 0


def test_children_parent_query_matching_children_is_restricted(built):
    """A parent query that ALSO matches child docs: the parent filter is a
    non-scoring restriction, so only PARENT matches propagate — child
    matches of the parent query are ignored (search_filtered semantics)."""
    _root, _cfg, engine, oracle, url_block, block_parent = built
    q = "headline alpha"  # headline hits parents, alpha hits children
    got = engine.block_join_children(q, "kind:parent", "block", limit=10**6)
    parent_hits = {
        u: s for u, s in oracle.search(q, limit=10**9)
        if u.startswith("doc://parent/")
    }
    exp = []
    for url, blk in url_block.items():
        if url.startswith("doc://child/") and block_parent[blk] in parent_hits:
            exp.append((url, parent_hits[block_parent[blk]]))
    exp.sort(key=lambda r: (-r[1], r[0]))
    assert got["url"].to_pylist() == [u for u, _ in exp]
    assert got["score"].to_pylist() == pytest.approx(
        [s for _, s in exp], rel=1e-9
    )


def test_children_noscore_constant(built):
    _root, _cfg, engine, *_ = built
    got = engine.block_join_children(
        "headline", "kind:parent", "block", score=False, limit=10**6
    )
    assert got.num_rows > 0
    assert set(got["score"].to_pylist()) == {1.0}


def test_child_query_matching_parent_raises(built):
    _root, _cfg, engine, *_ = built
    with pytest.raises(ValueError, match="non-parent"):
        engine.block_join_parents("headline", "kind:parent", "block")
    # check_contract=False skips the probe (the sharded path's per-shard probe)
    t = engine.block_join_parents(
        "headline", "kind:parent", "block", check_contract=False
    )
    assert t.num_rows > 0


def test_validation(built):
    _root, _cfg, engine, *_ = built
    with pytest.raises(ValueError, match="score_mode"):
        engine.block_join_parents(
            "alpha", "kind:parent", "block", score_mode="sum"
        )
    with pytest.raises(ValueError, match="metadata"):
        engine.block_join_parents("alpha", "kind:parent", "text")
    with pytest.raises(ValueError, match="metadata"):
        engine.block_join_children("headline", "kind:parent", "nope")
    with pytest.raises(ValueError):
        engine.block_join_parents("alpha", "", "block")
    # a stopword-only parent filter parses to zero clauses — the error names
    # the caller's parameter, not the internal restrict_query plumbing
    with pytest.raises(ValueError, match="parent_filter"):
        engine.block_join_parents("alpha", "the", "block")
    with pytest.raises(ValueError, match="parent_filter"):
        engine.block_join_children("headline", "the", "block")
    # non-positive limits are loud on every join surface, never a silent
    # numpy mis-truncation
    for bad_limit in (0, -1):
        with pytest.raises(ValueError, match="limit"):
            engine.block_join_parents(
                "alpha", "kind:parent", "block", limit=bad_limit
            )
        with pytest.raises(ValueError, match="limit"):
            engine.block_join_children(
                "headline", "kind:parent", "block", limit=bad_limit
            )
        with pytest.raises(ValueError, match="limit"):
            engine.search_join("alpha", "block", "block", limit=bad_limit)


def test_facade_and_http_round_trip(ray_session, tmp_path):
    from lucene_plugin_ray.server import LuceneHttpClient, LuceneHttpService

    cfg = IndexConfig(
        index_root=str(tmp_path / "idx"), num_partitions=2,
        field_columns=("blk", "kind"),
    )
    service = LuceneHttpService(cfg, host="127.0.0.1", port=0).start()
    facade = service.facade
    try:
        c = LuceneHttpClient(service.url)
        c.index_map("col", "c1", {"text": "alpha beta", "blk": "b1",
                                  "kind": "child"})
        c.index_map("col", "c2", {"text": "alpha alpha", "blk": "b1",
                                  "kind": "child"})
        c.index_map("col", "p1", {"text": "headline one", "blk": "b1",
                                  "kind": "parent"})
        c.index_map("col", "c3", {"text": "gamma", "blk": "b2",
                                  "kind": "child"})
        c.index_map("col", "p2", {"text": "headline two", "blk": "b2",
                                  "kind": "parent"})

        rows = c.block_join_parents(
            "col", "alpha", "kind:parent", "blk", score_mode="total"
        )
        assert [r["_externalId"] for r in rows] == ["p1"]
        ent = facade.block_join_parents(
            "col", "alpha", "kind:parent", "blk", score_mode="total"
        )
        assert [(e.external_id, e.score) for e in ent] == [
            (r["_externalId"], r["_score"]) for r in rows
        ]

        rows = c.block_join_children("col", "two", "kind:parent", "blk")
        assert [r["_externalId"] for r in rows] == ["c3"]
        rows = c.block_join_children(
            "col", "headline", "kind:parent", "blk", score=False
        )
        assert {r["_externalId"] for r in rows} == {"c1", "c2", "c3"}
        assert {r["_score"] for r in rows} == {1.0}

        import urllib.error

        for bad in (
            lambda: c.block_join_parents("col", "alpha", "kind:parent",
                                         "blk", score_mode="sum"),
            lambda: c.block_join_parents("col", "alpha", "kind:parent",
                                         "nope"),
            # contract violation: child query matches a parent
            lambda: c.block_join_parents("col", "headline", "kind:parent",
                                         "blk"),
            lambda: c.block_join_children("col", "", "kind:parent", "blk"),
            # malformed boolean for the score flag is a 400, not a silent
            # fall-through to scored results
            lambda: c._get(
                "block-join-children",
                {"collection": "col", "parent_query": "headline",
                 "parent_filter": "kind:parent", "block_field": "blk",
                 "score": "0", "limit": 10},
            ),
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                bad()
            assert ei.value.code == 400
    finally:
        service.shutdown()


@pytest.mark.parametrize("shards", [1, 3])
def test_sharded_identity(built, shards):
    from lucene_plugin_ray.pipelines.sharded import ShardedSearcherService

    root, cfg, engine, *_ = built
    svc = ShardedSearcherService(root, cfg=cfg, num_shards=shards)
    try:
        for mode in ("none", "max", "min", "total", "avg"):
            exp = engine.block_join_parents(
                "alpha beta", "kind:parent", "block",
                score_mode=mode, limit=30,
            )
            got = svc.block_join_parents(
                "alpha beta", "kind:parent", "block",
                score_mode=mode, limit=30,
            )
            assert got["url"].to_pylist() == exp["url"].to_pylist(), mode
            assert got["score"].to_pylist() == pytest.approx(
                exp["score"].to_pylist(), rel=1e-12
            ), mode
        exp = engine.block_join_children(
            "headline overview", "kind:parent", "block", limit=200
        )
        got = svc.block_join_children(
            "headline overview", "kind:parent", "block", limit=200
        )
        assert got.equals(exp)
        with pytest.raises(ValueError, match="non-parent"):
            svc.block_join_parents("headline", "kind:parent", "block")
        with pytest.raises(ValueError, match="score_mode"):
            svc.block_join_parents(
                "alpha", "kind:parent", "block", score_mode="sum"
            )
    finally:
        svc.shutdown()
