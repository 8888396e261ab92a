"""Batch query path (T2 actor pool) + CLI smoke tests."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from lucene_plugin_ray.config import IndexConfig
from lucene_plugin_ray.pipelines.fixtures import make_pages


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from lucene_plugin_ray.pipelines.build import build_index
    from lucene_plugin_ray.pipelines.query import SearchEngine

    corpus = make_pages(250, seed=60)
    root = str(tmp_path_factory.mktemp("idx_qe"))
    cfg = IndexConfig(index_root=root, num_partitions=4)
    build_index(corpus, cfg)
    return root, cfg, SearchEngine(root, cfg=cfg)


def test_query_executor_actor_pool(built):
    """queries_ds.map_batches(QueryExecutor, concurrency=N) — the batch
    read path (SURVEY.md T2): engine loaded once per actor in __init__."""
    import ray.data

    from lucene_plugin_ray.pipelines.query import QueryExecutor

    root, cfg, engine = built
    queries = pa.table(
        {
            "qid": pa.array([0, 1, 2, 3], type=pa.int64()),
            "collection": ["default"] * 4,
            "query": ["pagehit", "w00000", "dupmarker0", "zzznope"],
            "k": pa.array([255, 10, 10, 10], type=pa.int32()),
        }
    )
    out = (
        ray.data.from_arrow(queries)
        .map_batches(
            QueryExecutor,
            fn_constructor_args=(root,),
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .take_all()
    )
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["qid"], []).append((r["rank"], r["url"], r["score"]))
    # identical to the in-process engine
    for qid, q, k in [(0, "pagehit", 255), (1, "w00000", 10), (2, "dupmarker0", 10)]:
        exp = engine.search(q, limit=k)
        got = sorted(by_qid.get(qid, []))
        assert [u for _, u, _ in got] == exp["url"].to_pylist(), q
    assert 3 not in by_qid  # miss query → no rows


def test_cli_build_and_search(ray_session, tmp_path):
    """CLI surface: build then search via python -m lucene_plugin_ray."""
    import pyarrow.parquet as pq

    corpus = make_pages(120, seed=61)
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    pq.write_table(corpus, str(cdir / "pages.parquet"))
    idx = str(tmp_path / "idx")
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "lucene_plugin_ray", "build",
         "--corpus", str(cdir), "--index", idx, "--partitions", "2"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["docs"] == len(set(corpus["url"].to_pylist()))
    r2 = subprocess.run(
        [sys.executable, "-m", "lucene_plugin_ray", "search",
         "--index", idx, "--query", "pagehit", "--partitions", "2"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    hits = [json.loads(l) for l in r2.stdout.strip().splitlines()]
    assert len(hits) == 10  # the planted pagehit group
    assert all(h["score"] > 0 for h in hits)
