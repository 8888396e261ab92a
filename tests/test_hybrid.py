"""Hybrid retrieval (BM25 ⊕ cosine RRF): fuse math on hand-crafted legs,
leg-absence semantics, semantic-leg exactness vs a driver-side recompute,
and error paths."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.pipelines import hybrid


def _lex(ids, ranks):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lex_score": pa.array([1.0] * len(ids), pa.float64()),
            "lex_rank": pa.array(ranks, pa.int64()),
        }
    )


def _sem(ids, ranks):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cos": pa.array([1.0] * len(ids), pa.float64()),
            "sem_rank": pa.array(ranks, pa.int64()),
        }
    )


def test_rrf_fuse_hand_math():
    # doc 5 in both legs; 7 lexical-only; 9 semantic-only
    out = hybrid.rrf_fuse(_lex([5, 7], [1, 2]), _sem([9, 5], [1, 2]), k=10)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert got[5]["rrf"] == round(1 / 61 + 1 / 62, 6)
    assert got[7]["rrf"] == round(1 / 62, 6)
    assert got[9]["rrf"] == round(1 / 61, 6)
    assert (got[5]["lex_rank"], got[5]["sem_rank"]) == (1, 2)
    assert (got[7]["lex_rank"], got[7]["sem_rank"]) == (2, 0)
    assert (got[9]["lex_rank"], got[9]["sem_rank"]) == (0, 1)
    # order: both-legs doc first, then rank-1 semantic (1/61) over rank-2
    # lexical (1/62)
    assert out["doc_id"].to_pylist() == [5, 9, 7]


def test_rrf_fuse_truncates_and_tiebreaks_doc_id():
    # equal rrf (same single-leg rank) → doc_id asc decides the cut
    out = hybrid.rrf_fuse(_lex([30, 10], [1, 1]), _sem([20], [1]), k=2)
    assert out["doc_id"].to_pylist() == [10, 20]


def test_semantic_topk_matches_driver_recompute(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n, d = 64, 8
    mat = rng.normal(size=(n, d)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    q = mat[3].astype(np.float64)
    got = hybrid.semantic_topk(str(tmp_path), q, k=5)
    # driver-side exact recompute with the same round-5-then-rank contract
    m = mat.astype(np.float64)
    cos = np.round(
        (m @ (q / np.linalg.norm(q))) / np.linalg.norm(m, axis=1), 5
    )
    order = np.lexsort((np.arange(n), -cos))[:5]
    assert got["doc_id"].to_pylist() == order.tolist()
    assert got["cos"].to_pylist() == cos[order].tolist()
    assert got["sem_rank"].to_pylist() == [1, 2, 3, 4, 5]
    assert got["doc_id"].to_pylist()[0] == 3  # self-similarity tops


def test_hybrid_search_validation(ray_session, tmp_path):
    with pytest.raises(ValueError):
        hybrid.hybrid_search(None, str(tmp_path), "q", k=0)
    with pytest.raises(ValueError):
        hybrid.hybrid_search(None, str(tmp_path), "q", k_leg=-1)
    with pytest.raises(ValueError):
        hybrid.semantic_topk(str(tmp_path), np.zeros(4), k=3)


def test_query_vector_missing_id(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    with pytest.raises(ValueError):
        hybrid.query_vector(str(tmp_path), 99)
    assert hybrid.query_vector(str(tmp_path), 0).tolist() == [1.0, 0.0]
