"""Hybrid retrieval: BM25 lexical leg + embedding-cosine semantic leg fused
with reciprocal-rank fusion (RRF) — the Elasticsearch/Vespa-style hybrid
search primitive over this engine's two existing retrieval paths.

The reference (baratine/lucene-plugin) has no vector leg; this is one of the
training-data-pipeline extensions (SURVEY.md §2.12).  Both legs are the
engine's own scale-clean operators: the lexical leg is ``SearchEngine.search``
(partition-pruned postings, sharded-capable), the semantic leg is the
``ann_topk`` shape (one broadcast query vector, per-batch matmul top-k
partials, tiny driver merge).  Fusion touches only ``2 × k_leg`` rows on the
driver regardless of corpus size.

Determinism contract (what makes the DuckDB oracle hash-exact):
ranks on BOTH sides are computed over ROUNDED leg scores — BM25 rounded to 4
(the repo-wide ``_bm25_sql`` contract), cosine rounded to 5 (the ``ann_topk``
contract) — with (score desc, doc_id asc) tiebreak, so a sub-round-off float
divergence between numpy and DuckDB cannot flip a rank.  The RRF score
``Σ 1/(rrf_k + rank)`` is a sum of exactly-representable-input divisions,
identical in IEEE float64 on both sides, rounded to 6 for the hash.

Embedding alignment: ``embeddings.vec_id`` IS a ``documents.doc_id`` (the
synthetic tables share the dense id space; at sf0.1 only a prefix of docs has
an embedding — those docs simply lack a semantic leg, which is ordinary
hybrid-search behavior for partially-embedded corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from lucene_plugin_ray.pipelines.training import _embedding_matrix
from lucene_plugin_ray.sources.reader import read_parquet_clean

DEFAULT_RRF_K = 60  # the canonical RRF constant (Cormack et al. 2009)


def query_vector(sf_dir: str, qvec_id: int) -> np.ndarray:
    """Fetch ONE embedding row by vec_id with predicate+column pushdown
    (only the matching row group reaches the driver)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", qvec_id)],
    )
    if t.num_rows != 1:
        raise ValueError(f"qvec_id {qvec_id}: expected 1 embedding row, got {t.num_rows}")
    return _embedding_matrix(t["embedding"])[0]


def semantic_topk(sf_dir: str, qvec: np.ndarray, k: int) -> pa.Table:
    """Cosine top-k of ONE query vector over the embeddings table →
    (doc_id, cos, sem_rank), cos rounded to 5 BEFORE ranking, ties broken
    doc_id asc.  Distributed: broadcast the (tiny) query vector, per-batch
    matmul + partial top-k, driver merges parts × k rows."""
    qn = np.linalg.norm(qvec)
    if qn == 0:
        raise ValueError("zero query vector")
    q_ref = ray.put((qvec / qn).astype(np.float64))

    def _score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = _embedding_matrix(batch["embedding"])
        norm = np.linalg.norm(mat, axis=1)
        norm[norm == 0] = 1.0
        cos = np.round((mat @ q) / norm, 5)
        # per-batch partial top-k on the ROUNDED score (the global rank key)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order].astype(np.int64), type=pa.int64()),
                "cos": pa.array(cos[order], type=pa.float64()),
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    parts = pa.concat_tables(
        list(
            ds.map_batches(
                _score, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        )
        or [pa.table({"doc_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})]
    )
    ids = parts["doc_id"].to_numpy(zero_copy_only=False)
    cos = parts["cos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "cos": pa.array(cos[order], type=pa.float64()),
            "sem_rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )


def lexical_topk(engine, query_text: str, k: int, url_to_id=None) -> pa.Table:
    """BM25 leg → (doc_id, lex_score, lex_rank): engine hits re-ranked on the
    ROUNDED-to-4 score (the oracle contract) with doc_id-asc ties, truncated
    to k.  ``url_to_id`` maps the engine's url column to the embeddings
    table's integer id space (default: the ``doc://`` scheme inverse used by
    the synthetic corpora — pass your own for a real corpus)."""
    if url_to_id is None:
        from lucene_plugin_ray.sources.pages import url_to_doc_id as url_to_id

    res = engine.search(query_text, limit=1_000_000_000)
    # the full-match-set table exists only for the rounded-rank contract —
    # evict it from the engine's count-bounded results LRU so a handful of
    # hybrid queries can't pin corpus-sized tables no search will ever hit
    try:
        cache = engine._results_cache
        for key in [k for k in cache if k[2] == 1_000_000_000]:
            cache.pop(key, None)
    except AttributeError:
        pass
    ids = url_to_id(res["url"].combine_chunks()).to_numpy(zero_copy_only=False)
    score = np.round(
        res["score"].combine_chunks().to_numpy(zero_copy_only=False), 4
    )
    order = np.lexsort((ids, -score))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order].astype(np.int64), type=pa.int64()),
            "lex_score": pa.array(score[order], type=pa.float64()),
            "lex_rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )


def rrf_fuse(
    lex: pa.Table, sem: pa.Table, k: int, rrf_k: int = DEFAULT_RRF_K
) -> pa.Table:
    """Reciprocal-rank fusion of the two leg tables →
    (doc_id, rrf, lex_rank, sem_rank), rrf = Σ 1/(rrf_k + rank) over the
    legs the doc appears in, rounded to 6; absent legs carry rank 0.  Final
    order (rrf desc, doc_id asc), top k.  Pure driver math over ≤ |lex|+|sem|
    rows."""
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1 (1/(rrf_k + rank) must stay finite)")
    lex_ids = lex["doc_id"].to_numpy(zero_copy_only=False)
    sem_ids = sem["doc_id"].to_numpy(zero_copy_only=False)
    cand = np.unique(np.concatenate([lex_ids, sem_ids]))
    lex_rank = np.zeros(cand.size, dtype=np.int64)
    sem_rank = np.zeros(cand.size, dtype=np.int64)
    pos = np.searchsorted(cand, lex_ids)
    lex_rank[pos] = lex["lex_rank"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(cand, sem_ids)
    sem_rank[pos] = sem["sem_rank"].to_numpy(zero_copy_only=False)
    rrf = np.where(lex_rank > 0, 1.0 / (rrf_k + lex_rank), 0.0) + np.where(
        sem_rank > 0, 1.0 / (rrf_k + sem_rank), 0.0
    )
    rrf = np.round(rrf, 6)
    order = np.lexsort((cand, -rrf))[:k]
    return pa.table(
        {
            "doc_id": pa.array(cand[order], type=pa.int64()),
            "rrf": pa.array(rrf[order], type=pa.float64()),
            "lex_rank": pa.array(lex_rank[order], type=pa.int64()),
            "sem_rank": pa.array(sem_rank[order], type=pa.int64()),
        }
    )


def hybrid_search(
    engine,
    sf_dir: str,
    query_text: str,
    qvec_id: int = 0,
    k: int = 10,
    k_leg: int = 20,
    rrf_k: int = DEFAULT_RRF_K,
    url_to_id=None,
) -> pa.Table:
    """BM25(query_text) ⊕ cosine(embedding of qvec_id), RRF-fused top-k.
    Result ordered (rrf desc, doc_id asc)."""
    if k <= 0 or k_leg <= 0:
        raise ValueError("k and k_leg must be positive")
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1 (1/(rrf_k + rank) must stay finite)")
    lex = lexical_topk(engine, query_text, k_leg, url_to_id=url_to_id)
    sem = semantic_topk(sf_dir, query_vector(sf_dir, qvec_id), k_leg)
    return rrf_fuse(lex, sem, k, rrf_k)
