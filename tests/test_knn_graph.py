"""All-pairs k-NN graph (training.knn_graph): exact strategy equals a
from-scratch numpy reference; the bucketed LSH path recovers most exact
edges (recall pinned) and is deterministic."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_plugin_ray.pipelines import training


def _write_embeddings(tmp_path, mat, name="emb"):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in mat],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


def _reference_knn(mat, k):
    m = np.asarray(mat, dtype=np.float64)
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    mn = m / nrm
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    out = []
    for i in range(len(m)):
        order = sorted(range(len(m)), key=lambda j: (-sims[i, j], j))[:k]
        out.extend(
            (i, j, r, round(float(sims[i, j]), 5))
            for r, j in enumerate(order)
        )
    return out


def test_exact_matches_reference(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((40, 8)).astype(np.float32)
    d = _write_embeddings(tmp_path, mat)
    t = training.knn_graph(d, k=4, strategy="exact")
    got = list(zip(t["vec_id"].to_pylist(), t["nbr_id"].to_pylist(),
                   t["rank"].to_pylist(), t["cos"].to_pylist()))
    # float32 storage: recompute the reference from the STORED values
    stored = np.array(mat, dtype=np.float32)
    want = _reference_knn(stored, 4)
    assert got == want


def test_exact_k_larger_than_corpus(ray_session, tmp_path):
    mat = np.eye(3, dtype=np.float32)
    d = _write_embeddings(tmp_path, mat)
    t = training.knn_graph(d, k=10, strategy="exact")
    # only n-1 = 2 neighbors exist per vector
    assert t.num_rows == 6
    assert max(t["rank"].to_pylist()) == 1


def test_bucketed_recall_and_determinism(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = training.knn_graph(sf, k=5, strategy="exact")
    b1 = training.knn_graph(sf, k=5, strategy="bucketed")
    b2 = training.knn_graph(sf, k=5, strategy="bucketed")
    assert b1.equals(b2), "bucketed path must be deterministic"
    ep = set(zip(exact["vec_id"].to_pylist(), exact["nbr_id"].to_pylist()))
    bp = set(zip(b1["vec_id"].to_pylist(), b1["nbr_id"].to_pylist()))
    recall = len(ep & bp) / len(ep)
    assert recall >= 0.8, recall
    # every reported edge is a TRUE cosine (verify a sample against numpy)
    import pyarrow.parquet as pq_

    emb = pq_.read_table(f"{sf}/embeddings.parquet")
    from lucene_plugin_ray.pipelines.training import _embedding_matrix

    m = _embedding_matrix(emb["embedding"])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    pos = {int(v): i for i, v in enumerate(ids)}
    for r in b1.slice(0, 50).to_pylist():
        want = round(float(mn[pos[r["vec_id"]]] @ mn[pos[r["nbr_id"]]]), 5)
        assert abs(r["cos"] - want) <= 1e-9


def test_validation_and_sink(ray_session, tmp_path):
    with pytest.raises(ValueError):
        training.knn_graph("/root/testdata/sf0.001", k=0)
    with pytest.raises(ValueError):
        training.knn_graph("/root/testdata/sf0.001", strategy="typo")
    mat = np.random.default_rng(5).standard_normal((10, 4)).astype(np.float32)
    d = _write_embeddings(tmp_path, mat)
    out = tmp_path / "knn_out"
    assert training.knn_graph(d, k=2, strategy="exact",
                              output_path=str(out)) is None
    got = pq.read_table(str(out))
    assert got.num_rows == 20
