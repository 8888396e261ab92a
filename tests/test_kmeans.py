"""embedding_cluster / semantic_dedup property tests — iterative ops (no
SQL oracle): determinism, full assignment, argmax-optimality against the
op's own recomputed centroids, and SemDeDup keeper/threshold invariants."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_plugin_ray.pipelines import training
from lucene_plugin_ray.pipelines.training import _embedding_matrix
from lucene_plugin_ray.sources.reader import read_parquet_clean

SF = "/root/testdata/sf0.001"


def _vectors():
    t = pa.concat_tables(
        b
        for b in read_parquet_clean(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("vec_id")
    m = _embedding_matrix(t["embedding"])
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return t["vec_id"].to_numpy(zero_copy_only=False), m / n


def test_embedding_cluster_properties(ray_session):
    got = training.embedding_cluster(SF, n_clusters=4, n_iter=3)
    ids, mn = _vectors()
    assert got.num_rows == ids.size  # every vector assigned exactly once
    g = got.sort_by("vec_id")
    assert (g["vec_id"].to_numpy(zero_copy_only=False) == ids).all()
    cl = g["cluster"].to_numpy(zero_copy_only=False)
    assert set(np.unique(cl)) <= set(range(4))
    cos = g["cos"].to_numpy(zero_copy_only=False)
    assert (cos <= 1.0 + 1e-9).all() and (cos >= -1.0 - 1e-9).all()
    # argmax-optimality: recompute the deterministic centroids with the
    # op's own fit and check every vector is assigned its NEAREST centroid
    # and the reported cos is the true cosine (to 5-decimal rounding)
    from lucene_plugin_ray.pipelines.training import _kmeans_centroids

    cents = _kmeans_centroids(
        read_parquet_clean(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        n_clusters=4,
        n_iter=3,
    )
    sims = mn @ cents.T
    assert (sims.argmax(axis=1) == cl).all()
    np.testing.assert_allclose(
        cos, np.round(sims[np.arange(ids.size), cl], 5), atol=1e-9
    )


def test_embedding_cluster_deterministic(ray_session):
    a = training.embedding_cluster(SF, n_clusters=4, n_iter=2).to_pandas()
    b = training.embedding_cluster(SF, n_clusters=4, n_iter=2).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_embedding_cluster_edge_params(ray_session):
    one = training.embedding_cluster(SF, n_clusters=1, n_iter=1)
    assert set(one["cluster"].to_pylist()) == {0}
    with pytest.raises(ValueError):
        training.embedding_cluster(SF, n_clusters=0)
    with pytest.raises(ValueError):
        training.embedding_cluster(SF, n_iter=0)


def test_semantic_dedup_properties(ray_session):
    got = training.semantic_dedup(SF, n_clusters=4, n_iter=2, threshold=0.35)
    ids, mn = _vectors()
    assert got.num_rows == ids.size  # every vector classified
    g = got.sort_by("vec_id")
    vid = g["vec_id"].to_numpy(zero_copy_only=False)
    assert (vid == ids).all()
    cl = g["cluster"].to_numpy(zero_copy_only=False)
    keep = g["keep_id"].to_numpy(zero_copy_only=False)
    kept = g["kept"].to_numpy(zero_copy_only=False)
    assert (~kept).any()  # the planted near-dups actually dedupe at 0.35
    # keep_id is always a kept vector, in the same cluster, with id <= own
    kept_set = set(vid[kept])
    pos = {v: i for i, v in enumerate(vid)}
    for v, k_, c in zip(vid, keep, cl):
        assert k_ in kept_set and k_ <= v and cl[pos[k_]] == c
    # within a cluster, surviving (kept) vectors are pairwise <= threshold:
    # any pair above threshold is adjacency -> same component -> one keeper
    for c in np.unique(cl):
        sel = kept & (cl == c)
        sub = mn[np.isin(ids, vid[sel])]
        if sub.shape[0] > 1:
            s = sub @ sub.T
            np.fill_diagonal(s, 0.0)
            assert s.max() <= 0.35 + 1e-9
    # dropped vectors really have a >threshold path: direct-neighbor check
    # for the common (dense component) case — every dropped vector is
    # within threshold of SOME same-cluster vector
    dropped = ~kept
    for i in np.flatnonzero(dropped):
        same = (cl == cl[i])
        same[i] = False
        if same.any():
            assert (mn[i] @ mn[same].T).max() > 0.35 - 1e-9


def test_semantic_dedup_deterministic_and_valid(ray_session):
    a = training.semantic_dedup(SF, n_clusters=4, n_iter=1).to_pandas()
    b = training.semantic_dedup(SF, n_clusters=4, n_iter=1).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        training.semantic_dedup(SF, threshold=0.0)
    with pytest.raises(ValueError):
        training.semantic_dedup(SF, threshold=1.5)
