"""Persistent IVF ANN index (pipelines/ann_index.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from filters_ray.pipelines.ann_index import AnnIndex


def _vecs(rng, n, dim=16, id_base=0):
    return pd.DataFrame({
        'vec_id': np.arange(id_base, id_base + n, dtype=np.int64),
        'embedding': list(rng.normal(size=(n, dim)).astype(np.float32)),
    })


def _brute_topk(df, q, k):
    mat = np.asarray(df['embedding'].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    scores = mat @ qn
    idx = np.argsort(-scores)[:k]
    return set(df['vec_id'].to_numpy()[idx].tolist())


@pytest.mark.usefixtures('ray_session')
def test_full_probe_is_exact(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = _vecs(rng, 400)
    index = AnnIndex(str(tmp_path / 'ann'))
    assert index.build(rd.from_pandas(df), num_centroids=8) == 400

    q = rng.normal(size=16)
    hits = index.search(q, k=10, nprobe=8)
    assert len(hits) == 10
    assert set(hits['vec_id']) == _brute_topk(df, q, 10)
    # Best-first ordering per query.
    assert (np.diff(hits['score'].to_numpy()) <= 1e-12).all()


@pytest.mark.usefixtures('ray_session')
def test_pruned_probe_recall(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    df = _vecs(rng, 1000, dim=8)
    index = AnnIndex(str(tmp_path / 'ann'))
    index.build(rd.from_pandas(df), num_centroids=16)

    recalls = []
    for s in range(10):
        q = rng.normal(size=8)
        hits = index.search(q, k=10, nprobe=6)
        exact = _brute_topk(df, q, 10)
        recalls.append(len(set(hits['vec_id']) & exact) / 10)
    assert np.mean(recalls) >= 0.7, recalls


@pytest.mark.usefixtures('ray_session')
def test_incremental_add_and_pinned_centroids(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(7)
    a = _vecs(rng, 200)
    index = AnnIndex(str(tmp_path / 'ann'))
    index.build(rd.from_pandas(a), num_centroids=8)

    # A new batch contains an exact duplicate of the query vector.
    target = np.asarray(a['embedding'].iloc[0], dtype=np.float64)
    b = _vecs(rng, 50, id_base=10_000)
    b['embedding'] = b['embedding'].astype(object)
    b.at[0, 'embedding'] = target.astype(np.float32)
    index.add(rd.from_pandas(b))

    hits = index.search(target, k=2, nprobe=8)
    assert {0, 10_000} <= set(hits['vec_id'])

    # Reopen: centroids come back pinned from disk.
    reopened = AnnIndex(str(tmp_path / 'ann'))
    assert reopened.centroids is not None
    assert np.allclose(reopened.centroids, index.centroids)
    hits2 = reopened.search(target, k=2, nprobe=8)
    assert set(hits2['vec_id']) == set(hits['vec_id'])


def test_search_without_build_raises(tmp_path):
    index = AnnIndex(str(tmp_path / 'ann'))
    with pytest.raises(ValueError, match='centroids'):
        index.search(np.ones(4), k=1)
