"""Incremental MinHash index (pipelines/dedup_index.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from filters_ray.pipelines.dedup_index import MinHashIndex


def _docs(rng, n, id_base=0, words=120):
    # High-entropy tokens: random docs must be byte-shingle DISSIMILAR
    # (a tiny vocab makes any two random docs true near-dups).
    rows = []
    for i in range(n):
        toks = [f'{v:012x}' for v in rng.integers(0, 2**48, size=words)]
        rows.append({'doc_id': id_base + i, 'text': ' '.join(toks)})
    return pd.DataFrame(rows)


def _clone(df, id_base):
    out = df.copy()
    out['doc_id'] = out['doc_id'] + id_base
    out['text'] = out['text'] + ' tail'  # near-dup, not exact
    return out


@pytest.mark.usefixtures('ray_session')
def test_probe_finds_cross_corpus_near_dups(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(13)
    corpus = _docs(rng, 40)
    index = MinHashIndex(str(tmp_path / 'idx'), num_buckets=32)
    assert index.add(rd.from_pandas(corpus)) == 40 * index.bands

    # New batch: 10 fresh docs + clones of corpus docs 0..9.
    fresh = _docs(rng, 10, id_base=1000)
    clones = _clone(corpus.head(10), id_base=5000)
    batch = pd.concat([fresh, clones], ignore_index=True)

    pairs = index.probe(rd.from_pandas(batch)).to_pandas()
    found = set(zip(pairs['left'].astype(int), pairs['right'].astype(int)))
    expected = {(5000 + i, i) for i in range(10)}
    assert expected <= found
    # Fresh random docs must not pair with anything.
    assert not any(left >= 1000 and left < 2000 for left, _ in found)


@pytest.mark.usefixtures('ray_session')
def test_probe_disjoint_batch_is_empty(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(17)
    index = MinHashIndex(str(tmp_path / 'idx'))
    index.add(rd.from_pandas(_docs(rng, 30)))
    pairs = index.probe(rd.from_pandas(_docs(rng, 15, id_base=900)))
    assert pairs.count() == 0


@pytest.mark.usefixtures('ray_session')
def test_incremental_adds_accumulate(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(19)
    a = _docs(rng, 20)
    b = _docs(rng, 20, id_base=100)
    index = MinHashIndex(str(tmp_path / 'idx'), num_buckets=16)
    index.add(rd.from_pandas(a))
    index.add(rd.from_pandas(b))

    probe = _clone(b.head(5), id_base=7000)
    pairs = index.probe(rd.from_pandas(probe)).to_pandas()
    found = set(zip(pairs['left'].astype(int), pairs['right'].astype(int)))
    assert {(7000 + 100 + i, 100 + i) for i in range(5)} <= found


@pytest.mark.usefixtures('ray_session')
def test_add_executes_input_pipeline_once(tmp_path):
    """add() must materialize once — count() + write over a lazy input
    used to execute the whole upstream pipeline TWICE (VERDICT r4)."""
    import uuid

    import ray.data as rd

    marks = tmp_path / 'marks'
    marks.mkdir()

    def marker(batch: pa.Table) -> pa.Table:
        (marks / f'{uuid.uuid4().hex}').touch()
        return batch

    rng = np.random.default_rng(29)
    ds = rd.from_pandas(_docs(rng, 20)).map_batches(
        marker, batch_format='pyarrow')
    index = MinHashIndex(str(tmp_path / 'idx'), num_buckets=16)
    index.add(ds)
    # from_pandas is one block: one execution => exactly one marker.
    assert len(list(marks.iterdir())) == 1


@pytest.mark.usefixtures('ray_session')
def test_verified_probe_filters_by_jaccard(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(23)
    corpus = _docs(rng, 20)
    index = MinHashIndex(str(tmp_path / 'idx'), num_buckets=16)
    index.add(rd.from_pandas(corpus))

    probe = _clone(corpus.head(5), id_base=3000)
    texts = pd.concat([corpus, probe], ignore_index=True)
    pairs = index.probe(
        rd.from_pandas(probe), verify_threshold=0.8,
        texts=rd.from_pandas(texts),
    ).to_pandas()
    assert len(pairs) >= 5
    assert (pairs['jaccard'] >= 0.8).all()


def test_params_pinned_at_creation(tmp_path, ray_session):
    import ray.data as rd

    rng = np.random.default_rng(29)
    idx1 = MinHashIndex(str(tmp_path / 'idx'), num_perm=32, bands=8)
    idx1.add(rd.from_pandas(_docs(rng, 5)))
    # Reopen with different params — the pinned set must win.
    idx2 = MinHashIndex(str(tmp_path / 'idx'), num_perm=64, bands=16)
    assert idx2.params['num_perm'] == 32
    assert idx2.bands == 8
