"""Persistent IVF ANN index: incremental embedding search at corpus scale.

The similarity twin of :class:`filters_ray.pipelines.dedup_index.MinHashIndex`:
centroids are trained once and pinned on disk, every micro-batch of
vectors is assigned and appended into Hive-partitioned inverted lists
(``_pc=<c>/``), and a search reads ONLY the ``nprobe`` probed lists
— cost scales with the probed fraction, never the corpus.

Layout::

    <root>/_centroids.parquet        # pinned (num_centroids, dim) matrix
    <root>/_pc=<c>/*.parquet         # (key, centroid, _unit fsl) rows

Vectors are stored L2-normalized (``_unit``) so search is one matmul per
batch against the broadcast query matrix — the same kernel as
``knn_brute_force``, over a pruned file set.
"""

from __future__ import annotations

import os
import uuid
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .similarity import (
    _as_matrix,
    _matrix_to_fsl,
    _normalize,
    train_centroids,
)

__all__ = ['AnnIndex']


class AnnIndex:
    def __init__(self, root: str, column: str = 'embedding',
                 key: str = 'vec_id') -> None:
        self.root = root
        self.column = column
        self.key = key
        os.makedirs(root, exist_ok=True)
        self.centroids: Optional[np.ndarray] = None
        cpath = self._centroids_path()
        if os.path.exists(cpath):
            t = pq.read_table(cpath)
            self.centroids = _as_matrix(t.column('centroid_vec'))

    def _centroids_path(self) -> str:
        return os.path.join(self.root, '_centroids.parquet')

    def list_dir(self, c: int) -> str:
        """On-disk directory of centroid ``c``'s inverted list (the Hive
        partition ``add()`` actually writes)."""
        return os.path.join(self.root, f'_pc={c}')

    # -- build / add -------------------------------------------------------

    def build(self, ds, num_centroids: int = 16, sample_rows: int = 4096,
              seed: int = 7) -> int:
        """Train + pin centroids (bounded deterministic k-means sample),
        then index ``ds``. On an existing index the pinned centroids win
        (vectors indexed under them stay comparable)."""
        if self.centroids is None:
            cents = train_centroids(
                ds, num_centroids=num_centroids, column=self.column,
                sample_rows=sample_rows, seed=seed,
            )
            tmp = f'{self._centroids_path()}.tmp-{uuid.uuid4().hex[:8]}'
            pq.write_table(
                pa.table({'centroid_vec': _matrix_to_fsl(cents)}), tmp)
            os.replace(tmp, self._centroids_path())
            self.centroids = cents
        return self.add(ds)

    def add(self, ds) -> int:
        """Assign a vector Dataset to the pinned centroids and append
        into the inverted lists. Append-only (uuid file names)."""
        if self.centroids is None:
            raise ValueError('index has no centroids — call build() first')
        import ray

        from ..sources.io import write_partitioned
        from .similarity import IvfIndex

        tagged = IvfIndex(self.centroids, column=self.column,
                          key=self.key).assign(ds)

        def with_partition_col(batch: pa.Table) -> pa.Table:
            return batch.append_column('_pc', batch.column('centroid'))

        # Materialize once: count() + write would otherwise execute the
        # assignment pipeline twice (ADVICE r3). A micro-batch is
        # bounded, so pinning its blocks is safe.
        tagged = tagged.map_batches(with_partition_col,
                                    batch_format='pyarrow').materialize()
        n = tagged.count()
        write_partitioned(tagged, self.root, partition_cols=['_pc'])
        return int(n)

    # -- search ------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        """Cosine top-k per query over the probed inverted lists only.

        Returns (query, vec_id, score) rows, k per query, best-first.
        ``nprobe >= num_centroids`` probes everything (exact over the
        indexed set)."""
        if self.centroids is None:
            raise ValueError('index has no centroids — call build() first')
        import ray
        import ray.data as rd

        q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
        sims = q @ self.centroids.T  # (nq, ncent)
        nprobe = min(nprobe, self.centroids.shape[0])
        probe_sets = np.argsort(-sims, axis=1)[:, :nprobe]
        probed = sorted(set(probe_sets.ravel().tolist()))

        files = []
        for c in probed:
            d = self.list_dir(c)
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.endswith('.parquet')
                )
        if not files:
            return pd.DataFrame(columns=['query', 'vec_id', 'score'])

        q_ref = ray.put(q)
        probe_ref = ray.put(probe_sets)
        key = self.key

        def partial_topk(batch: pa.Table) -> pa.Table:
            qs = ray.get(q_ref)
            psets = ray.get(probe_ref)
            mat = _as_matrix(batch.column('_unit'))
            cent = batch.column('centroid').to_numpy(zero_copy_only=False)
            ids = batch.column(key).to_numpy(zero_copy_only=False)
            scores = qs @ mat.T  # (nq, n)
            out_q, out_id, out_s = [], [], []
            for qi in range(qs.shape[0]):
                # A vector only counts for queries that probed its list.
                valid = np.isin(cent, psets[qi])
                s = np.where(valid, scores[qi], -np.inf)
                top = min(k, int(valid.sum()))
                if top == 0:
                    continue
                idx = np.argpartition(-s, top - 1)[:top]
                keep = idx[np.isfinite(s[idx])]
                out_q.extend([qi] * len(keep))
                out_id.extend(ids[keep].tolist())
                out_s.extend(s[keep].tolist())
            return pa.table({
                'query': pa.array(out_q, type=pa.int64()),
                'vec_id': pa.array(out_id, type=pa.int64()),
                'score': pa.array(out_s, type=pa.float64()),
            })

        parts = rd.read_parquet(files) \
            .map_batches(partial_topk, batch_format='pyarrow') \
            .to_pandas()  # k × blocks × queries rows — bounded
        out = parts.sort_values('score', ascending=False) \
            .groupby('query', sort=True).head(k)
        return out.sort_values(['query', 'score'],
                               ascending=[True, False],
                               ignore_index=True)
