"""Incremental near-dup detection: a persistent banded MinHash index.

The composition a CDC-shaped corpus needs: each arriving micro-batch must
be checked for near-duplicates against the WHOLE already-ingested corpus
— without rescanning it. The index stores every document's per-band
signature rows as Hive-partitioned parquet (``band=<b>/bucket=<m>/``);
probing a new batch reads ONLY the band-buckets its signatures touch
(``docs × bands`` buckets at most), so probe cost scales with the batch,
not the corpus.

* ``add(ds)`` — signature rows via the same vectorized ``MinHashStage``
  used by batch dedup, written partitioned by (band, bucket). Append-only
  (one file set per call); parameters pinned in ``_meta.json`` so every
  add/probe folds identical signatures.
* ``probe(ds)`` — candidate pairs (new_key, indexed_key) whose band
  signatures collide, LSH semantics identical to
  :func:`filters_ray.pipelines.dedup.minhash_candidates`. Follow with
  :func:`filters_ray.pipelines.dedup.verify_jaccard_pairs` over the
  union text source for exact-Jaccard confirmation, exactly as the
  batch pipeline does. Intra-batch duplicates are NOT reported (run
  ``minhash_candidates`` on the batch for those).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import MinHashStage, _default_pool_size, _dedup_pairs

__all__ = ['MinHashIndex']


class MinHashIndex:
    def __init__(self, root: str, column: str = 'text', key: str = 'doc_id',
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 num_buckets: int = 256, seed: int = 1729) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        meta_path = os.path.join(root, '_meta.json')
        params = {
            'column': column, 'key': key, 'num_perm': num_perm,
            'bands': bands, 'shingle_k': shingle_k,
            'num_buckets': num_buckets, 'seed': seed, 'version': 1,
        }
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                pinned = json.load(fh)
            # Signature comparability requires identical parameters for
            # the index's whole lifetime — the pinned set wins.
            params = pinned
        else:
            tmp = f'{meta_path}.tmp-{uuid.uuid4().hex[:8]}'
            with open(tmp, 'w') as fh:
                json.dump(params, fh, sort_keys=True)
            os.replace(tmp, meta_path)
        self.params = params
        self.column = params['column']
        self.key = params['key']
        self.num_buckets = params['num_buckets']
        self.bands = params['bands']

    # -- internals --------------------------------------------------------

    def _stage_kwargs(self) -> dict:
        p = self.params
        return {
            'column': p['column'], 'key': p['key'],
            'num_perm': p['num_perm'], 'bands': p['bands'],
            'shingle_k': p['shingle_k'], 'seed': p['seed'],
            'sub_buckets': p['num_buckets'],
        }

    def _signature_rows(self, ds):
        return ds.map_batches(
            MinHashStage, fn_constructor_kwargs=self._stage_kwargs(),
            batch_format='pyarrow', concurrency=_default_pool_size(),
        )

    def bucket_dir(self, band: int, bucket: int) -> str:
        # Hive dirs are named by the PARTITION-column copies (_pband /
        # _pbucket); the real band/bucket columns stay in the files.
        return os.path.join(self.root, f'_pband={band}', f'_pbucket={bucket}')

    # -- API ---------------------------------------------------------------

    def add(self, ds) -> int:
        """Index a document Dataset; returns signature rows written.
        Append-only: each call writes its own file per touched bucket
        (uuid names — concurrent/retried adds never clobber)."""
        from ..sources.io import write_partitioned

        sigs = self._signature_rows(ds)

        def with_partition_cols(batch: pa.Table) -> pa.Table:
            # Keep band/bucket as REAL columns too: Hive partitioning
            # strips partition cols from file contents, and probe reads
            # leaf directories directly.
            out = batch.rename_columns([
                'bucket' if c == '_bm' else c for c in batch.column_names
            ])
            out = out.append_column('_pband', out.column('band'))
            return out.append_column('_pbucket', out.column('bucket'))

        # Materialize once: count() + write would otherwise execute the
        # signature pipeline twice (VERDICT r4). A micro-batch is
        # bounded, so pinning its blocks is safe.
        sigs = sigs.map_batches(with_partition_cols,
                                batch_format='pyarrow').materialize()
        n = sigs.count()
        write_partitioned(sigs, self.root,
                          partition_cols=['_pband', '_pbucket'])
        return int(n)

    def probe(self, ds, verify_threshold: Optional[float] = None,
              texts=None, pair_buckets: Optional[int] = None):
        """Candidate near-dup pairs (left = probe key, right = indexed
        key). Reads only the index buckets the probe's signatures touch.

        With ``verify_threshold`` and ``texts`` (a Dataset holding BOTH
        corpora's (key, text) rows), candidates are exact-Jaccard
        verified before returning."""
        import ray.data as rd

        probe_sigs = self._signature_rows(ds).materialize()

        touched = set()
        hash_vals = []
        for part in probe_sigs.select_columns(['band', '_bm', 'band_hash']) \
                              .iter_batches(batch_format='pyarrow'):
            bands = part.column('band').to_pylist()
            bms = part.column('_bm').to_pylist()
            touched.update(zip(bands, bms))
            hash_vals.append(part.column('band_hash'))
        dirs = []
        for b, m in sorted(touched):
            d = self.bucket_dir(b, m)
            if os.path.isdir(d):
                dirs.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.endswith('.parquet')
                )
        empty = pa.table({
            'left': pa.array([], type=pa.int64()),
            'right': pa.array([], type=pa.int64()),
        })
        if not dirs:
            return rd.from_arrow(empty)

        import ray

        probe_hashes = pa.concat_arrays(
            [c for chunk in hash_vals for c in
             (chunk.chunks if isinstance(chunk, pa.ChunkedArray) else [chunk])],
        )
        hashes_ref = ray.put(pc.unique(probe_hashes).sort())

        def prune(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column('band_hash').combine_chunks(),
                            value_set=ray.get(hashes_ref))
            kept = batch.filter(pc.fill_null(mask, False))
            return pa.table({
                'right': kept.column(self.key),
                'band_r': kept.column('band'),
                'band_hash': kept.column('band_hash'),
            })

        index_rows = rd.read_parquet(dirs).map_batches(
            prune, batch_format='pyarrow')

        def probe_cols(batch: pa.Table) -> pa.Table:
            return pa.table({
                'left': batch.column(self.key),
                'band_l': batch.column('band'),
                'band_hash': batch.column('band_hash'),
            })

        from ..stages.cogroup import hash_bucket_join

        joined = hash_bucket_join(
            probe_sigs.map_batches(probe_cols, batch_format='pyarrow'),
            index_rows, left_on='band_hash', right_on='band_hash',
        )

        def finish(batch: pa.Table) -> pa.Table:
            same_band = pc.equal(batch.column('band_l'),
                                 batch.column('band_r'))
            not_self = pc.not_equal(batch.column('left'),
                                    batch.column('right'))
            kept = batch.filter(pc.and_(same_band, not_self))
            return pa.table({
                'left': kept.column('left'),
                'right': kept.column('right'),
            })

        if pair_buckets is None:
            # One pair bucket materializes as ONE frame — scale the
            # count with the probe's signature rows (bands × batch docs).
            pair_buckets = max(64, -(-probe_sigs.count() // 131072))
        pairs = _dedup_pairs(
            joined.map_batches(finish, batch_format='pyarrow'),
            num_buckets=pair_buckets,
        )
        if verify_threshold is not None and texts is not None:
            from .dedup import verify_jaccard_pairs

            return verify_jaccard_pairs(
                pairs, texts, column=self.column, key=self.key,
                shingle_k=self.params['shingle_k'],
                threshold=verify_threshold,
            )
        return pairs
