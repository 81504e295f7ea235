"""Non-equi interval (range) join as a broadcast + searchsorted stage.

The reference engine has no joins at all (it validates single values);
this is one of the engine-category operators Ray Data itself lacks
(`Dataset.join` is equi-only). Semantics follow the SQL non-equi join

    big JOIN intervals i ON big.on >= i.lo AND big.on < i.hi

for a *small*, sorted, non-overlapping interval table.

Scale shape: the interval side is broadcast ONCE via ``ray.put`` (read
by every task from the object store, never re-shipped per batch) and
each batch performs a single vectorized ``np.searchsorted`` — no
shuffle of the big side at all, so the stage streams at read speed on
any cluster size.  For the large×large overlapping-interval case,
bucket both sides by a coarse range key and cogroup per bucket
(stages/cogroup.py holds the bucketed-join machinery); no current
pipeline needs that variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ['interval_join']


def _as_numpy(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def interval_join(
    ds,
    intervals: pa.Table,
    on: str,
    lo: str = 'lo',
    hi: str = 'hi',
    how: str = 'inner',
):
    """Join ``ds`` rows to the interval covering ``ds[on]``.

    ``intervals`` must be small (broadcastable), sorted by ``lo``, and
    non-overlapping; every attribute column other than ``lo``/``hi`` is
    appended to matching rows.  ``how='inner'`` drops unmatched rows,
    ``how='left'`` keeps them with null attributes.  Bounds are
    half-open ``[lo, hi)``; null/NaN/NaT probe values never match.
    """
    import ray

    if how not in ('inner', 'left'):
        raise ValueError(f'how must be inner|left, got {how!r}')
    los = _as_numpy(intervals.column(lo))
    his = _as_numpy(intervals.column(hi))
    if not (los[1:] > los[:-1]).all():
        raise ValueError('intervals must be sorted by lo (strictly)')
    if (his <= los).any() or (los[1:] < his[:-1]).any():
        raise ValueError('intervals must be non-empty and non-overlapping')
    attrs = intervals.drop_columns([lo, hi])
    ivals_ref = ray.put((los, his, attrs))

    def probe(batch: pa.Table) -> pa.Table:
        los_, his_, attrs_ = ray.get(ivals_ref)
        v = _as_numpy(batch.column(on))
        if len(los_) == 0:
            idx = np.zeros(len(v), dtype=np.int64)
            matched = np.zeros(len(v), dtype=bool)
        else:
            idx = np.searchsorted(los_, v, side='right') - 1
            # NaN/NaT compare false, so nulls fall out as unmatched here.
            matched = (idx >= 0) & np.less(v, his_[np.clip(idx, 0, None)])
        if how == 'inner':
            keep = np.flatnonzero(matched)
            out = batch.take(pa.array(keep))
            picked = attrs_.take(pa.array(idx[keep]))
        else:
            out = batch
            # Null indices propagate as null attribute values in take.
            picked = attrs_.take(pa.array(
                np.where(matched, idx, 0), mask=~matched,
            ))
        for name in picked.column_names:
            out = out.append_column(name, picked.column(name))
        return out.replace_schema_metadata(None)

    return ds.map_batches(probe, batch_format='pyarrow')
