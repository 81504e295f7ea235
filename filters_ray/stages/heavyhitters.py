"""Heavy-hitter detection (Misra-Gries summaries): the skew report that
drives salting / hot-key decisions before a shuffle.

Why a sketch: an exact per-key count of a 10^10-row key column is itself
an all-to-all aggregation over up to billions of distinct keys — the
thing we're trying to avoid. A Misra-Gries summary of capacity k is a
fixed-size (≤ k entries) mergeable state with the classic guarantee:
every key with true frequency > N/(k+1) survives, and each reported
count is an UNDER-estimate by at most the summary's error bound. That is
exactly enough to answer "which keys are hot enough to salt".

Shape: one summary per block (`map_batches` partial — a `value_counts`
per batch, then a vectorized decrement), folded on the driver (the only
driver bytes are blocks × k entries). The fold of MG summaries is itself
the standard MG merge (sum counts, subtract the (k+1)-th largest, drop
non-positive), preserving the guarantee across blocks.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ['misra_gries_batch', 'merge_summaries', 'heavy_hitters']


def misra_gries_batch(keys: np.ndarray, capacity: int) -> Dict:
    """Misra-Gries summary of one batch: exact value_counts (vectorized)
    then ONE aggregate decrement step — for a single batch, keeping the
    top-k counts and subtracting the (k+1)-th largest count from each is
    a valid MG state (each key's count is under-estimated by at most the
    subtracted amount, which is ≤ n/(k+1))."""
    s = pd.Series(keys)
    counts = s.value_counts()  # exact within the batch, descending
    if len(counts) <= capacity:
        return counts.to_dict()
    kth = int(counts.iloc[capacity])
    kept = counts.iloc[:capacity] - kth
    kept = kept[kept > 0]
    return kept.to_dict()


def merge_summaries(a: Dict, b: Dict, capacity: int) -> Dict:
    """Standard MG merge: sum, then decrement by the (k+1)-th largest."""
    out = dict(a)
    for key, cnt in b.items():
        out[key] = out.get(key, 0) + cnt
    if len(out) <= capacity:
        return out
    vals = np.sort(np.fromiter(out.values(), dtype=np.int64))[::-1]
    kth = int(vals[capacity])
    return {k: v - kth for k, v in out.items() if v - kth > 0}


def heavy_hitters(ds, column: str, capacity: int = 256,
                  min_fraction: Optional[float] = None) -> pd.DataFrame:
    """Approximate top keys of ``ds[column]`` with one streaming pass.

    Returns a DataFrame (key, count_lower_bound, fraction_lower_bound)
    sorted descending. Guarantee: every key whose true frequency exceeds
    ``n / (capacity + 1)`` appears; reported counts are lower bounds.
    ``min_fraction`` filters the report to keys whose LOWER BOUND alone
    exceeds that fraction of the scanned rows (conservative: no false
    positives above the bar)."""
    cap = int(capacity)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.drop_null()
        summary = misra_gries_batch(
            col.to_numpy(zero_copy_only=False), cap)
        keys = list(summary)
        # One row per surviving key, plus the batch's row count carried
        # on a null-key row (a batch may have rows but no survivors —
        # e.g. cap+1 equal-frequency keys decrement to nothing).
        return pa.table({
            'key': pa.array([str(k) for k in keys] + [None],
                            type=pa.string()),
            'cnt': pa.array([int(summary[k]) for k in keys] + [0],
                            type=pa.int64()),
            'n': pa.array([0] * len(keys) + [batch.num_rows],
                          type=pa.int64()),
        })

    acc: Dict = {}
    total = 0
    for part in ds.map_batches(partial, batch_format='pyarrow') \
                  .iter_batches(batch_format='pyarrow'):
        total += int(pa.compute.sum(part.column('n')).as_py() or 0)
        block = {
            k: c for k, c in zip(part.column('key').to_pylist(),
                                 part.column('cnt').to_pylist())
            if k is not None
        }
        acc = merge_summaries(acc, block, cap)

    if not acc:
        return pd.DataFrame(columns=['key', 'count_lb', 'fraction_lb'])
    out = pd.DataFrame({
        'key': list(acc), 'count_lb': np.fromiter(acc.values(), dtype=np.int64),
    })
    out['fraction_lb'] = out['count_lb'] / max(total, 1)
    out = out.sort_values('count_lb', ascending=False, ignore_index=True)
    if min_fraction is not None:
        out = out[out['fraction_lb'] >= min_fraction].reset_index(drop=True)
    return out
