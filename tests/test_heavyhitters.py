"""Misra-Gries heavy-hitter sketch (stages/heavyhitters.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from filters_ray.stages.heavyhitters import (
    heavy_hitters,
    merge_summaries,
    misra_gries_batch,
)


def test_batch_summary_guarantee():
    """Every key with frequency > n/(k+1) survives; counts are lower
    bounds."""
    rng = np.random.default_rng(2)
    # 3 hot keys at ~20% each, tail of 1000 cold keys.
    hot = np.repeat(np.array(['A', 'B', 'C'], dtype=object), 2000)
    cold = rng.integers(1000, 2000, size=4000).astype(str).astype(object)
    keys = np.concatenate([hot, cold])
    rng.shuffle(keys)
    summary = misra_gries_batch(keys, capacity=16)
    exact = pd.Series(keys).value_counts()
    for k in ('A', 'B', 'C'):
        assert k in summary
        assert summary[k] <= exact[k]  # under-estimate only


def test_merge_preserves_guarantee():
    a = misra_gries_batch(
        np.array(['x'] * 500 + ['y'] * 300 + ['z'] * 10, dtype=object), 4)
    b = misra_gries_batch(
        np.array(['x'] * 400 + ['w'] * 350 + ['q'] * 10, dtype=object), 4)
    merged = merge_summaries(a, b, 4)
    assert len(merged) <= 4
    assert merged['x'] <= 900
    assert 'x' in merged and 'y' in merged and 'w' in merged


def test_capacity_plus_one_equal_keys_decrements_away():
    keys = np.array(list('abcde') * 10, dtype=object)  # 5 keys, cap 4
    summary = misra_gries_batch(keys, capacity=4)
    # All equal frequency: nothing can be declared heavy.
    assert summary == {}


def test_heavy_hitters_on_zipf_dataset(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    z = rng.zipf(1.5, size=200_000)
    z = z[z < 10_000]
    ds = rd.from_pandas(pd.DataFrame({'repo': [f'repo-{v}' for v in z]}))
    report = heavy_hitters(ds, 'repo', capacity=64)
    exact = pd.Series([f'repo-{v}' for v in z]).value_counts()
    n = len(z)
    # Guarantee: every key above n/(cap+1) is reported.
    must_have = set(exact[exact > n / 65].index)
    assert must_have <= set(report['key'])
    # Lower bounds never exceed exact counts.
    for _, row in report.iterrows():
        assert row['count_lb'] <= exact.get(row['key'], 0)
    # The report is tiny regardless of input size.
    assert len(report) <= 64
    # min_fraction filter is conservative.
    top = heavy_hitters(ds, 'repo', capacity=64, min_fraction=0.05)
    for _, row in top.iterrows():
        assert exact[row['key']] / n >= 0.05


def test_heavy_hitters_skips_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({'k': pa.array(['a', None, 'a', 'b', None] * 40,
                                type=pa.string())})
    report = heavy_hitters(rd.from_arrow(t), 'k', capacity=8)
    assert set(report['key']) == {'a', 'b'}
    assert int(report.set_index('key').loc['a', 'count_lb']) <= 80
