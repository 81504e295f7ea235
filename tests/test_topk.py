"""Unit tests for the distributed grouped top-k stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from filters_ray.stages.topk import grouped_top_k


def _expected(df: pd.DataFrame, key, value, k, tie_by, descending=True):
    sort_cols = [value] + list(tie_by)
    ascending = [not descending] + [True] * len(tie_by)
    return (
        df.sort_values(sort_cols, ascending=ascending, kind='mergesort')
        .groupby(key, sort=False, dropna=False)
        .head(k)
    )


@pytest.mark.usefixtures('ray_session')
def test_grouped_topk_basic():
    import ray.data as rd

    t = pa.table({
        'g': ['a', 'a', 'a', 'b', 'b'],
        'v': [3, 1, 2, 9, 8],
        'id': [1, 2, 3, 4, 5],
    })
    out = grouped_top_k(
        rd.from_arrow(t), key='g', value='v', k=2, tie_by=['id'],
        num_buckets=4,
    )
    rows = sorted((r['g'], r['v'], r['id']) for r in out.take_all())
    assert rows == [('a', 2, 3), ('a', 3, 1), ('b', 8, 5), ('b', 9, 4)]


@pytest.mark.usefixtures('ray_session')
def test_grouped_topk_matches_pandas_randomized():
    """Seeded random frame split into many blocks ≡ single-frame pandas
    window rank, including value ties (broken by id) and k > group size."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        'g': rng.randint(0, 30, size=500),
        'v': rng.randint(0, 20, size=500),   # many ties
        'id': np.arange(500, dtype=np.int64),
    })
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False),
    ).repartition(13)

    for k in (1, 3, 50):
        out = grouped_top_k(
            ds, key='g', value='v', k=k, tie_by=['id'], num_buckets=8,
        )
        got = sorted((r['g'], r['v'], r['id']) for r in out.take_all())
        exp = _expected(df, 'g', 'v', k, ['id'])
        assert got == sorted(zip(exp['g'], exp['v'], exp['id'])), k


@pytest.mark.usefixtures('ray_session')
def test_grouped_topk_null_keys_form_their_own_group():
    import ray.data as rd

    t = pa.table({
        'g': ['a', None, 'a', None, None],
        'v': [1, 5, 2, 3, 4],
        'id': [1, 2, 3, 4, 5],
    })
    out = grouped_top_k(
        rd.from_arrow(t), key='g', value='v', k=2, tie_by=['id'],
        num_buckets=4,
    )
    rows = sorted(
        [(r['g'], r['v']) for r in out.take_all()], key=repr,
    )
    assert rows == sorted(
        [('a', 1), ('a', 2), (None, 5), (None, 4)], key=repr,
    )


@pytest.mark.usefixtures('ray_session')
def test_grouped_topk_ascending_and_string_keys():
    import ray.data as rd

    t = pa.table({
        'g': ['x', 'x', 'y'],
        'v': [5.0, 1.0, 2.0],
        'id': [1, 2, 3],
    })
    out = grouped_top_k(
        rd.from_arrow(t), key='g', value='v', k=1, descending=False,
        tie_by=['id'], num_buckets=4,
    )
    rows = sorted((r['g'], r['v']) for r in out.take_all())
    assert rows == [('x', 1.0), ('y', 2.0)]


def test_grouped_topk_rejects_bad_k():
    with pytest.raises(ValueError, match='k must be'):
        grouped_top_k(None, key='g', value='v', k=0)
