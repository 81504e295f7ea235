"""Unit tests for the bucketed cogroup shuffle join."""

from __future__ import annotations

import pyarrow as pa
import pytest

from filters_ray.stages.cogroup import hash_bucket_join


@pytest.mark.usefixtures('ray_session')
def test_inner_join_basic():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1, 2, 3, 4, 2], 'x': [10, 20, 30, 40, 21]}))
    right = rd.from_arrow(pa.table({'kk': [2, 3, 5], 'y': ['b', 'c', 'e']}))
    out = sorted(
        (r['k'], r['x'], r['y'])
        for r in hash_bucket_join(left, right, 'k', 'kk', num_buckets=4).take_all()
    )
    assert out == [(2, 20, 'b'), (2, 21, 'b'), (3, 30, 'c')]


@pytest.mark.usefixtures('ray_session')
def test_left_join_keeps_unmatched():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1, 2], 'x': [10, 20]}))
    right = rd.from_arrow(pa.table({'kk': [2], 'y': [99]}))
    rows = {r['k']: r['y'] for r in hash_bucket_join(
        left, right, 'k', 'kk', num_buckets=4, how='left',
    ).take_all()}
    assert rows == {1: None, 2: 99}


@pytest.mark.usefixtures('ray_session')
def test_join_string_keys_and_types_preserved():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'name': ['a', 'b'], 'v': [1, 2]}))
    right = rd.from_arrow(pa.table({'n2': ['b', 'a'], 'w': [0.5, 0.25]}))
    j = hash_bucket_join(left, right, 'name', 'n2', num_buckets=8)
    schema = dict(zip(j.schema().names, map(str, j.schema().types)))
    assert schema == {'name': 'string', 'v': 'int64', 'w': 'double'}
    assert sorted((r['name'], r['v'], r['w']) for r in j.take_all()) == [
        ('a', 1, 0.25), ('b', 2, 0.5),
    ]


@pytest.mark.usefixtures('ray_session')
def test_join_rejects_column_collision():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1], 'dup': [1]}))
    right = rd.from_arrow(pa.table({'kk': [1], 'dup': [2]}))
    with pytest.raises(ValueError, match='collide'):
        hash_bucket_join(left, right, 'k', 'kk')


@pytest.mark.usefixtures('ray_session')
def test_join_rejects_unknown_how():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({'k': [1]}))
    with pytest.raises(ValueError, match='join type'):
        hash_bucket_join(ds, ds, 'k', 'k', how='cross')


@pytest.mark.usefixtures('ray_session')
def test_join_matches_pandas_merge_randomized():
    """Seeded random tables: hash_bucket_join ≡ pandas merge (inner and
    left), including duplicate keys on both sides and null keys."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.RandomState(77)
    left = pd.DataFrame({
        'k': rng.randint(0, 40, size=300),
        'x': rng.randint(0, 1000, size=300),
    })
    right = pd.DataFrame({
        'kk': rng.randint(0, 40, size=80),
        'y': rng.randint(0, 1000, size=80),
    })
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))

    for how in ('inner', 'left'):
        got = pd.DataFrame(
            hash_bucket_join(lds, rds, 'k', 'kk', num_buckets=8, how=how)
            .take_all(),
        )
        exp = left.merge(right.rename(columns={'kk': 'k'}), on='k', how=how)
        key = ['k', 'x', 'y']
        got_s = got[key].fillna(-1).sort_values(key).reset_index(drop=True)
        exp_s = exp[key].fillna(-1).sort_values(key).reset_index(drop=True)
        assert got_s.astype('int64').equals(exp_s.astype('int64')), how


@pytest.mark.usefixtures('ray_session')
def test_null_keys_never_match():
    """SQL semantics: a null join key matches nothing (pandas merge would
    match NaN==NaN). Inner drops null-key rows; left keeps left ones
    unmatched."""
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1, None, 2], 'x': [10, 11, 20]}))
    right = rd.from_arrow(pa.table({'kk': [None, 2], 'y': ['n', 'b']}))

    inner = sorted(
        (r['k'], r['x'], r['y'])
        for r in hash_bucket_join(left, right, 'k', 'kk', num_buckets=4).take_all()
    )
    assert inner == [(2, 20, 'b')]

    left_rows = sorted(
        (r['x'], r['y'])
        for r in hash_bucket_join(
            left, right, 'k', 'kk', num_buckets=4, how='left',
        ).take_all()
    )
    assert left_rows == [(10, None), (11, None), (20, 'b')]


@pytest.mark.usefixtures('ray_session')
def test_right_join():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1, 2], 'x': [10, 20]}))
    right = rd.from_arrow(pa.table({'kk': [2, 3, None], 'y': ['b', 'c', 'n']}))
    rows = sorted(
        [
            (r['k'], r['x'], r['y'])
            for r in hash_bucket_join(
                left, right, 'k', 'kk', num_buckets=4, how='right',
            ).take_all()
        ],
        key=repr,
    )
    # Unmatched right rows keep their key in the left_on column (USING
    # semantics); null-key right rows survive unmatched.
    assert rows == sorted([(2, 20, 'b'), (3, None, 'c'), (None, None, 'n')], key=repr)


@pytest.mark.usefixtures('ray_session')
def test_semi_and_anti_join():
    """EXISTS / NOT EXISTS semantics: left columns only, no duplication
    from multiple right matches; null left keys match nothing (dropped by
    semi, kept by anti)."""
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        'k': [1, 2, 2, 3, None], 'x': [10, 20, 21, 30, 40],
    }))
    right = rd.from_arrow(pa.table({
        'kk': [2, 2, 5, None], 'y': ['b', 'b2', 'e', 'n'],
    }))

    semi = sorted(
        (r['k'], r['x'])
        for r in hash_bucket_join(
            left, right, 'k', 'kk', num_buckets=4, how='semi',
        ).take_all()
    )
    assert semi == [(2, 20), (2, 21)]

    anti = sorted(
        [
            (r['k'], r['x'])
            for r in hash_bucket_join(
                left, right, 'k', 'kk', num_buckets=4, how='anti',
            ).take_all()
        ],
        key=repr,
    )
    assert anti == sorted([(1, 10), (3, 30), (None, 40)], key=repr)

    j = hash_bucket_join(left, right, 'k', 'kk', num_buckets=4, how='semi')
    assert set(j.schema().names) == {'k', 'x'}


@pytest.mark.usefixtures('ray_session')
def test_semi_anti_match_pandas_randomized():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.RandomState(123)
    left = pd.DataFrame({
        'k': rng.randint(0, 50, size=400),
        'x': rng.randint(0, 1000, size=400),
    })
    right = pd.DataFrame({'kk': rng.randint(0, 50, size=60)})
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    rkeys = set(right['kk'])

    for how, expect_mask in (
        ('semi', left['k'].isin(rkeys)),
        ('anti', ~left['k'].isin(rkeys)),
    ):
        got = sorted(
            (r['k'], r['x'])
            for r in hash_bucket_join(
                lds, rds, 'k', 'kk', num_buckets=8, how=how,
            ).take_all()
        )
        exp = sorted(zip(left[expect_mask]['k'], left[expect_mask]['x']))
        assert got == exp, how


@pytest.mark.usefixtures('ray_session')
def test_outer_join():
    import ray.data as rd

    left = rd.from_arrow(pa.table({'k': [1, 2, None], 'x': [10, 20, 30]}))
    right = rd.from_arrow(pa.table({'kk': [2, 3], 'y': ['b', 'c']}))
    rows = sorted(
        [
            (r['k'], r['x'], r['y'])
            for r in hash_bucket_join(
                left, right, 'k', 'kk', num_buckets=4, how='outer',
            ).take_all()
        ],
        key=repr,
    )
    assert rows == sorted(
        [(1, 10, None), (2, 20, 'b'), (3, None, 'c'), (None, 30, None)],
        key=repr,
    )
