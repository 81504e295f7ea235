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
        hash_bucket_join(ds, ds, 'k', 'k', how='outer')
