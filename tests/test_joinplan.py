"""Broadcast map-side join + auto_join planner (stages/joinplan.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from filters_ray.stages.joinplan import auto_join, broadcast_join


def _fixtures():
    rng = np.random.default_rng(11)
    left = pa.table({
        'k': pa.array([1, 2, 2, 3, None, 7], type=pa.int64()),
        'v': pa.array([10, 20, 21, 30, 40, 70], type=pa.int64()),
    })
    right = pa.table({
        'k': pa.array([1, 2, 5, None], type=pa.int64()),
        'tag': pa.array(['a', 'b', 'e', 'n'], type=pa.string()),
    })
    return left, right


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize('how', ['inner', 'left', 'semi', 'anti'])
def test_broadcast_equals_shuffle_join(ray_session, how):
    import ray.data as rd

    from filters_ray.stages.cogroup import hash_bucket_join

    left, right = _fixtures()
    b = broadcast_join(rd.from_arrow(left), right, 'k', 'k', how=how) \
        .to_pandas()
    s = hash_bucket_join(rd.from_arrow(left), rd.from_arrow(right),
                         left_on='k', right_on='k', how=how).to_pandas()
    assert _normalize(b).equals(_normalize(s)), how


def test_broadcast_left_join_preserves_int_types(ray_session):
    """ADVICE r3: unmatched left rows in a broadcast 'left' join must
    null-pad int right columns at int64 — not float64 — and every block
    must carry the SAME schema (the pandas NaN-promotion leak made
    matched-only and mixed batches disagree within one Dataset)."""
    import ray.data as rd

    left, _ = _fixtures()
    right = pa.table({
        'k': pa.array([1, 2], type=pa.int64()),
        'rv': pa.array([100, 200], type=pa.int64()),
    })
    # Several single-row blocks: some all-matched, some all-unmatched.
    ds = rd.from_arrow(left).repartition(6)
    out = broadcast_join(ds, right, 'k', 'k', how='left')
    blocks = [b for b in out.iter_batches(batch_format='pyarrow')
              if b.num_rows]
    schemas = {b.schema for b in blocks}
    assert len(schemas) == 1, schemas
    merged = pa.concat_tables(blocks)
    assert merged.schema.field('rv').type == pa.int64()
    assert merged.num_rows == 6
    matched = merged.filter(pa.compute.is_valid(merged.column('rv')))
    assert sorted(matched.column('rv').to_pylist()) == [100, 200, 200]


def test_broadcast_rejects_outer_modes(ray_session):
    import ray.data as rd

    left, right = _fixtures()
    with pytest.raises(ValueError, match='broadcast_join supports'):
        broadcast_join(rd.from_arrow(left), right, 'k', 'k', how='outer')


def test_auto_join_picks_broadcast_for_small_right(ray_session,
                                                   monkeypatch):
    import ray.data as rd

    import filters_ray.stages.cogroup as cg

    def boom(*a, **k):
        raise AssertionError('shuffle join should not run')

    monkeypatch.setattr(cg, 'hash_bucket_join', boom)
    left, right = _fixtures()
    out = auto_join(rd.from_arrow(left), rd.from_arrow(right),
                    'k', 'k', how='inner').to_pandas()
    assert len(out) == 3  # keys 1, 2, 2


def test_auto_join_falls_back_to_shuffle(ray_session):
    import ray.data as rd

    left, right = _fixtures()
    # Zero byte budget ⇒ shuffle path; results identical.
    out = auto_join(rd.from_arrow(left), rd.from_arrow(right),
                    'k', 'k', how='inner',
                    broadcast_limit_bytes=0).to_pandas()
    assert len(out) == 3
    # Outer mode must shuffle regardless of size.
    outer = auto_join(rd.from_arrow(left), rd.from_arrow(right),
                      'k', 'k', how='outer').to_pandas()
    assert len(outer) == 8  # 3 matches + 3 left-only + 2 right-only
