"""Smoke every `queries()` entry at sf0.001 — the driver-facing surface
must never raise, regardless of oracle coverage."""

from __future__ import annotations

import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, '/root/repo')

SF_DIR = '/root/testdata/sf0.001'


def _names():
    from filters_ray.pipelines.queries import QUERIES
    return sorted(QUERIES)


@pytest.mark.usefixtures('ray_session')
@pytest.mark.parametrize('name', _names())
def test_query_executes(name):
    from filters_ray.pipelines.queries import QUERIES

    fn, _sql = QUERIES[name]
    result = fn(SF_DIR)
    if isinstance(result, pd.DataFrame):
        n = len(result)
    elif isinstance(result, pa.Table):
        n = result.num_rows
    else:
        n = result.count()
    assert n >= 0


@pytest.mark.usefixtures('ray_session')
def test_seeded_sample_deterministic():
    """lineitem_seeded_sample has no SQL oracle (RNG not shared with
    DuckDB) — its internal oracle is determinism: same seed, same rows."""
    from filters_ray.pipelines.queries import lineitem_seeded_sample

    a = lineitem_seeded_sample(SF_DIR).to_pandas().sort_values('l_returnflag')
    b = lineitem_seeded_sample(SF_DIR).to_pandas().sort_values('l_returnflag')
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert a['n'].sum() > 0


def test_first_50_entries_are_all_oracled():
    """Driver-cap ordering contract (VERDICT r3 #3): the graft driver
    hash-checks only the first 50 QUERIES entries, so every one of them
    must carry an oracle SQL — adding a rows-only demo above the cap
    would silently hide an oracled query from CORRECTNESS reporting."""
    from filters_ray.pipelines.queries import QUERIES

    names = list(QUERIES)
    unoracled = [n for n in names[:50] if QUERIES[n][1] is None]
    assert unoracled == []
    # And the flagship CDC entries lead the file.
    assert names[0] == 'events_cdc_upsert'


def test_int_lookup_gate_sparse_domain():
    """Size gate for broadcast LUTs (VERDICT r3 #6): a sparse
    huge-domain key set must route to the hashed representation and
    return identical lookups to the dense path."""
    import numpy as np

    from filters_ray.pipelines.queries import _IntLookup

    sparse = _IntLookup(np.array([5, 10**12, 3], dtype=np.int64),
                        np.array([50, 7, 30], dtype=np.int64))
    assert not sparse.is_dense
    assert sparse.take(
        np.array([3, 5, 10**12, 99, -1], dtype=np.int64),
    ).tolist() == [30, 50, 7, -1, -1]

    dense = _IntLookup(np.array([1, 4]), np.array([9, 8]))
    assert dense.is_dense
    assert dense.take(
        np.array([0, 1, 4, 5, -3], dtype=np.int64),
    ).tolist() == [-1, 9, 8, -1, -1]
