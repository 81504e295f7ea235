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


@pytest.mark.usefixtures('ray_session')
def test_overflow_oracled_queries_match_oracle():
    """The oracled entries past the driver's 50-entry cap (VERDICT r4
    #5 / ADVICE r4): the driver never hash-checks them, so CI must —
    this runs the full check_queries value-frame compare (rows, dtypes,
    sorted-column values vs DuckDB) on exactly the overflow set at
    sf0.01 every test run, not just when a judge remembers to."""
    import importlib.util

    from filters_ray.pipelines.queries import QUERIES

    names = list(QUERIES)
    overflow = [n for n in names[50:] if QUERIES[n][1] is not None]
    assert overflow, 'no overflow oracled entries — retire this test'

    spec = importlib.util.spec_from_file_location(
        'check_queries', '/root/repo/tools/check_queries.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    failures = mod.run_checks('/root/testdata/sf0.01', only=overflow)
    assert failures == []


def test_int_lookup_duplicate_keys_keep_last():
    """Duplicate build keys resolve keep-LAST in BOTH representations
    (ADVICE r4: the hashed path used to raise InvalidIndexError from
    deep inside pandas while the dense path silently kept-last)."""
    import numpy as np

    from filters_ray.pipelines.queries import _IntLookup

    dense = _IntLookup(np.array([2, 7, 2]), np.array([10, 20, 30]))
    assert dense.is_dense
    assert dense.take(np.array([2, 7])).tolist() == [30, 20]

    sparse = _IntLookup(np.array([2, 10**12, 2], dtype=np.int64),
                        np.array([10, 20, 30], dtype=np.int64))
    assert not sparse.is_dense
    assert sparse.take(
        np.array([2, 10**12, 5], dtype=np.int64),
    ).tolist() == [30, 20, -1]
