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
