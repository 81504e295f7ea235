"""Engine custom filters: First, Lookup, content rules (extension surface)."""

from __future__ import annotations

import pyarrow as pa

import filters_ray as f
from filters_ray.functions.engine_filters import (
    ContentRequiredUnlessDelete,
    First,
    Lookup,
)
from filters_ray.vector import compile_chain


def test_first_scalar():
    assert First().apply(['a', 'b']) == 'a'
    runner = f.FilterRunner(First(), [])
    assert runner.error_codes == {'': ['empty']}


def test_first_vector_parity():
    compiled = compile_chain(f.Regex(r'^[a-f0-9]{3}$') | First())
    out, errors = compiled.apply_column(pa.array(['abc', 'xyz', None, 'def']))
    assert out.to_pylist() == ['abc', None, None, 'def']
    assert errors.codes_per_row() == [[], [('', 'malformed')], [], []]


def test_lookup_scalar():
    lk = Lookup({1: 'one', 2: 'two'})
    assert lk.apply(1) == 'one'
    runner = f.FilterRunner(lk, 3)
    assert runner.error_codes == {'': ['not_found']}
    assert Lookup({1: 'one'}, default='?').apply(9) == '?'
    assert lk.apply(None) is None  # None passes (universal rule)


def test_lookup_vector():
    lk = Lookup({1: 'one', 2: 'two'})
    out, errors = compile_chain(lk).apply_column(pa.array([1, 3, None, 2]))
    assert out.to_pylist() == ['one', None, None, 'two']
    assert errors.codes_per_row() == [[], [('', 'not_found')], [], []]

    with_default = Lookup({1: 'one'}, default='?')
    out2, errors2 = compile_chain(with_default).apply_column(pa.array([1, 5]))
    assert out2.to_pylist() == ['one', '?']
    assert errors2.codes_per_row() == [[], []]


def test_content_required_scalar_matches_rule():
    flt = ContentRequiredUnlessDelete()
    runner = f.FilterRunner(flt, {'op': 'update', 'content': None})
    assert runner.error_codes == {'content': ['empty']}
    runner2 = f.FilterRunner(flt, {'op': 'delete', 'content': None})
    assert runner2.is_valid()
