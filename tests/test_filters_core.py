"""Unit tests for the scalar filter library's core semantics.

Coverage modeled on the reference suite (SURVEY.md §5; reference
test/complex_test.py, test/handlers_test.py, test/macros_test.py) but
written against our own harness.
"""

from __future__ import annotations

import decimal
from collections import OrderedDict
from datetime import date, datetime

from dateutil.tz import tzutc

import filters_ray as f
from filters_ray.functions.testing import BaseFilterTestCase

D = decimal.Decimal


class ChainShortCircuitTest(BaseFilterTestCase):
    """First error wins: later filters never see the value
    (reference test/complex_test.py:46-59)."""

    filter_type = lambda self: f.MaxLength(3) | f.MinLength(8) | f.Required  # noqa: E731

    def test_short_circuit_reports_only_first_code(self):
        self.assertFilterErrors(self._filter('foobar'), ['too_long'])

    def test_passing_chain(self):
        runner = f.FilterRunner(f.Int | f.Max(3), '1')
        assert runner.is_valid()
        assert runner.cleaned_data == 1

    def test_chain_still_runs_on_none(self):
        # None flows through the whole chain; only Required rejects it.
        runner = f.FilterRunner(f.MaxLength(3) | f.MinLength(8) | f.Required, None)
        assert runner.error_codes == {'': ['empty']}


class NonePassThroughTest(BaseFilterTestCase):
    filter_type = f.Int

    def test_none_passes_everything_except_required(self):
        for spec in [f.Int, f.Unicode, f.MaxLength(1), f.Choice(choices={'x'}),
                     f.Regex(r'x'), f.Datetime, f.Empty, f.NotEmpty]:
            runner = f.FilterRunner(spec, None)
            assert runner.is_valid(), spec
            assert runner.cleaned_data is None

    def test_required_rejects_none(self):
        self.assertFilterErrors(f.FilterRunner(f.Required, None), ['empty'])

    def test_optional_replaces_none(self):
        runner = f.FilterRunner(f.Optional(default=42), None)
        assert runner.cleaned_data == 42


class RepeaterIsolationTest(BaseFilterTestCase):
    """A failed element becomes None in place; siblings still processed
    (reference test/complex_test.py:84-104)."""

    filter_type = lambda self: f.FilterRepeater(f.NotEmpty | f.Int)  # noqa: E731

    def test_error_isolation(self):
        runner = self._filter([4, 'NaN', 3.14, 'FOO', ''])
        assert runner.cleaned_data == [4, None, None, None, None]
        assert runner.error_codes == {
            '1': ['not_finite'],
            '2': ['not_int'],
            '3': ['not_numeric'],
            '4': ['empty'],
        }

    def test_nested_repeater_keys(self):
        chain = f.FilterRepeater(f.FilterRepeater(f.Int))
        runner = f.FilterRunner(chain, [['1', 'x'], ['2']])
        assert runner.cleaned_data == [[1, None], [2]]
        assert runner.error_codes == {'0.1': ['not_numeric']}


class MapperMatrixTest(BaseFilterTestCase):
    """Missing/extra-key matrix (reference test/complex_test.py:523-776,
    docs/complex_filters.rst:229-261)."""

    filter_type = lambda self: f.FilterMapper(  # noqa: E731
        {
            'id': f.Required | f.Int,
            'subject': f.Unicode | f.NotEmpty | f.MaxLength(16),
        },
        allow_missing_keys=False,
        allow_extra_keys=False,
    )

    def test_missing_and_extra(self):
        runner = self._filter({'id': -1, 'attachment': 'virus.exe'})
        assert runner.error_codes == {
            'attachment': ['unexpected'],
            'subject': ['missing'],
        }
        assert runner.cleaned_data == {'id': -1, 'subject': None}

    def test_extra_keys_sorted_last(self):
        mapper = f.FilterMapper({'id': f.Int})
        runner = f.FilterRunner(mapper, {'z': 1, 'id': '5', 'a': 2})
        assert list(runner.cleaned_data.keys()) == ['id', 'a', 'z']
        assert runner.cleaned_data == {'id': 5, 'a': 2, 'z': 1}

    def test_missing_key_filtered_as_none(self):
        mapper = f.FilterMapper({'id': f.Int, 'name': f.Unicode})
        runner = f.FilterRunner(mapper, {'id': '1'})
        assert runner.is_valid()
        assert runner.cleaned_data == {'id': 1, 'name': None}

    def test_dotted_error_keys_in_nested_structures(self):
        mapper = f.FilterMapper({
            'data': f.FilterMapper({
                'street': f.FilterRepeater(f.Unicode | f.NotEmpty),
            }),
        })
        runner = f.FilterRunner(mapper, {'data': {'street': ['a', '']}})
        assert runner.error_codes == {'data.street.1': ['empty']}


class HandlerProtocolTest(BaseFilterTestCase):
    filter_type = f.Int

    def test_default_handler_raises_filter_error(self):
        try:
            (f.Int | f.Max(3)).apply('4')
        except f.FilterError as err:
            assert err.context['code'] == 'too_big'
        else:
            raise AssertionError('expected FilterError')

    def test_memory_handler_accumulates(self):
        handler = f.MemoryHandler()
        chain = (f.Int | f.Max(3)).set_handler(handler)
        assert chain.apply('9') is None
        assert list(handler.messages) == ['']
        assert handler.messages[''][0].code == 'too_big'

    def test_runner_error_shape(self):
        runner = f.FilterRunner(f.Int, 'NaN')
        errs = runner.errors
        assert set(errs) == {''}
        assert errs[''][0]['code'] == 'not_finite'
        assert 'message' in errs[''][0]

    def test_exceptions_surface_as_exception_code(self):
        class Boom(f.BaseFilter):
            def _apply(self, value):
                raise RuntimeError('kaboom')

        runner = f.FilterRunner(Boom(), 'x', capture_exc_info=True)
        assert runner.error_codes == {'': ['exception']}
        assert runner.has_exceptions
        assert len(runner.exc_info) == 1


class MacroTest(BaseFilterTestCase):
    filter_type = f.NoOp

    def test_chain_macro(self):
        @f.filter_macro
        def MyString():
            return f.Unicode | f.Strip | f.NotEmpty

        assert issubclass(MyString, f.FilterMacroType)
        runner = f.FilterRunner(MyString | f.MaxLength(3), '  ab ')
        assert runner.cleaned_data == 'ab'

    def test_partial_macro(self):
        Minor = f.filter_macro(f.Max, max_value=18)
        assert Minor().apply(17) == 17
        runner = f.FilterRunner(Minor, 19)
        assert runner.error_codes == {'': ['too_big']}

    def test_partial_macro_override(self):
        Minor = f.filter_macro(f.Max, max_value=18)
        assert Minor(exclusive=False).apply(18) == 18


class TypeGateTest(BaseFilterTestCase):
    filter_type = f.Type

    def test_exact_type(self):
        self.assertFilterErrors(self._filter(True, int, allow_subclass=False),
                                ['wrong_type'])
        self.assertFilterPasses(self._filter(1, int, allow_subclass=False))

    def test_subclass_ok_by_default(self):
        self.assertFilterPasses(self._filter(True, int))


class ExtensionRegistryTest(BaseFilterTestCase):
    filter_type = f.NoOp

    def test_programmatic_registration(self):
        registry = f.FilterExtensionRegistry()

        class Upper(f.BaseFilter):
            def _apply(self, value):
                return value.upper()

        registry.register('Upper', Upper)
        assert registry.Upper is Upper
        assert registry.Upper().apply('abc') == 'ABC'

    def test_unknown_attribute(self):
        registry = f.FilterExtensionRegistry()
        try:
            registry.Nope
        except AttributeError:
            pass
        else:
            raise AssertionError('expected AttributeError')


class ValueSemanticsTest(BaseFilterTestCase):
    filter_type = f.NoOp

    def test_datetime_tz_conversion(self):
        out = f.Datetime().apply('2015-05-11T14:56:58-05:00')
        assert out == datetime(2015, 5, 11, 19, 56, 58, tzinfo=tzutc())

    def test_date_passthrough(self):
        d = date(2015, 5, 11)
        assert f.Date().apply(d) is d

    def test_round_quarter(self):
        assert f.Round(to_nearest='0.25').apply('1') == D('1.00')

    def test_unicode_normalization(self):
        u = f.Unicode()
        assert u.apply(b'\xe2\x99\xaa') == '♪'
        assert u.apply('a\r\nb\rc') == 'a\nb\nc'
        # NFD é → NFC é
        assert u.apply('é') == '\xe9'

    def test_bytestring_preserves_bytes(self):
        bs = f.ByteString(normalize=False)
        assert bs.apply('a\r\nb') == b'a\r\nb'

    def test_maxbytes_multibyte_truncation(self):
        runner = f.FilterRunner(f.MaxBytes(5), 'дом')  # 2 bytes per char
        assert runner.error_codes == {'': ['too_long']}
        # Replacement: 4 bytes — never splits a multibyte sequence.
        assert runner.cleaned_data == 'до'.encode('utf-8')

    def test_split_keys_padding(self):
        out = f.Split(r':', keys=('a', 'b', 'c')).apply('x:y')
        assert out == OrderedDict([('a', 'x'), ('b', 'y'), ('c', None)])

    def test_base64_unpadded(self):
        assert f.Base64Decode().apply(b'aGVsbG8') == b'hello'

    def test_int_large_values(self):
        # Exact up to the decimal context precision (28 digits), matching
        # the reference (beyond that, both report code 'exception').
        big = 10 ** 20 + 1
        assert f.Int().apply(str(big)) == big
