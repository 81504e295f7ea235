"""Conformance-test harness (port of the reference's public test API).

Clean-room port of ``BaseFilterTestCase``
(reference: /root/reference/filters/test.py:41-202): set ``filter_type``,
then use ``assertFilterPasses`` / ``assertFilterErrors``. Assertions are
on error codes keyed by dotted path, not messages.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from collections.abc import Mapping, Sequence
from pprint import pformat
from traceback import format_exception
from typing import Any
from unittest import TestCase

from .handlers import FilterRunner

__all__ = ['BaseFilterTestCase']


def sorted_dict(value: Any) -> Any:
    """Recursively sort mapping keys for stable comparison output."""
    if isinstance(value, Mapping):
        return OrderedDict(
            (key, sorted_dict(value[key])) for key in sorted(value.keys())
        )
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        return [sorted_dict(v) for v in value]
    return value


class BaseFilterTestCase(TestCase):
    """Set ``filter_type`` and assert on pass/fail cases by error code."""

    filter_type = None

    class unmodified:
        """Sentinel: expect the incoming value back unchanged."""

    class skip_value_check:
        """Sentinel: only check error codes, not the filtered value."""

    def assertFilterPasses(self, runner, expected_value=unmodified):
        """Assert no errors; optionally check the cleaned value."""
        self.assertFilterErrors(runner, {}, expected_value)

    def assertFilterErrors(self, runner, expected_codes, expected_value=None):
        """Assert the runner produced exactly ``expected_codes``.

        ``expected_codes`` may be a list (shorthand for ``{'': [...]}``) or
        a dict of dotted key → code list.
        """
        if not isinstance(runner, FilterRunner):
            runner = self._filter(runner)

        if runner.has_exceptions:
            self.fail(
                'Unhandled exceptions occurred while filtering:\n\n'
                '{tracebacks}\n\nFilter Messages:\n\n{messages}'.format(
                    messages=pformat(dict(runner.filter_messages)),
                    tracebacks=pformat([
                        format_exception(*ei) for ei in runner.exc_info
                    ]),
                )
            )

        if isinstance(expected_codes, list):
            expected_codes = {'': expected_codes}

        if runner.error_codes != expected_codes:
            self.fail(
                'Filter generated unexpected error codes (expected '
                '{expected}):\n\n{messages}'.format(
                    expected=json.dumps(sorted_dict(expected_codes)),
                    messages=pformat(dict(runner.filter_messages)),
                ),
            )

        check_value = (
            (self.skip_value_check is not True)
            and (expected_value is not self.skip_value_check)
        )
        if check_value:
            self._check_filter_value(
                runner.cleaned_data,
                runner.data if expected_value is self.unmodified else expected_value,
            )

    def _filter(self, *args, **kwargs) -> FilterRunner:
        """Apply ``filter_type(*args[1:], **kwargs)`` to ``args[0]``."""
        if not callable(self.filter_type):
            self.fail(f'{type(self).__name__}.filter_type is not callable.')
        if not args:
            self.fail(
                f'First argument to {type(self).__name__}._filter '
                f'must be the filtered value.'
            )
        return FilterRunner(
            starting_filter=self.filter_type(*args[1:], **kwargs),
            incoming_data=args[0],
            capture_exc_info=True,
        )

    def _check_filter_value(self, cleaned_data, expected):
        self.assertEqual(cleaned_data, expected)
