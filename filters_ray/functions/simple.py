"""Simple filters: arrays, choices, dates, emptiness and length checks.

Clean-room port of the semantics in SURVEY.md §2.2
(reference: /root/reference/filters/simple.py). Invariants:

* ``None`` passes every filter unmodified except ``Required`` /
  ``NotEmpty(allow_none=False)``; ``Optional`` substitutes its default.
* "Empty" means ``len(value) == 0``; objects without ``__len__`` (incl.
  ``0`` and ``False``) are NOT empty.
* ``Datetime`` always converts to UTC; ``naive=True`` strips tzinfo *after*
  conversion. ``Date`` passes plain ``date`` objects through untouched.
* ``MaxLength``/``MinLength`` never truncate/pad — invalid becomes ``None``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence, Sized
from datetime import date, datetime, time, tzinfo
from typing import Any, Optional as TOptional, Union

from dateutil.parser import parse as _parse_datetime
from dateutil.tz import tzoffset, tzutc

from .base import BaseFilter, Type
from .number import Int, Max, Min

__all__ = [
    'Array',
    'ByteArray',
    'Choice',
    'Date',
    'Datetime',
    'Empty',
    'Length',
    'MaxLength',
    'MinLength',
    'NoOp',
    'NotEmpty',
    'Optional',
    'Required',
]

UTC = tzutc()


def _length_or_one(value: Any) -> int:
    """len(value), treating length-less objects as non-empty."""
    try:
        return len(value)
    except TypeError:
        return 1


class Array(Type):
    """Require a non-string sequence (str/bytes explicitly rejected)."""

    def __init__(self, aliases=None) -> None:
        super().__init__(Sequence, True, aliases)

    def _apply(self, value: Any) -> Any:
        value = super()._apply(value)
        if self._has_errors:
            return None
        if isinstance(value, (bytes, str)):
            return self._invalid_value(
                value=value,
                reason=self.CODE_WRONG_TYPE,
                template_vars={
                    'incoming': self.get_type_name(type(value)),
                    'allowed': self.get_allowed_type_names(),
                },
            )
        return value


class ByteArray(BaseFilter):
    """Convert bytes / str / iterable-of-ints(0..255) into a bytearray."""

    CODE_BAD_ENCODING = 'bad_encoding'

    templates = {
        CODE_BAD_ENCODING: 'Unable to encode this value using {encoding}.',
    }

    def __init__(self, encoding: str = 'utf-8') -> None:
        super().__init__()
        self.encoding = encoding

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(Iterable))
        if self._has_errors:
            return None

        if isinstance(value, bytearray):
            return value
        if isinstance(value, bytes):
            return bytearray(value)
        if isinstance(value, str):
            try:
                return bytearray(value, encoding=self.encoding)
            except UnicodeEncodeError:
                return self._invalid_value(
                    value=value,
                    reason=self.CODE_BAD_ENCODING,
                    template_vars={'encoding': self.encoding},
                )

        # Iterable of byte values: validate each element 0..255 with
        # per-element error isolation (reference simple.py:110-120).
        from .complex import FilterRepeater

        elements = self._filter(
            value,
            FilterRepeater(Type(int) | Int | Min(0) | Max(255)),
        )
        if self._has_errors:
            return None
        return bytearray(elements)


class Choice(BaseFilter):
    """Set membership (case-sensitive); code ``not_valid_choice``."""

    CODE_INVALID = 'not_valid_choice'

    templates = {
        CODE_INVALID: 'Valid options are: {choices}',
    }

    def __init__(self, choices: Iterable) -> None:
        super().__init__()
        self.choices = set(choices)

    def __str__(self) -> str:
        import json
        return f'{type(self).__name__}({json.dumps(sorted(self.choices))})'

    def _apply(self, value: Any) -> Any:
        if value not in self.choices:
            return self._invalid_value(
                value=value,
                reason=self.CODE_INVALID,
                exc_info=True,
                template_vars={'choices': sorted(self.choices)},
            )
        return value


class Datetime(BaseFilter):
    """Parse the value into a (by default tz-aware) UTC datetime."""

    CODE_INVALID = 'not_datetime'

    templates = {
        CODE_INVALID: 'This value does not appear to be a datetime.',
    }

    def __init__(
        self,
        timezone: TOptional[Union[tzinfo, int, float]] = None,
        naive: bool = False,
    ) -> None:
        """``timezone`` applies only to naive inputs (int/float = UTC offset
        in hours); the result is always converted to UTC. ``naive=True``
        strips tzinfo from the (already UTC) result."""
        super().__init__()

        if not isinstance(timezone, tzinfo):
            if timezone in (0, None):
                timezone = UTC
            else:
                timezone = tzoffset(
                    name=f'UTC{timezone:+}',
                    offset=float(timezone) * 3600.0,
                )

        self.timezone = timezone
        self.naive = naive

    def __str__(self) -> str:
        return (
            f'{type(self).__name__}(timezone={self.timezone!r}, '
            f'naive={self.naive!r})'
        )

    def _apply(self, value: Any) -> Any:
        if isinstance(value, datetime):
            parsed = value
        elif isinstance(value, date):
            parsed = datetime.combine(value, time.min)
        else:
            try:
                parsed = _parse_datetime(value)
            except ValueError:
                return self._invalid_value(
                    value=value, reason=self.CODE_INVALID, exc_info=True,
                )

        if parsed.tzinfo is None:
            parsed = parsed.replace(tzinfo=self.timezone)

        in_utc = parsed.astimezone(UTC)
        return in_utc.replace(tzinfo=None) if self.naive else in_utc


class Date(Datetime):
    """Like ``Datetime`` but yields a ``date`` (plain dates pass untouched)."""

    CODE_INVALID = 'not_date'

    templates = {
        CODE_INVALID: 'This value does not appear to be a date.',
    }

    def _apply(self, value: Any) -> Any:
        if isinstance(value, date) and not isinstance(value, datetime):
            return value
        filtered = super()._apply(value)
        return filtered if self._has_errors else filtered.date()


class Empty(BaseFilter):
    """Require zero length (length-less values, incl. 0/False, are NOT empty)."""

    CODE_NOT_EMPTY = 'not_empty'

    templates = {
        CODE_NOT_EMPTY: 'Empty value expected.',
    }

    def _apply(self, value: Any) -> Any:
        if _length_or_one(value):
            return self._invalid_value(value, self.CODE_NOT_EMPTY)
        return value


class Length(BaseFilter):
    """Require exactly the configured length."""

    CODE_TOO_LONG = 'too_long'
    CODE_TOO_SHORT = 'too_short'

    templates = {
        CODE_TOO_LONG: 'Value is too long (length must be exactly {expected}).',
        CODE_TOO_SHORT: 'Value is too short (length must be exactly {expected}).',
    }

    def __init__(self, length: int) -> None:
        super().__init__()
        self.length = length

    def __str__(self) -> str:
        return f'{type(self).__name__}(length={self.length!r})'

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(Sized))
        if self._has_errors:
            return None
        actual = len(value)
        if actual > self.length:
            return self._invalid_value(
                value=value, reason=self.CODE_TOO_LONG,
                template_vars={'expected': self.length},
            )
        if actual < self.length:
            return self._invalid_value(
                value=value, reason=self.CODE_TOO_SHORT,
                template_vars={'expected': self.length},
            )
        return value


class MaxLength(BaseFilter):
    """Enforce a maximum length (does NOT truncate)."""

    CODE_TOO_LONG = 'too_long'

    templates = {
        CODE_TOO_LONG: 'Value is too long (length must be < {max}).',
    }

    def __init__(self, max_length: int) -> None:
        super().__init__()
        self.max_length = max_length

    def __str__(self) -> str:
        return f'{type(self).__name__}({self.max_length!r})'

    def _apply(self, value: Any) -> Any:
        if len(value) > self.max_length:
            return self._invalid_value(
                value=value, reason=self.CODE_TOO_LONG,
                template_vars={'length': len(value), 'max': self.max_length},
            )
        return value


class MinLength(BaseFilter):
    """Enforce a minimum length (does NOT pad)."""

    CODE_TOO_SHORT = 'too_short'

    templates = {
        CODE_TOO_SHORT: 'Value is too short (length must be > {min}).',
    }

    def __init__(self, min_length: int) -> None:
        super().__init__()
        self.min_length = min_length

    def __str__(self) -> str:
        return f'{type(self).__name__}({self.min_length!r})'

    def _apply(self, value: Any) -> Any:
        if len(value) < self.min_length:
            return self._invalid_value(
                value=value, reason=self.CODE_TOO_SHORT,
                template_vars={'length': len(value), 'min': self.min_length},
            )
        return value


class NoOp(BaseFilter):
    """Identity placeholder."""

    def _apply(self, value: Any) -> Any:
        return value


class NotEmpty(BaseFilter):
    """Require non-zero length; ``None`` passes unless ``allow_none=False``."""

    CODE_EMPTY = 'empty'

    templates = {
        CODE_EMPTY: 'Non-empty value expected.',
    }

    def __init__(self, allow_none: bool = True) -> None:
        super().__init__()
        self.allow_none = allow_none

    def __str__(self) -> str:
        return f'{type(self).__name__}(allow_none={self.allow_none!r})'

    def _apply(self, value: Any) -> Any:
        if _length_or_one(value):
            return value
        return self._invalid_value(value, self.CODE_EMPTY)

    def _apply_none(self) -> Any:
        if not self.allow_none:
            return self._invalid_value(None, self.CODE_EMPTY)
        return None


class Required(NotEmpty):
    """``NotEmpty`` with ``allow_none`` pinned False — the only filter that
    rejects ``None`` by default."""

    templates = {
        NotEmpty.CODE_EMPTY: 'This value is required.',
    }

    def __init__(self) -> None:
        super().__init__(allow_none=False)


class Optional(BaseFilter):
    """Replace ``None`` / empty values with a default."""

    def __init__(self, default: Any = None) -> None:
        super().__init__()
        self.default = default

    def __str__(self) -> str:
        return f'{type(self).__name__}(default={self.default!r})'

    def _apply(self, value: Any) -> Any:
        return value if _length_or_one(value) > 0 else self.default

    def _apply_none(self) -> Any:
        return self.default
