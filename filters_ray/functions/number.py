"""Numeric filters: Decimal, Int, Max, Min, Round.

Clean-room port of the semantics in SURVEY.md §2.4
(reference: /root/reference/filters/number.py). Invariants:

* ``Decimal`` rejects non-finite values (NaN/±Inf) with code ``not_finite``
  and anything unparseable with ``not_numeric``; ``max_precision`` quantizes.
* ``Int`` goes through ``Decimal`` and rejects non-integral values with
  ``not_int`` (arbitrary precision preserved).
* ``Max``/``Min`` replace out-of-range values with ``None`` (never clamp);
  codes ``too_big`` / ``too_small``.
* ``Round`` scale-quantize-unscales with ``ROUND_HALF_UP`` by default.
"""

from __future__ import annotations

from decimal import Decimal as D, InvalidOperation, ROUND_HALF_UP
from typing import Any, Optional, Union

from .base import BaseFilter, Type

__all__ = ['Decimal', 'Int', 'Max', 'Min', 'Round']


class Decimal(BaseFilter):
    """Interpret the value as a finite :class:`decimal.Decimal`."""

    CODE_INVALID = 'not_numeric'
    CODE_NON_FINITE = 'not_finite'

    templates = {
        CODE_INVALID: 'Numeric value expected.',
        CODE_NON_FINITE: 'Numeric value expected.',
    }

    def __init__(
        self,
        max_precision: Optional[Union[int, D]] = None,
        allow_tuples: bool = True,
    ) -> None:
        super().__init__()
        if max_precision is not None and not isinstance(max_precision, D):
            # e.g. 3 -> Decimal('0.001')
            max_precision = D('.1') ** max_precision
        self.max_precision = max_precision
        self.allow_tuples = allow_tuples

    def __str__(self) -> str:
        return f'{type(self).__name__}(max_precision={self.max_precision!r})'

    def _apply(self, value: Any) -> Any:
        allowed: tuple = (str, int, float, D)
        if self.allow_tuples:
            allowed += (list, tuple)

        value = self._filter(value, Type(allowed))
        if self._has_errors:
            return value

        try:
            result = D(value)
        except (InvalidOperation, TypeError, ValueError):
            return self._invalid_value(value, self.CODE_INVALID, exc_info=True)

        # Decimal's parser accepts 'NaN', '+Inf', etc. — not valid here.
        if not result.is_finite():
            return self._invalid_value(value, self.CODE_NON_FINITE, exc_info=True)

        if self.max_precision is not None:
            result = result.quantize(self.max_precision)

        return result


class Int(BaseFilter):
    """Interpret the value as an int; floats with fraction are invalid."""

    CODE_DECIMAL = 'not_int'

    templates = {
        CODE_DECIMAL: 'Integer value expected.',
    }

    def _apply(self, value: Any) -> Any:
        as_decimal = self._filter(value, Decimal)
        if self._has_errors:
            return None
        if as_decimal % 1:
            return self._invalid_value(value, self.CODE_DECIMAL)
        return int(as_decimal)


class Max(BaseFilter):
    """Enforce a maximum value; out-of-range becomes ``None`` (no clamping)."""

    CODE_TOO_BIG = 'too_big'

    templates = {
        CODE_TOO_BIG: 'Value is too large (must be {operator} {max}).',
    }

    def __init__(self, max_value: Any, exclusive: bool = False) -> None:
        super().__init__()
        self.max_value = max_value
        self.exclusive = exclusive

    def __str__(self) -> str:
        return f'{type(self).__name__}({self.max_value!r}, exclusive={self.exclusive!r})'

    def _apply(self, value: Any) -> Any:
        too_big = value > self.max_value or (
            self.exclusive and value == self.max_value
        )
        if too_big:
            return self._invalid_value(
                value=value,
                reason=self.CODE_TOO_BIG,
                template_vars={
                    'operator': '<' if self.exclusive else '<=',
                    'max': self.max_value,
                },
            )
        return value


class Min(BaseFilter):
    """Enforce a minimum value; out-of-range becomes ``None`` (no padding)."""

    CODE_TOO_SMALL = 'too_small'

    templates = {
        CODE_TOO_SMALL: 'Value is too small (must be {operator} {min}).',
    }

    def __init__(self, min_value: Any, exclusive: bool = False) -> None:
        super().__init__()
        self.min_value = min_value
        self.exclusive = exclusive

    def __str__(self) -> str:
        return f'{type(self).__name__}({self.min_value!r}, exclusive={self.exclusive!r})'

    def _apply(self, value: Any) -> Any:
        too_small = value < self.min_value or (
            self.exclusive and value == self.min_value
        )
        if too_small:
            return self._invalid_value(
                value=value,
                reason=self.CODE_TOO_SMALL,
                template_vars={
                    'operator': '>' if self.exclusive else '>=',
                    'min': self.min_value,
                },
            )
        return value


class Round(BaseFilter):
    """Round to the nearest multiple of ``to_nearest`` (HALF_UP by default)."""

    def __init__(
        self,
        to_nearest: Union[int, str, D] = 1,
        rounding: str = ROUND_HALF_UP,
        result_type: type = D,
    ) -> None:
        super().__init__()
        self.to_nearest = D(to_nearest)
        # Negative targets are nonsensical; fail fast at configuration time.
        Min(D('0')).apply(self.to_nearest)
        self.rounding = rounding
        self.result_type = result_type

    def _apply(self, value: Any) -> Any:
        as_decimal = self._filter(value, Decimal)
        if self._has_errors:
            return None
        one = D('1')
        # Scale → quantize → unscale, in Decimal space to avoid float error.
        scaled = (as_decimal * one / self.to_nearest).quantize(
            one, rounding=self.rounding,
        )
        return self.result_type(scaled * self.to_nearest)
