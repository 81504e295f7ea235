"""Invalid-value handlers and the FilterRunner façade.

Clean-room port of the semantics in SURVEY.md §2.6
(reference: /root/reference/filters/handlers.py). Invariants:

* ``MemoryHandler`` accumulates ``FilterMessage``s keyed by dotted path.
* ``FilterRunner`` lazily runs ``full_clean()`` which temporarily swaps a
  MemoryHandler onto the chain, then exposes ``is_valid()`` /
  ``cleaned_data`` / ``errors`` / ``error_codes`` — the exact surface the
  engine's dead-letter rejection counts are judged on (BASELINE.md).
"""

from __future__ import annotations

import sys
from collections import OrderedDict
from logging import ERROR
from traceback import format_exc
from typing import Any, Dict, List, Optional

from .base import BaseFilter, BaseInvalidValueHandler, FilterCompatible

__all__ = [
    'FilterMessage',
    'FilterRunner',
    'LogHandler',
    'MemoryHandler',
]


class LogHandler(BaseInvalidValueHandler):
    """Route invalid values to a :mod:`logging` logger."""

    def __init__(self, logger, level: int = ERROR) -> None:
        super().__init__()
        self.logger = logger
        self.level = level

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> Any:
        self.logger.log(
            level=self.level,
            msg=message,
            exc_info=exc_info,
            extra={'context': context},
        )


class FilterMessage:
    """One invalid-value report: message + context + stable error code."""

    def __init__(self, message: str, context: dict, exc_info: Optional[str] = None) -> None:
        self.message = message
        self.context = context
        self.code = context.get('code') or message
        self.exc_info = exc_info

    def __repr__(self) -> str:
        return f'{type(self).__name__}({self.message!r}, {self.context!r})'

    def __str__(self) -> str:
        return self.message

    def as_dict(self, with_debug_info: bool = False) -> dict:
        result = {
            'code': self.code,
            'message': self.message,
        }
        if with_debug_info:
            result['context'] = self.context
            result['exc_info'] = self.exc_info
        return result


class MemoryHandler(BaseInvalidValueHandler):
    """Accumulate messages in memory, keyed by dotted path."""

    def __init__(self, capture_exc_info: bool = False) -> None:
        super().__init__()
        self.messages: 'OrderedDict[str, List[FilterMessage]]' = OrderedDict()
        self.has_exceptions = False
        self.capture_exc_info = capture_exc_info
        self.exc_info: list = []

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> Any:
        key = context.get('key', '')
        self.messages.setdefault(key, []).append(FilterMessage(
            message=message,
            context=context,
            exc_info=format_exc() if exc_info else None,
        ))

    def handle_exception(self, message: str, exc: Exception) -> Any:
        self.has_exceptions = True
        if self.capture_exc_info:
            self.exc_info.append(sys.exc_info())
        return super().handle_exception(message, exc)


class FilterRunner:
    """One-shot validation façade (Django-form-like API).

    Initialize with a filter spec and the incoming value; read
    ``is_valid()`` / ``cleaned_data`` / ``errors`` / ``error_codes``.
    """

    def __init__(
        self,
        starting_filter: FilterCompatible,
        incoming_data: Any,
        capture_exc_info: bool = False,
    ) -> None:
        self.filter_chain = BaseFilter.resolve(starting_filter)
        self.data = incoming_data
        self.capture_exc_info = capture_exc_info

        self._cleaned_data: Any = None
        self._handler: Optional[MemoryHandler] = None

    def __str__(self) -> str:
        return str(self.filter_chain)

    @property
    def cleaned_data(self) -> Any:
        self.full_clean()
        return self._cleaned_data

    @property
    def errors(self) -> Dict[str, List[dict]]:
        """``{dotted_key: [{'code': ..., 'message': ...}]}``"""
        return self.get_errors()

    def get_errors(self, with_context: bool = False) -> Dict[str, List[dict]]:
        return {
            key: [m.as_dict(with_context) for m in msgs]
            for key, msgs in self.filter_messages.items()
        }

    @property
    def error_codes(self) -> Dict[str, List[str]]:
        return {
            key: [m.code for m in msgs]
            for key, msgs in self.filter_messages.items()
        }

    @property
    def has_exceptions(self) -> bool:
        self.full_clean()
        return self._handler.has_exceptions

    @property
    def exc_info(self) -> list:
        self.full_clean()
        return self._handler.exc_info

    @property
    def filter_messages(self) -> Dict[str, List[FilterMessage]]:
        self.full_clean()
        return self._handler.messages

    def is_valid(self) -> bool:
        return not self.filter_messages

    def full_clean(self) -> None:
        """Apply the filter (idempotent; runs once)."""
        if self._handler is not None:
            return
        self._handler = MemoryHandler(self.capture_exc_info)

        # Temporarily swap our handler onto the chain while it runs so we
        # capture error messages instead of raising.
        previous = self.filter_chain.handler
        self.filter_chain.handler = self._handler
        try:
            self._cleaned_data = self.filter_chain.apply(self.data)
        finally:
            self.filter_chain.handler = previous
