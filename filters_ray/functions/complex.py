"""Structural filters: apply chains over collections and mappings.

Clean-room port of the semantics in SURVEY.md §2.5
(reference: /root/reference/filters/complex.py). Invariants:

* ``FilterRepeater`` applies one chain to every element with per-element
  error isolation: a failed element becomes ``None`` at its position and
  siblings are still processed. Output is coerced to list / OrderedDict.
* ``FilterMapper`` applies per-key chains over a mapping. Missing keys are
  filtered as ``None`` (or error ``missing``); extra keys pass through
  sorted last (or error ``unexpected`` and are dropped). The tri-state
  ``allow_missing_keys`` / ``allow_extra_keys`` accept bool or a key set —
  this is the engine's schema-evolution hook (SURVEY.md §1.1).
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterable, Mapping
from typing import Any, Dict, Optional, Union

from .base import BaseFilter, FilterCompatible, FilterError, Type
from .string import Unicode

__all__ = ['FilterMapper', 'FilterRepeater']


def _display_key(key: Any) -> str:
    """Render a key for use in dotted error paths."""
    if key is None:
        return 'None'
    try:
        return Unicode().apply(key)
    except FilterError:
        return repr(key)


class FilterRepeater(BaseFilter):
    """Apply one chain to every element of an iterable or mapping."""

    CODE_EXTRA_KEY = 'unexpected'

    templates = {
        CODE_EXTRA_KEY: 'Unexpected key "{key}".',
    }

    mapping_result_type = OrderedDict
    sequence_result_type = list

    def __init__(
        self,
        filter_chain: FilterCompatible,
        restrict_keys: Optional[Iterable] = None,
    ) -> None:
        """``restrict_keys``: when given, only these keys/indexes are
        allowed — anything else is rejected with code ``unexpected``.
        An *empty* container rejects every key."""
        super().__init__()
        self._filter_chain = self.resolve(filter_chain, parent=self)
        self.restrict_keys = None if restrict_keys is None else set(restrict_keys)

    def __str__(self) -> str:
        return f'{type(self).__name__}({self._filter_chain})'

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(Iterable))
        if self._has_errors:
            return None

        if isinstance(value, Mapping):
            return self.mapping_result_type(self._iter_mapping(value))
        return self.sequence_result_type(self._iter_sequence(value))

    def _iter_mapping(self, value: Mapping):
        for key, item in value.items():
            shown = _display_key(key)
            if self.restrict_keys is None or key in self.restrict_keys:
                yield key, self._apply_item(shown, item, self._filter_chain)
            else:
                # Mirror FilterMapper: rejected keys are omitted from the
                # output entirely.
                self._invalid_value(
                    value=item, reason=self.CODE_EXTRA_KEY, sub_key=shown,
                )

    def _iter_sequence(self, value: Iterable):
        for index, item in enumerate(value):
            shown = _display_key(index)
            if self.restrict_keys is None or index in self.restrict_keys:
                yield self._apply_item(shown, item, self._filter_chain)
            else:
                # Positions can't simply vanish from a sequence, so the
                # rejected element is replaced in place.
                yield self._invalid_value(
                    value=item, reason=self.CODE_EXTRA_KEY, sub_key=shown,
                )

    def _apply_item(self, key: str, value: Any, chain: FilterCompatible) -> Any:
        """Filter a single element; override to customize per-item handling."""
        return self._filter(value, chain, sub_key=key)

    # Kept for API parity with the reference.
    unicodify_key = staticmethod(_display_key)


class FilterMapper(BaseFilter):
    """Apply a per-key chain map over a mapping (the record validator).

    The output key order follows ``filter_map`` order, with extra keys
    sorted last.
    """

    CODE_EXTRA_KEY = 'unexpected'
    CODE_MISSING_KEY = 'missing'

    templates = {
        CODE_EXTRA_KEY: 'Unexpected key "{actual_key}".',
        CODE_MISSING_KEY: '{key} is required.',
    }

    def __init__(
        self,
        filter_map: Dict[str, FilterCompatible],
        allow_missing_keys: Union[bool, Iterable] = True,
        allow_extra_keys: Union[bool, Iterable] = True,
    ) -> None:
        """``allow_missing_keys`` / ``allow_extra_keys``:
        True = tolerate all, False = reject all, iterable = allow only the
        listed keys. A ``None`` chain makes a key required-but-unfiltered."""
        super().__init__()

        self.allow_missing_keys = (
            set(allow_missing_keys)
            if isinstance(allow_missing_keys, Iterable)
            else bool(allow_missing_keys)
        )
        self.allow_extra_keys = (
            set(allow_extra_keys)
            if isinstance(allow_extra_keys, Iterable)
            else bool(allow_extra_keys)
        )

        self._filters: 'OrderedDict[str, Optional[BaseFilter]]' = OrderedDict()
        if filter_map:
            for key, chain in filter_map.items():
                # A None chain marks the key as present-but-unfiltered.
                self._filters[key] = self.resolve(chain, parent=self, key=key)

        self.result_type = (
            OrderedDict if isinstance(filter_map, OrderedDict) else dict
        )

    def __str__(self) -> str:
        inner = ', '.join(
            f'{key}={chain}' for key, chain in self._filters.items()
        )
        return f'{type(self).__name__}({inner})'

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(Mapping))
        if self._has_errors:
            return None
        return self.result_type(self.iter(value))

    def iter(self, value: Mapping):
        if value is None:
            return

        # Mapped keys first, in filter_map order.
        for key, chain in self._filters.items():
            if key in value:
                yield key, self._apply_item(key, value[key], chain)
            elif self._missing_key_allowed(key):
                # Treat the missing value as None and filter normally.
                yield key, self._apply_item(key, None, chain)
            else:
                yield key, self._invalid_value(
                    value=None,
                    reason=self.CODE_MISSING_KEY,
                    sub_key=key,
                )

        # Extra keys last, in sorted order for deterministic output.
        for key in sorted(set(value.keys()) - set(self._filters.keys())):
            if self._extra_key_allowed(key):
                yield key, value[key]
            else:
                shown = _display_key(key)
                # Rejected extras are omitted from the output (no yield).
                self._invalid_value(
                    value=value[key],
                    reason=self.CODE_EXTRA_KEY,
                    sub_key=shown,
                    template_vars={'actual_key': shown},
                )

    def _apply_item(self, key: str, value: Any, chain: FilterCompatible) -> Any:
        """Filter a single entry; override to customize per-item handling."""
        return self._filter(value, chain, sub_key=key)

    def _missing_key_allowed(self, key: str) -> bool:
        if self.allow_missing_keys is True:
            return True
        try:
            return key in self.allow_missing_keys  # type: ignore[operator]
        except TypeError:
            return False

    def _extra_key_allowed(self, key: str) -> bool:
        if self.allow_extra_keys is True:
            return True
        try:
            return key in self.allow_extra_keys  # type: ignore[operator]
        except TypeError:
            return False

    unicodify_key = staticmethod(_display_key)
