"""Core filter protocol: composition algebra, error handling, type gate.

Behavioral re-implementation (clean-room, Python-3-native) of the semantics
documented in SURVEY.md §2.1 / §3 (reference: /root/reference/filters/base.py).
Key invariants preserved:

* ``apply()`` resets the per-call error flag, routes ``None`` to
  ``_apply_none`` (pass-through by default), and traps every exception into
  the invalid-value protocol (reference base.py:266-275).
* ``a | b`` builds a :class:`FilterChain`; works on classes and instances
  (reference base.py:54-68, 117-137).
* Chains stop at the first error for a value (reference base.py:521-532).
* Errors are ``(dotted_key, code)`` pairs dispatched to a pluggable handler;
  the default handler raises :class:`FilterError` (reference base.py:590-597).
* Error-message templates merge down the inheritance chain
  (reference base.py:31-52).
"""

from __future__ import annotations

import weakref
from abc import ABCMeta, abstractmethod
from typing import Any, Callable, Optional, Union

__all__ = [
    'BaseFilter',
    'BaseInvalidValueHandler',
    'ExceptionHandler',
    'FilterChain',
    'FilterCompatible',
    'FilterError',
    'Type',
]

FilterCompatible = Optional[Union['BaseFilter', type, Callable[[], 'BaseFilter']]]


class FilterError(ValueError):
    """Raised (by the default handler) when a value fails validation."""

    def __init__(self, *args: Any) -> None:
        super().__init__(*args)
        self.context: dict = {}


class BaseInvalidValueHandler(metaclass=ABCMeta):
    """Strategy interface deciding what happens to invalid values."""

    @abstractmethod
    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> Any:
        raise NotImplementedError

    def handle_exception(self, message: str, exc: Exception) -> Any:
        return self.handle_invalid_value(
            message=message,
            exc_info=True,
            context=getattr(exc, 'context', {}),
        )


class ExceptionHandler(BaseInvalidValueHandler):
    """Default handler: fail fast by raising :class:`FilterError`."""

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> Any:
        err = FilterError(message)
        err.context = context
        raise err


class FilterMeta(ABCMeta):
    """Metaclass providing template inheritance and class-level ``|``."""

    def __init__(cls, name, bases=None, namespace=None, **kwargs):
        super().__init__(name, bases, namespace, **kwargs)

        merged: dict = {}
        for base in (bases or ()):
            if isinstance(base, FilterMeta):
                merged.update(getattr(base, 'templates', {}))
        merged.update(namespace.get('templates', {}) if namespace else {})
        cls.templates = merged

    def __or__(cls, other: FilterCompatible) -> 'FilterChain':
        # ``Int | Max(3)`` — the left operand is a class, instantiate with
        # default config (reference base.py:54-68).
        return FilterChain(cls) | other


class BaseFilter(metaclass=FilterMeta):
    """Abstract single-value operator.

    Subclasses implement ``_apply`` (value is guaranteed non-None) and may
    override ``_apply_none`` to opt out of the universal None pass-through.
    """

    CODE_EXCEPTION = 'exception'

    templates = {
        CODE_EXCEPTION: 'An error occurred while processing this value.',
    }

    def __init__(self) -> None:
        self._parent: Any = None
        self._handler: Optional[BaseInvalidValueHandler] = None
        self._key: Optional[str] = None
        # Per-apply error flag; internal — external code observes errors via
        # handlers (MemoryHandler etc.).
        self._has_errors = False

    # -- composition ------------------------------------------------------

    def __or__(self, other: FilterCompatible) -> 'FilterChain':
        if self.resolve(other) is None:
            return self if isinstance(self, FilterChain) else FilterChain(self)
        return FilterChain(self)._append(other)

    def __str__(self) -> str:
        return f'{type(self).__name__}()'

    # -- parent / key hierarchy ------------------------------------------

    @property
    def parent(self) -> Optional['BaseFilter']:
        try:
            if self._parent is not None:
                self._parent.__class__  # touch: may raise ReferenceError
        except ReferenceError:
            return None
        return self._parent

    @parent.setter
    def parent(self, value: Optional['BaseFilter']) -> None:
        if value is None:
            self._parent = None
        elif isinstance(value, weakref.ProxyTypes):
            self._parent = value
        else:
            self._parent = weakref.proxy(value)

    @property
    def key(self) -> str:
        return '.'.join(p for p in self._key_path() if p)

    @key.setter
    def key(self, value: str) -> None:
        self._key = value

    def sub_key(self, suffix: Optional[str]) -> str:
        parts = self._key_path()
        if suffix:
            parts.append(suffix)
        return '.'.join(p for p in parts if p)

    def _key_path(self) -> list:
        parts: list = []
        node: Optional[BaseFilter] = self
        while node is not None:
            parts.insert(0, node._key)
            node = node.parent
        return parts

    # -- handler ----------------------------------------------------------

    @property
    def handler(self) -> BaseInvalidValueHandler:
        if self._handler is not None:
            return self._handler
        parent = self.parent
        if parent is not None:
            return parent.handler
        # Do not cache: the filter may later be adopted by a chain with a
        # different handler.
        return ExceptionHandler()

    @handler.setter
    def handler(self, value: BaseInvalidValueHandler) -> None:
        self._handler = value

    def set_handler(self, value: BaseInvalidValueHandler) -> 'BaseFilter':
        self.handler = value
        return self

    # -- execution --------------------------------------------------------

    def apply(self, value: Any) -> Any:
        """Apply the filter to one value; never raises unless the handler does."""
        self._has_errors = False
        try:
            if value is None:
                return self._apply_none()
            return self._apply(value)
        except Exception as exc:  # noqa: BLE001 — protocol requires trapping all
            return self._invalid_value(value, exc, exc_info=True)

    @abstractmethod
    def _apply(self, value: Any) -> Any:
        raise NotImplementedError(f'Not implemented in {type(self).__name__}.')

    def _apply_none(self) -> Any:
        return None

    def _filter(self, value: Any, chain: FilterCompatible, sub_key: Optional[str] = None) -> Any:
        """Run a sub-chain in this filter's context (key path + handler)."""
        resolved = self.resolve(chain, parent=self, key=sub_key)
        if resolved is None:
            return value
        try:
            out = resolved.apply(value)
        except Exception as exc:  # noqa: BLE001
            return self._invalid_value(value, exc, exc_info=True)
        self._has_errors = self._has_errors or resolved._has_errors
        return out

    def _invalid_value(
        self,
        value: Any,
        reason: Union[str, Exception],
        replacement: Any = None,
        exc_info: bool = False,
        context: Optional[dict] = None,
        sub_key: Optional[str] = None,
        template_vars: Optional[dict] = None,
    ) -> Any:
        """Record an invalid value via the handler; return the replacement."""
        handler = self.handler

        if isinstance(reason, FilterError):
            # Raised by a nested chain whose handler is ExceptionHandler:
            # forward verbatim so complex filters can trap it.
            return handler.handle_invalid_value(
                message=str(reason),
                exc_info=True,
                context=getattr(reason, 'context', {}),
            )

        self._has_errors = True

        context = dict(context or {})
        context['value'] = value
        context['filter'] = str(self)
        context['key'] = self.sub_key(sub_key)
        context['replacement'] = replacement

        tvars = dict(template_vars or {})
        tvars.update(context)

        if isinstance(reason, Exception):
            context['code'] = self.CODE_EXCEPTION
            context['exc'] = '[{}.{}] {}'.format(
                type(reason).__module__, type(reason).__name__, reason,
            )
            if not hasattr(reason, 'context'):
                reason.context = {}  # type: ignore[attr-defined]
            reason.context.update(context)  # type: ignore[attr-defined]
            handler.handle_exception(
                message=self._render_template(context['code'], tvars),
                exc=reason,
            )
        else:
            context['code'] = reason
            handler.handle_invalid_value(
                message=self._render_template(reason, tvars),
                exc_info=exc_info,
                context=context,
            )

        return replacement

    def _render_template(self, code: str, template_vars: dict) -> str:
        return self.templates[code].format(**template_vars)

    # -- normalization ----------------------------------------------------

    @classmethod
    def resolve(
        cls,
        spec: FilterCompatible,
        parent: Optional['BaseFilter'] = None,
        key: Optional[str] = None,
    ) -> Optional['BaseFilter']:
        """Normalize a filter-compatible spec to a filter instance."""
        if spec is None:
            return None
        if isinstance(spec, BaseFilter):
            resolved = spec
        elif callable(spec):
            inner = spec()
            resolved = cls.resolve(inner)
            if resolved is None:
                return None
        else:
            raise TypeError(
                f'{type(spec).__name__} {spec!r} is not compatible '
                f'with {cls.__name__}.'
            )
        if parent is not None:
            resolved.parent = parent
        if key is not None:
            resolved.key = key
        return resolved

    # Backwards-compatible alias matching the reference's public name.
    resolve_filter = resolve


class FilterChain(BaseFilter):
    """Ordered sequence of filters applied left to right.

    Stops at the first error for the value being processed — later filters
    never see a value that an earlier filter rejected.
    """

    def __init__(self, start: FilterCompatible = None) -> None:
        super().__init__()
        self._filters: list = []
        self._append(start)

    def __str__(self) -> str:
        inner = ' | '.join(str(f) for f in self._filters)
        return f'{type(self).__name__}({inner})'

    def __or__(self, other: FilterCompatible) -> 'FilterChain':
        if self.resolve(other) is None:
            return self
        clone = FilterChain()
        clone._filters = list(self._filters)
        clone._parent = self._parent
        clone._key = self._key
        clone._handler = self._handler
        return clone._append(other)

    def _append(self, spec: FilterCompatible) -> 'FilterChain':
        resolved = self.resolve(spec, parent=self)
        if resolved is not None:
            self._filters.append(resolved)
        return self

    def _apply(self, value: Any) -> Any:
        for member in self._filters:
            value = self._filter(value, member)
            if self._has_errors:
                # Short-circuit: behave identically whether or not the
                # handler raises (reference base.py:521-532).
                break
        return value

    def _apply_none(self) -> Any:
        # The chain still runs on None — each member applies its own
        # None policy (only Required-style filters reject it).
        return self._apply(None)


# JSON-ish display aliases for type names in error messages
# (reference base.py:602-617).
from collections.abc import Mapping as _Mapping, Sequence as _Sequence  # noqa: E402

JSON_ALIASES: dict = {
    bool: 'Boolean',
    dict: 'Object',
    float: 'Number',
    int: 'Number',
    list: 'Array',
    bytes: 'String',
    str: 'String',
    _Mapping: 'Array',
    _Sequence: 'Array',
}


class Type(BaseFilter):
    """Gate on the Python type of the value (code ``wrong_type``)."""

    CODE_WRONG_TYPE = 'wrong_type'

    templates = {
        CODE_WRONG_TYPE: '{incoming} is not valid (allowed types: {allowed}).',
    }

    def __init__(self, allowed_types, allow_subclass: bool = True, aliases=None) -> None:
        super().__init__()
        self.allowed_types = (
            allowed_types if isinstance(allowed_types, tuple) else (allowed_types,)
        )
        self.allow_subclass = allow_subclass
        self.aliases = aliases or {}

    def __str__(self) -> str:
        return (
            f'{type(self).__name__}({self.get_allowed_type_names(aliased=False)}, '
            f'allow_subclass={self.allow_subclass!r})'
        )

    def _apply(self, value: Any) -> Any:
        if self.allow_subclass:
            ok = isinstance(value, self.allowed_types)
        else:
            ok = type(value) in self.allowed_types
        if not ok:
            return self._invalid_value(
                value=value,
                reason=self.CODE_WRONG_TYPE,
                template_vars={
                    'incoming': self.get_type_name(type(value)),
                    'allowed': self.get_allowed_type_names(),
                },
            )
        return value

    def get_allowed_type_names(self, aliased: bool = True) -> str:
        return ', '.join(sorted({
            self.get_type_name(t, aliased) for t in self.allowed_types
        }))

    def get_type_name(self, type_: type, aliased: bool = True) -> str:
        if aliased:
            return self.aliases.get(type_) or type_.__name__
        return type_.__name__
