"""Filter macros: promote chain-returning functions into filter *types*.

Clean-room port of the semantics in SURVEY.md §2.6
(reference: /root/reference/filters/macros.py). A macro is usable
uninstantiated inside a chain (``MyMacro | Split(':')``) and can also act
as a partial presetting init args for an existing filter type.
"""

from __future__ import annotations

from abc import ABCMeta
from functools import WRAPPER_ASSIGNMENTS, partial

from .base import BaseFilter, FilterMeta

__all__ = ['FilterMacroType', 'filter_macro']


class FilterMacroType(BaseFilter, metaclass=ABCMeta):
    """Marker base for macros — check with ``issubclass``, never
    ``isinstance`` (macro "instantiation" returns the underlying chain,
    not a FilterMacroType instance)."""


def filter_macro(func, *args, **kwargs):
    """Promote ``func`` (returning a filter/chain) into a filter type.

    Example::

        @filter_macro
        def String():
            return Unicode | Strip | NotEmpty

        (String | Split(':')).apply('...')

    Also usable as a partial presetting init args::

        Minor = filter_macro(Max, max_value=18)
    """
    preset = partial(func, *args, **kwargs)

    class _MacroMeta(FilterMeta):
        @staticmethod
        def __new__(mcs, name, bases, attrs):
            # Equivalent of functools.update_wrapper for a type.
            for attr in WRAPPER_ASSIGNMENTS:
                if hasattr(func, attr):
                    attrs[attr] = getattr(func, attr)
            return super().__new__(mcs, func.__name__, bases, attrs)

        def __call__(cls, *call_args, **call_kwargs):
            # "Instantiating" the macro just invokes the preset function.
            return preset(*call_args, **call_kwargs)

    class _Macro(FilterMacroType, metaclass=_MacroMeta):
        # Unreachable in practice (metaclass __call__ bypasses it) but
        # required because BaseFilter._apply is abstract.
        def _apply(self, value):
            return self.__class__()._apply(value)

    return _Macro
