"""Scalar filter/validation library — the operator parity surface.

Import as ``import filters_ray as f`` (top-level package re-exports this
module's names) and compose with ``|``::

    chain = f.Required | f.Unicode | f.MaxLength(256)
    runner = f.FilterRunner(chain, value)
"""

from .base import (
    BaseFilter,
    BaseInvalidValueHandler,
    ExceptionHandler,
    FilterChain,
    FilterCompatible,
    FilterError,
    Type,
)
from .complex import FilterMapper, FilterRepeater
from .extensions import FilterExtensionRegistry
from .handlers import FilterMessage, FilterRunner, LogHandler, MemoryHandler
from .macros import FilterMacroType, filter_macro
from .number import Decimal, Int, Max, Min, Round
from .simple import (
    Array,
    ByteArray,
    Choice,
    Date,
    Datetime,
    Empty,
    Length,
    MaxLength,
    MinLength,
    NoOp,
    NotEmpty,
    Optional,
    Required,
)
from .string import (
    Base64Decode,
    ByteString,
    CaseFold,
    IpAddress,
    JsonDecode,
    MaxBytes,
    Regex,
    Split,
    Strip,
    Unicode,
    Uuid,
)

#: Third-party filter namespace (entry-point group ``filters_ray.extensions``).
ext = FilterExtensionRegistry()

__all__ = [
    'Array', 'Base64Decode', 'BaseFilter', 'BaseInvalidValueHandler',
    'ByteArray', 'ByteString', 'CaseFold', 'Choice', 'Date', 'Datetime',
    'Decimal', 'Empty', 'ExceptionHandler', 'FilterChain', 'FilterCompatible',
    'FilterError', 'FilterExtensionRegistry', 'FilterMacroType', 'FilterMapper',
    'FilterMessage', 'FilterRepeater', 'FilterRunner', 'Int', 'IpAddress',
    'JsonDecode', 'Length', 'LogHandler', 'Max', 'MaxBytes', 'MaxLength',
    'MemoryHandler', 'Min', 'MinLength', 'NoOp', 'NotEmpty', 'Optional',
    'Regex', 'Required', 'Round', 'Split', 'Strip', 'Type', 'Unicode', 'Uuid',
    'ext', 'filter_macro',
]
