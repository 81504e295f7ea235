"""String filters: decoding, normalization, pattern matching.

Clean-room port of the semantics in SURVEY.md §2.3
(reference: /root/reference/filters/string.py). Invariants:

* ``Base64Decode`` strips ASCII whitespace, validates the alphabet, rejects
  mixed standard/URL-safe dialects, re-pads, then decodes.
* ``Unicode`` coerces anything to str; with ``normalize=True`` (default)
  applies NFC + removes non-printables (``[^\\P{C}\\s]+``) + converts all
  line endings to ``\\n``. ``ByteString`` is Unicode (normalize off by
  default) re-encoded to UTF-8 bytes.
* ``MaxBytes`` measures *encoded* byte length and truncates without
  splitting a multibyte sequence; output is bytes even for str input.
* ``Regex`` returns the list of ALL matches (zero matches ⇒ invalid) using
  the ``regex`` library with UNICODE semantics.
* ``Strip`` trims ``[\\p{C}\\s]+`` (control chars + whitespace) by default.
"""

from __future__ import annotations

import base64 as _b64
import json as _json
import re as _stdlib_re
import socket
import unicodedata
from collections import OrderedDict
from decimal import Decimal as D
from itertools import zip_longest
from typing import Any, Callable, Optional, Sequence
from uuid import UUID
from xml.etree.ElementTree import Element, tostring as _xml_tostring

import regex as _regex

from .base import BaseFilter, Type
from .simple import MaxLength

__all__ = [
    'Base64Decode',
    'ByteString',
    'CaseFold',
    'IpAddress',
    'JsonDecode',
    'MaxBytes',
    'Regex',
    'Split',
    'Strip',
    'Unicode',
    'Uuid',
]

# Pre-compiled patterns shared by every Base64Decode instance.
_B64_WS = _regex.compile(rb'[ \t\r\n]+', _regex.ASCII)
_B64_ALPHABET = _regex.compile(rb'^[-+_/A-Za-z0-9=]+$', _regex.ASCII)


def _compile_unicode_regex(pattern):
    """Accept a string pattern or an already-compiled re/regex object."""
    if isinstance(pattern, (_regex.Pattern, _stdlib_re.Pattern)):
        return pattern
    return _regex.compile(pattern, _regex.UNICODE)


class Base64Decode(BaseFilter):
    """Decode a base64 byte string (standard or URL-safe dialect)."""

    CODE_INVALID = 'not_base64'

    templates = {
        CODE_INVALID: 'Base64-encoded value expected.',
    }

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(bytes))
        if self._has_errors:
            return None

        # Whitespace is not officially part of the alphabet, but virtually
        # every encoder emits it; strip it first.
        value = _B64_WS.sub(b'', value)

        if not _B64_ALPHABET.match(value):
            return self._invalid_value(value, self.CODE_INVALID)

        url_safe = (b'_' in value) or (b'-' in value)
        if url_safe and ((b'+' in value) or (b'/' in value)):
            # Standard and URL-safe dialects cannot be mixed.
            return self._invalid_value(value, self.CODE_INVALID)

        # Re-pad to a multiple of 4.
        value = value.rstrip(b'=')
        value += b'=' * (4 - (len(value) % 4))

        try:
            if url_safe:
                return _b64.urlsafe_b64decode(value)
            return _b64.standard_b64decode(value)
        except (TypeError, ValueError):
            return self._invalid_value(value, self.CODE_INVALID, exc_info=True)


class CaseFold(BaseFilter):
    """Unicode case folding (str in, str out)."""

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None
        return value.casefold()


class IpAddress(BaseFilter):
    """Validate an IPv4 and/or IPv6 address string."""

    CODE_INVALID = 'not_ip_address'

    templates = {
        CODE_INVALID: 'This value is not a valid {ip_type} address.',
    }

    def __init__(self, ipv4: bool = True, ipv6: bool = False) -> None:
        super().__init__()
        self.ipv4 = ipv4
        self.ipv6 = ipv6

    def __str__(self) -> str:
        return f'{type(self).__name__}(ipv4={self.ipv4!r}, ipv6={self.ipv6!r})'

    @property
    def ip_type(self) -> str:
        return '/'.join(
            label for label in (
                'IPv4' if self.ipv4 else None,
                'IPv6' if self.ipv6 else None,
            ) if label
        )

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None

        if self.ipv4:
            try:
                socket.inet_pton(socket.AF_INET, value)
            except OSError:
                pass
            else:
                return value

        if self.ipv6:
            try:
                packed = socket.inet_pton(socket.AF_INET6, value)
            except OSError:
                pass
            else:
                # Normalize to canonical presentation form.
                return socket.inet_ntop(socket.AF_INET6, packed)

        return self._invalid_value(
            value=value,
            reason=self.CODE_INVALID,
            template_vars={'ip_type': self.ip_type},
        )


class JsonDecode(BaseFilter):
    """Decode JSON; objects become OrderedDicts (key order preserved)."""

    CODE_INVALID = 'not_json'

    templates = {
        CODE_INVALID: 'This value is not valid JSON.',
    }

    def __init__(self, decoder: Callable = _json.loads) -> None:
        super().__init__()
        self.decoder = decoder

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None
        try:
            return self.decoder(value, object_pairs_hook=OrderedDict)
        except ValueError:
            return self._invalid_value(value, self.CODE_INVALID, exc_info=True)


class MaxBytes(BaseFilter):
    """Limit the *encoded* byte length of a string.

    On overflow: with ``truncate=True`` the replacement is the truncated
    bytes (optionally prefixed), never splitting a multibyte sequence; with
    ``truncate=False`` the replacement is ``None``. Output is bytes even
    when the input is str.
    """

    CODE_TOO_LONG = 'too_long'

    templates = {
        CODE_TOO_LONG:
            'Value is too long (must be < {max_bytes} '
            'bytes when encoded using {encoding}).',
    }

    def __init__(
        self,
        max_bytes: int,
        truncate: bool = True,
        prefix: str = '',
        encoding: str = 'utf-8',
    ) -> None:
        super().__init__()
        self.max_bytes = max_bytes
        self.truncate = truncate
        self.prefix = prefix
        self.encoding = encoding

    def __str__(self) -> str:
        return (
            f'{type(self).__name__}({self.max_bytes!r}, '
            f'encoding={self.encoding!r})'
        )

    def _apply(self, value: Any) -> Any:
        value = self._filter(
            value,
            Type((bytes, str)) | Unicode(encoding=self.encoding),
        )
        if self._has_errors:
            return None

        encoded = value.encode(self.encoding)
        if len(encoded) <= self.max_bytes:
            return encoded

        replacement = None
        if self.truncate:
            # Prefix is applied in str space so BOM-bearing codecs encode
            # exactly once.
            replacement = self.truncate_string(
                value=self.prefix + value,
                max_bytes=self.max_bytes,
                encoding=self.encoding,
            )

        return self._invalid_value(
            value=value,
            reason=self.CODE_TOO_LONG,
            replacement=replacement,
            context={
                'encoding': self.encoding,
                'max_bytes': self.max_bytes,
                'prefix': self.prefix,
                'truncate': self.truncate,
            },
        )

    @staticmethod
    def truncate_string(value: str, max_bytes: int, encoding: str) -> bytes:
        """Truncate to ≤ max_bytes without orphaning a multibyte sequence."""
        raw = value.encode(encoding)

        if encoding.lower().replace('-', '') == 'utf8':
            # UTF-8 fast path: inspect at most 4 trailing bytes instead of
            # repeatedly decoding the whole string.
            cut = bytearray(raw[:max_bytes])
            for back, byte in enumerate(reversed(cut), start=1):
                if back < 2 and byte < 0x80:
                    break  # final byte is a standalone ASCII char
                if byte >= 0xC0:
                    # Leading byte of a multibyte sequence: work out how
                    # long the sequence should be and drop it if it was cut.
                    seq_len = 4 if byte >= 0xF0 else 3 if byte >= 0xE0 else 2
                    if seq_len != back:
                        del cut[-back:]
                    break
                # else: continuation byte — keep walking backwards.
            return bytes(cut)

        # Generic path: chop until the result decodes cleanly.
        for trim in range(0, max_bytes + 1):
            candidate = raw[: max_bytes - trim]
            try:
                candidate.decode(encoding)
            except UnicodeDecodeError:
                continue
            return candidate

        raise ValueError(
            f'Unable to truncate {raw!r} to {max_bytes} bytes '
            f'when encoded using {encoding}.'
        )


class Regex(BaseFilter):
    """Return the list of ALL pattern matches; zero matches ⇒ invalid.

    Uses the ``regex`` library (Unicode property classes supported).
    """

    CODE_INVALID = 'malformed'

    templates = {
        CODE_INVALID: 'Value does not match regular expression {pattern}.',
    }

    def __init__(self, pattern) -> None:
        super().__init__()
        self.regex = _compile_unicode_regex(pattern)

    def __str__(self) -> str:
        return f'{type(self).__name__}({self.regex.pattern!r})'

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None

        matches = [m.group(0) for m in self.regex.finditer(value)]
        if not matches:
            return self._invalid_value(
                value=value,
                reason=self.CODE_INVALID,
                template_vars={'pattern': self.regex.pattern},
            )
        return matches


class Split(BaseFilter):
    """Regex-split into a list, or (with ``keys``) an OrderedDict."""

    def __init__(self, pattern, keys: Optional[Sequence[str]] = None) -> None:
        super().__init__()
        self.regex = _compile_unicode_regex(pattern)
        self.keys = keys

    def __str__(self) -> str:
        return (
            f'{type(self).__name__}({self.regex.pattern!r}, '
            f'keys={self.keys!r}'
        )

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None

        parts = self.regex.split(value)

        if not self.keys:
            return parts

        # With keys, the split may have at most len(keys) items; shorter
        # splits are padded with None.
        parts = self._filter(parts, MaxLength(len(self.keys)))
        if self._has_errors:
            return None
        return OrderedDict(zip_longest(self.keys, parts))


class Strip(BaseFilter):
    """Strip leading/trailing characters matching a regex (default:
    control chars + whitespace, ``[\\p{C}\\s]+``)."""

    def __init__(
        self,
        leading: str = r'[\p{C}\s]+',
        trailing: str = r'[\p{C}\s]+',
    ) -> None:
        super().__init__()
        self.leading = (
            _regex.compile(f'^{leading}', _regex.UNICODE) if leading else None
        )
        self.trailing = (
            _regex.compile(f'{trailing}$', _regex.UNICODE) if trailing else None
        )

    def __str__(self) -> str:
        return (
            f'{type(self).__name__}(leading={self.leading.pattern!r}, '
            f'trailing={self.trailing.pattern!r})'
        )

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type(str))
        if self._has_errors:
            return None
        if self.leading:
            value = self.leading.sub('', value)
        if self.trailing:
            value = self.trailing.sub('', value)
        return value


# Matches runs of non-printable characters, excluding whitespace such as
# newlines (double negative so '\n' survives normalization).
_NON_PRINTABLE = _regex.compile(r'[^\P{C}\s]+', _regex.UNICODE)


class Unicode(BaseFilter):
    """Coerce any value to str, optionally normalizing the result.

    Normalization (on by default): NFC form, remove non-printables,
    convert ``\\r\\n`` / ``\\r`` line endings to ``\\n``.
    """

    CODE_DECODE_ERROR = 'wrong_encoding'

    templates = {
        CODE_DECODE_ERROR: 'This value cannot be decoded using {encoding}.',
    }

    def __init__(self, encoding: str = 'utf-8', normalize: bool = True) -> None:
        super().__init__()
        self.encoding = encoding
        self.normalize = normalize

    def __str__(self) -> str:
        return f'{type(self).__name__}(encoding={self.encoding!r})'

    def _apply(self, value: Any) -> Any:
        try:
            decoded = self._coerce_to_str(value)
        except UnicodeDecodeError:
            return self._invalid_value(
                value=value,
                reason=self.CODE_DECODE_ERROR,
                exc_info=True,
                template_vars={'encoding': self.encoding},
            )

        if not self.normalize:
            return decoded

        return (
            unicodedata.normalize('NFC', _NON_PRINTABLE.sub('', decoded))
            .replace('\r\n', '\n')
            .replace('\r', '\n')
        )

    def _coerce_to_str(self, value: Any) -> str:
        if isinstance(value, str):
            return value
        if isinstance(value, bytes):
            return value.decode(self.encoding)
        if isinstance(value, bool):
            return str(int(value))
        if isinstance(value, (int, float)):
            return str(value)
        if isinstance(value, D):
            # 'f' format avoids scientific notation.
            return format(value, 'f')
        if isinstance(value, Element):
            return _xml_tostring(value, 'utf-8').decode('utf-8')
        if hasattr(value, '__bytes__'):
            return bytes(value).decode(self.encoding)
        return str(value)


class ByteString(Unicode):
    """Coerce to UTF-8-encoded ``bytes`` (not bytearray).

    ``normalize`` defaults to False here (True for :class:`Unicode`).
    """

    def __init__(self, encoding: str = 'utf-8', normalize: bool = False) -> None:
        super().__init__(encoding, normalize)

    def _apply(self, value: Any) -> Any:
        decoded = super()._apply(value)
        # Any valid str encodes cleanly to UTF-8 — no error handling needed.
        return decoded if self._has_errors else decoded.encode('utf-8')


class Uuid(BaseFilter):
    """Interpret the value as a UUID, optionally pinned to one version."""

    CODE_INVALID = 'not_uuid'
    CODE_WRONG_VERSION = 'wrong_version'

    templates = {
        CODE_INVALID: 'This value is not a well-formed UUID.',
        CODE_WRONG_VERSION:
            'v{incoming} UUID not allowed (expected v{expected}).',
    }

    def __init__(self, version: Optional[int] = None) -> None:
        super().__init__()
        self.version = version

    def __str__(self) -> str:
        return f'{type(self).__name__}(version={self.version!r})'

    def _apply(self, value: Any) -> Any:
        value = self._filter(value, Type((str, UUID)))
        if self._has_errors:
            return None

        try:
            parsed = value if isinstance(value, UUID) else UUID(hex=value)
        except ValueError:
            return self._invalid_value(value, self.CODE_INVALID, exc_info=True)

        if self.version not in (None, parsed.version):
            return self._invalid_value(
                value=str(parsed),
                reason=self.CODE_WRONG_VERSION,
                context={
                    'expected': self.version,
                    'incoming': parsed.version,
                },
            )
        return parsed
