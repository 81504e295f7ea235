"""Entry-point plugin registry for third-party filters.

Clean-room port of the semantics in SURVEY.md §2.6
(reference: /root/reference/filters/extensions.py). Third-party packages
register filter classes under the ``filters_ray.extensions`` entry-point
group; they become available as attributes of ``filters_ray.ext``.

Engine note: registered filters may also provide a vectorized
``apply_column`` (see :mod:`filters_ray.vector`) which the batch compiler
picks up automatically.
"""

from __future__ import annotations

import logging
from importlib.metadata import entry_points
from typing import Any, Dict

from .base import BaseFilter

__all__ = [
    'FilterExtensionRegistry',
    'GROUP_NAME',
    'is_filter_type',
    'iter_filters_in',
]

GROUP_NAME = 'filters_ray.extensions'

logger = logging.getLogger(__name__)

#: Ensures the legacy-loader deprecation warning is only shown once.
legacy_warned = False


def is_filter_type(target) -> 'bool | str':
    """``True`` if ``target`` can register as a filter, else the reason
    string (reference extensions.py:120-139)."""
    import inspect

    if not inspect.isclass(target):
        return 'not a class'
    if not issubclass(target, BaseFilter):
        return 'does not extend BaseFilter'
    if inspect.isabstract(target):
        return 'abstract class'
    return True


def iter_filters_in(target):
    """Legacy module-scan extension loader (reference
    extensions.py:142-207): an entry point that names a MODULE instead of
    a filter class yields every concrete ``BaseFilter`` subclass found in
    it, keyed by class name. Deprecated (warns once) — declare one entry
    point per filter class instead."""
    import inspect
    from warnings import warn

    global legacy_warned
    if not legacy_warned:
        # Flag first, in case the caller has simplefilter('error') set.
        legacy_warned = True
        warn(
            'Legacy extension loader is deprecated; declare one entry '
            'point per filter class instead.',
            DeprecationWarning,
        )

    ift = is_filter_type(target)
    if ift is True:
        logger.debug('Registering extension filter %s.%s',
                     target.__module__, target.__name__)
        yield target.__name__, target
    elif inspect.ismodule(target):
        for member_name, member in inspect.getmembers(target):
            member_ift = is_filter_type(member)
            if member_ift is True:
                logger.debug('Registering extension filter %s.%s',
                             member.__module__, member.__name__)
                yield member.__name__, member
            else:
                logger.debug('Ignoring %s.%s (%s)',
                             target.__name__, member_name, member_ift)
    else:
        logger.debug('Ignoring %r (%s)', target, ift)


class FilterExtensionRegistry:
    """Lazy attribute-access registry over an entry-point group."""

    def __init__(self, group: str = GROUP_NAME) -> None:
        self._group = group
        self._cache: Dict[str, type] = {}
        self._loaded = False

    def _ensure_loaded(self) -> None:
        if self._loaded:
            return
        self._loaded = True
        try:
            eps = entry_points(group=self._group)
        except TypeError:
            # Older importlib.metadata API (pre-3.10 selectable entry points).
            eps = entry_points().get(self._group, [])  # type: ignore[union-attr]
        for ep in eps:
            try:
                target = ep.load()
            except Exception:  # noqa: BLE001 — a broken plugin must not kill the host
                logger.exception('Unable to load extension filter %r', ep.name)
                continue
            if is_filter_type(target) is True:
                if ep.name in self._cache:
                    logger.warning(
                        'Duplicate extension filter name %r; keeping first.',
                        ep.name,
                    )
                    continue
                self._cache[ep.name] = target
            else:
                # Legacy loader: entry point names a module — scan it.
                for name, cls in iter_filters_in(target):
                    if name in self._cache:
                        logger.warning(
                            'Duplicate extension filter name %r; keeping first.',
                            name,
                        )
                        continue
                    self._cache[name] = cls

    def __getattr__(self, name: str) -> Any:
        self._ensure_loaded()
        try:
            return self._cache[name]
        except KeyError:
            raise AttributeError(name) from None

    def __dir__(self):
        self._ensure_loaded()
        return sorted(set(super().__dir__()) | set(self._cache))

    def __len__(self) -> int:
        self._ensure_loaded()
        return len(self._cache)

    def register(self, name: str, filter_type: type) -> None:
        """Programmatic registration (used by tests and in-process plugins)."""
        if not (isinstance(filter_type, type) and issubclass(filter_type, BaseFilter)):
            raise TypeError(f'{filter_type!r} is not a BaseFilter subclass.')
        self._cache[name] = filter_type
