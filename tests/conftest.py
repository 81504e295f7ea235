"""Shared fixtures: one Ray session per pytest run + reference import."""

from __future__ import annotations

import sys
import types

import pytest


@pytest.fixture(scope='session')
def ray_session():
    """Initialise Ray ONCE for the whole test session (local, 4 CPUs)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address='local',
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level='ERROR',
        )
    try:
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


def load_reference_filters():
    """Import the read-only reference library (/root/reference) for
    differential conformance tests. Returns None when unavailable."""
    if 'filters' in sys.modules:
        return sys.modules['filters']
    try:
        sys.path.insert(0, '/root/reference')

        import pkg_resources

        class _V:
            version = '1.3.2'

        _orig_require = pkg_resources.require
        pkg_resources.require = (
            lambda name: [_V()] if name == 'filters' else _orig_require(name)
        )

        # The reference targets an older `regex`/`re` API.
        import re
        import regex
        if not hasattr(regex, '_pattern_type'):
            regex._pattern_type = type(regex.compile(''))
        if not hasattr(re, '_pattern_type'):
            re._pattern_type = re.Pattern

        # The reference's extension registry needs `class_registry`, which
        # isn't installed; its behavior isn't under differential test.
        if 'class_registry' not in sys.modules:
            stub = types.ModuleType('class_registry')

            class EntryPointClassRegistry:  # noqa: D401 - minimal stub
                def __init__(self, *a, **k):
                    pass

            stub.EntryPointClassRegistry = EntryPointClassRegistry
            sys.modules['class_registry'] = stub

        import filters  # noqa: PLC0415
        return filters
    except Exception:
        return None


@pytest.fixture(scope='session')
def reference():
    ref = load_reference_filters()
    if ref is None:
        pytest.skip('reference library not importable')
    return ref
