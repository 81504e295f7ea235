"""Entry-point extension loading (reference test/extensions_test.py model).

Builds a real dist-info on sys.path exposing a filter under the
``filters_ray.extensions`` group and checks it materializes on the
registry (and composes into chains, including the vector path).
"""

from __future__ import annotations

import sys
import textwrap

import pytest

import filters_ray as f
from filters_ray.functions.extensions import FilterExtensionRegistry


@pytest.fixture
def fake_dist(tmp_path):
    pkg_dir = tmp_path / 'pkgs'
    pkg_dir.mkdir()

    (pkg_dir / 'myext_filters.py').write_text(textwrap.dedent('''
        import filters_ray as f

        class Shout(f.BaseFilter):
            """Third-party demo filter: upper-case strings."""
            def _apply(self, value):
                return self._filter(value, f.Type(str)).upper() \\
                    if not self._has_errors else None
    '''))

    dist_info = pkg_dir / 'myext-1.0.dist-info'
    dist_info.mkdir()
    (dist_info / 'METADATA').write_text('Metadata-Version: 2.1\nName: myext\nVersion: 1.0\n')
    (dist_info / 'entry_points.txt').write_text(
        '[filters_ray.extensions]\nShout = myext_filters:Shout\n',
    )
    (dist_info / 'RECORD').write_text('')

    sys.path.insert(0, str(pkg_dir))
    try:
        yield
    finally:
        sys.path.remove(str(pkg_dir))
        sys.modules.pop('myext_filters', None)


def test_entry_point_discovery(fake_dist):
    registry = FilterExtensionRegistry()
    assert registry.Shout().apply('abc') == 'ABC'
    assert 'Shout' in dir(registry)
    assert len(registry) >= 1


def test_extension_composes_into_chain(fake_dist):
    registry = FilterExtensionRegistry()
    chain = f.Unicode | registry.Shout | f.MaxLength(5)
    runner = f.FilterRunner(chain, 'hey')
    assert runner.cleaned_data == 'HEY'

    # And through the vector compiler (scalar fallback kernel).
    import pyarrow as pa

    from filters_ray.vector import compile_chain
    out, errors = compile_chain(f.Unicode | registry.Shout()).apply_column(
        pa.array(['a', None, 'bc']),
    )
    assert out.to_pylist() == ['A', None, 'BC']
    assert not any(errors.codes_per_row())


def test_legacy_module_scan_loader(tmp_path, monkeypatch):
    """Legacy loader (reference extensions.py:142-207): an entry point
    naming a MODULE registers every concrete BaseFilter subclass in it,
    with a one-time DeprecationWarning."""
    import types
    import warnings

    from filters_ray.functions import extensions as ext_mod
    from filters_ray.functions.extensions import iter_filters_in

    mod = types.ModuleType('legacy_ext_filters')

    class Shout(f.BaseFilter):
        def _apply(self, value):
            return value

    class Whisper(f.BaseFilter):
        def _apply(self, value):
            return value

    mod.Shout = Shout
    mod.Whisper = Whisper
    mod.not_a_filter = 42
    mod.BaseFilter = f.BaseFilter  # abstract → skipped

    monkeypatch.setattr(ext_mod, 'legacy_warned', False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        found = dict(iter_filters_in(mod))
    assert found == {'Shout': Shout, 'Whisper': Whisper}
    assert any(issubclass(w.category, DeprecationWarning) for w in caught)

    # Warned exactly once across calls.
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter('always')
        dict(iter_filters_in(mod))
    assert not any(issubclass(w.category, DeprecationWarning) for w in again)

    # A class entry point yields itself; junk yields nothing.
    assert dict(iter_filters_in(Shout)) == {'Shout': Shout}
    assert dict(iter_filters_in(42)) == {}


def test_legacy_loader_via_registry(monkeypatch):
    """The registry routes non-filter entry-point targets through the
    legacy module scan."""
    import types

    from filters_ray.functions import extensions as ext_mod

    mod = types.ModuleType('legacy_reg_filters')

    class Echo(f.BaseFilter):
        def _apply(self, value):
            return value

    mod.Echo = Echo

    class FakeEp:
        name = 'legacy_reg_filters'

        @staticmethod
        def load():
            return mod

    monkeypatch.setattr(ext_mod, 'legacy_warned', True)
    monkeypatch.setattr(ext_mod, 'entry_points', lambda group: [FakeEp()])
    reg = FilterExtensionRegistry()
    assert reg.Echo is Echo
    assert len(reg) == 1
