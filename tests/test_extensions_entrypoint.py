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
