"""Sources: deterministic synthesizers + parquet IO helpers."""

from .synth import LANGS, SynthConfig, make_events, write_events_parquet

__all__ = ['LANGS', 'SynthConfig', 'make_events', 'write_events_parquet']
