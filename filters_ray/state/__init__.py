"""State: manifests, high-watermarks, schema registry."""

from .manifest import ManifestStore, PartitionManifest, TableMeta
from .registry import SchemaRegistry, align_table, widen_schema

__all__ = [
    'ManifestStore',
    'PartitionManifest',
    'SchemaRegistry',
    'TableMeta',
    'align_table',
    'widen_schema',
]
