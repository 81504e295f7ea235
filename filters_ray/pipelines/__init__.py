"""End-to-end pipelines: CDC upsert, dedup, similarity, text analysis."""

from .cdc import CDCPipeline, RunReport, cdc_validator_spec, key_partition

__all__ = ['CDCPipeline', 'RunReport', 'cdc_validator_spec', 'key_partition']
