"""Ray Data batch stages."""

from .cogroup import hash_bucket_join
from .topk import grouped_top_k
from .validate import (
    ERRORS_COLUMN,
    ORIGINAL_COLUMN,
    RecordValidator,
    ValidateStage,
    errors_type,
    split_clean_dlq,
)

__all__ = [
    'ERRORS_COLUMN',
    'grouped_top_k',
    'hash_bucket_join',
    'ORIGINAL_COLUMN',
    'RecordValidator',
    'ValidateStage',
    'errors_type',
    'split_clean_dlq',
]
