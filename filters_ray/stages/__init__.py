"""Ray Data batch stages."""

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
    'ORIGINAL_COLUMN',
    'RecordValidator',
    'ValidateStage',
    'errors_type',
    'split_clean_dlq',
]
