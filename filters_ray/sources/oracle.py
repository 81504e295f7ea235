"""Scalar oracle: value-at-a-time replay of the CDC log.

Independent of the Ray/vector path: applies the *scalar* FilterMapper
(reference semantics, SURVEY.md §3) row by row, then last-writer-wins by
``(repo, path)`` on lsn. The distributed engine must reproduce this final
state exactly — sha256(content) per key and rejection counts per code
(BASELINE.md correctness gates).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, Optional, Tuple

import pyarrow as pa

__all__ = ['replay_oracle', 'OracleResult', 'final_state_digests']


class OracleResult:
    def __init__(self) -> None:
        # key -> cleaned row dict (with 'last_lsn')
        self.state: Dict[Tuple[str, str], dict] = {}
        self.rejected_by_code: Dict[str, int] = {}
        self.events_applied = 0
        self.events_rejected = 0

    def final_table(self) -> pa.Table:
        rows = sorted(self.state.values(), key=lambda r: (r['repo'], r['path']))
        if not rows:
            return pa.table({})
        cols = sorted({k for r in rows for k in r})
        return pa.table({
            c: [r.get(c) for r in rows] for c in cols
        })

    def sha256_by_key(self) -> Dict[Tuple[str, str], str]:
        return {
            key: hashlib.sha256(
                row['content'] if isinstance(row['content'], bytes)
                else (row['content'] or '').encode()
            ).hexdigest()
            for key, row in self.state.items()
        }


def replay_oracle(
    events: Iterable[dict],
    langs: Optional[Iterable[str]] = None,
) -> OracleResult:
    """Replay events (dicts, in log order) through the scalar chain + LWW."""
    import filters_ray as f
    from ..pipelines.cdc import cdc_validator_spec

    spec = cdc_validator_spec(langs=langs)
    mapper = f.FilterMapper(
        spec['filter_map'],
        allow_missing_keys=spec['allow_missing_keys'],
        allow_extra_keys=spec['allow_extra_keys'],
    )

    result = OracleResult()
    seen_lsns: set = set()
    for event in events:
        # Exactly-once delivery dedup: the raw lsn is the event identity;
        # a re-delivered event (valid or invalid) is processed once.
        raw_lsn = event.get('lsn')
        if raw_lsn is not None and isinstance(raw_lsn, int):
            if raw_lsn in seen_lsns:
                continue
            seen_lsns.add(raw_lsn)
        runner = f.FilterRunner(mapper, event)
        cleaned = runner.cleaned_data
        codes = []
        for key, cs in runner.error_codes.items():
            codes.extend(cs)

        # Cross-column rule (scalar twin of content_required_rule): content
        # is required unless the validated op is 'delete'.
        if cleaned is not None and cleaned.get('op') != 'delete' \
                and cleaned.get('content') is None:
            codes.append('empty')

        if codes:
            result.events_rejected += 1
            for code in codes:
                result.rejected_by_code[code] = result.rejected_by_code.get(code, 0) + 1
            continue

        lsn = cleaned['lsn']
        key = (cleaned['repo'], cleaned['path'])
        current = result.state.get(key)
        current_lsn = current['last_lsn'] if current else -1
        result.events_applied += 1
        if lsn <= current_lsn:
            continue  # older writer (or duplicate delivery) loses
        if cleaned['op'] == 'delete':
            result.state.pop(key, None)
            # Remember tombstone LSN so an older late event cannot revive
            # the key within this replay.
            result.state[key] = {
                'repo': key[0], 'path': key[1], 'last_lsn': lsn,
                'op': 'delete', 'commit': cleaned['commit'],
                'lang': cleaned['lang'], 'content': None,
                '_tombstone': True,
            }
        else:
            row = {
                'repo': key[0],
                'path': key[1],
                'commit': cleaned['commit'],
                'lang': cleaned['lang'],
                'content': cleaned['content'],
                'op': cleaned['op'],
                'last_lsn': lsn,
            }
            for extra_key, extra_val in cleaned.items():
                if extra_key not in row and extra_key != 'lsn':
                    row[extra_key] = extra_val
            result.state[key] = row

    # Drop tombstones from the final state.
    result.state = {
        k: v for k, v in result.state.items() if not v.get('_tombstone')
    }
    for row in result.state.values():
        row.pop('_tombstone', None)
    return result


def final_state_digests(table: pa.Table) -> Dict[Tuple[str, str], str]:
    """sha256(content) per (repo, path) for an engine final table."""
    out: Dict[Tuple[str, str], str] = {}
    if table.num_rows == 0:
        return out
    repo = table.column('repo').to_pylist()
    path = table.column('path').to_pylist()
    content = table.column('content').to_pylist()
    for r, p, c in zip(repo, path, content):
        data = c if isinstance(c, bytes) else (c or '').encode()
        out[(r, p)] = hashlib.sha256(data).hexdigest()
    return out
