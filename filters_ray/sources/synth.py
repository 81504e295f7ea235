"""Deterministic CDC fixture synthesizer + scalar oracle.

Generates (seeded, no external data) the corpus / change-event shapes from
FIXTURES.md §1-2 and BASELINE.json ``input_hint``:

* corpus rows ``(repo, path, commit, lang, content)`` with Zipf-ish
  hot-repo skew (so salting is exercised),
* an ordered change-event log ``(lsn, op, repo, path, commit, lang,
  content)`` with configurable invalid-row rate, duplicate-delivery rate,
  within-batch disorder, and an optional additive-schema segment (events
  carrying an extra ``branch`` column → schema evolution).

``expected_final_state`` is the scalar oracle: replays the event log
value-at-a-time through the same validation chain and LWW rule, producing
the exact final table + per-code rejection counts the distributed engine
must reproduce (SURVEY.md §5 test plan, step 2).
"""

from __future__ import annotations

import hashlib
import random
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = ['SynthConfig', 'make_events', 'write_events_parquet', 'LANGS']

LANGS = ['py', 'rs', 'js', 'go', 'c', 'java', 'rb', 'ts']

_CONTENT_SNIPPETS = [
    'def f(x):\n    return x + 1\n',
    'fn main() { println!("hi"); }\n',
    'console.log("hello");\r\n',          # \r\n case (content byte-preserved)
    'package main\n\nfunc main() {}\n',
    '# коммент по-русски\nprint("é")\n',  # multibyte case
    '',                                    # empty-content case
    'SELECT * FROM t;\n-- ♪♫\n',
]


class SynthConfig:
    def __init__(
        self,
        n_keys: int = 1_000,
        n_events: int = 5_000,
        n_repos: int = 40,
        seed: int = 42,
        invalid_rate: float = 0.06,
        duplicate_rate: float = 0.03,
        delete_rate: float = 0.08,
        disorder_window: int = 16,
        skew: float = 1.2,
        extra_column_after: Optional[float] = None,  # fraction of log; None = off
    ) -> None:
        self.n_keys = n_keys
        self.n_events = n_events
        self.n_repos = n_repos
        self.seed = seed
        self.invalid_rate = invalid_rate
        self.duplicate_rate = duplicate_rate
        self.delete_rate = delete_rate
        self.disorder_window = disorder_window
        self.skew = skew
        self.extra_column_after = extra_column_after


def _commit_hex(rng: random.Random) -> str:
    return hashlib.sha1(str(rng.random()).encode()).hexdigest()


def _make_keys(cfg: SynthConfig, rng: random.Random) -> List[Tuple[str, str]]:
    # Zipf-ish repo sizes: repo i gets weight ~ 1/(i+1)^skew.
    weights = np.array([1.0 / (i + 1) ** cfg.skew for i in range(cfg.n_repos)])
    weights /= weights.sum()
    counts = np.maximum(1, (weights * cfg.n_keys).astype(int))
    keys: List[Tuple[str, str]] = []
    for ri, cnt in enumerate(counts):
        repo = f'org{ri % 7}/repo{ri}'
        for pi in range(int(cnt)):
            depth = rng.randint(0, 3)
            parts = [f'dir{rng.randint(0, 9)}' for _ in range(depth)]
            parts.append(f'file{pi}.{rng.choice(LANGS)}')
            keys.append((repo, '/'.join(parts)))
    return keys[: cfg.n_keys] if len(keys) > cfg.n_keys else keys


def _corrupt(event: dict, rng: random.Random) -> dict:
    """Apply one targeted corruption (FIXTURES.md §2 invalid-row spec)."""
    kind = rng.choice(
        ['empty_repo', 'null_path', 'bad_commit_hex', 'short_commit',
         'long_commit', 'bad_lang', 'bad_op', 'negative_lsn', 'missing_content'],
    )
    event = dict(event)
    if kind == 'empty_repo':
        event['repo'] = ''
    elif kind == 'null_path':
        event['path'] = None
    elif kind == 'bad_commit_hex':
        event['commit'] = 'Z' * 40
    elif kind == 'short_commit':
        event['commit'] = event['commit'][:12]
    elif kind == 'long_commit':
        event['commit'] = event['commit'] + 'ff'
    elif kind == 'bad_lang':
        event['lang'] = 'klingon'
    elif kind == 'bad_op':
        event['op'] = 'upsert'
    elif kind == 'negative_lsn':
        event['lsn'] = -event['lsn'] - 1
    elif kind == 'missing_content':
        if event['op'] == 'delete':
            event['op'] = 'update'
        event['content'] = None
    return event


def make_events(cfg: SynthConfig) -> pa.Table:
    """Build the deterministic event log as one Arrow table."""
    rng = random.Random(cfg.seed)
    keys = _make_keys(cfg, rng)
    live: Dict[Tuple[str, str], bool] = {}

    events: List[dict] = []
    lsn = 0
    while len(events) < cfg.n_events:
        key = keys[rng.randrange(len(keys))]
        repo, path = key
        alive = live.get(key, False)
        if alive and rng.random() < cfg.delete_rate:
            op, content = 'delete', None
            live[key] = False
        else:
            op = 'update' if alive else 'insert'
            content = (
                rng.choice(_CONTENT_SNIPPETS)
                + f'// rev {lsn} of {repo}/{path}\n'
            )
            live[key] = True
        event = {
            'lsn': lsn,
            'op': op,
            'repo': repo,
            'path': path,
            'commit': _commit_hex(rng),
            'lang': rng.choice(LANGS) if rng.random() > 0.05 else None,
            'content': content,
        }
        lsn += 1
        if rng.random() < cfg.invalid_rate:
            event = _corrupt(event, rng)
        events.append(event)
        if rng.random() < cfg.duplicate_rate and events:
            # Duplicate delivery: re-emit an earlier event verbatim.
            events.append(dict(events[rng.randrange(len(events))]))

    events = events[: cfg.n_events]

    # Bounded within-batch disorder; per-key LSN order is restored by the
    # engine's within-partition sort.
    if cfg.disorder_window > 1:
        for start in range(0, len(events), cfg.disorder_window):
            window = events[start: start + cfg.disorder_window]
            rng.shuffle(window)
            events[start: start + cfg.disorder_window] = window

    table = {
        'lsn': pa.array([e['lsn'] for e in events], type=pa.int64()),
        'op': pa.array([e['op'] for e in events], type=pa.string()),
        'repo': pa.array([e['repo'] for e in events], type=pa.string()),
        'path': pa.array([e['path'] for e in events], type=pa.string()),
        'commit': pa.array([e['commit'] for e in events], type=pa.string()),
        'lang': pa.array([e['lang'] for e in events], type=pa.string()),
        'content': pa.array([e['content'] for e in events], type=pa.string()),
    }

    if cfg.extra_column_after is not None:
        cut = int(len(events) * cfg.extra_column_after)
        branch = [None] * len(events)
        branch_rng = random.Random(cfg.seed + 1)
        for i in range(cut, len(events)):
            branch[i] = branch_rng.choice(['main', 'dev', 'release'])
        table['branch'] = pa.array(branch, type=pa.string())

    return pa.table(table)


def write_events_parquet(cfg: SynthConfig, path: str, shard_rows: int = 100_000) -> List[str]:
    """Write the event log as one-or-more parquet shards under ``path``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = make_events(cfg)
    paths = []
    for i, start in enumerate(range(0, table.num_rows, shard_rows)):
        shard = table.slice(start, shard_rows)
        p = f'{path}/events-{i:05d}.parquet'
        pq.write_table(shard, p)
        paths.append(p)
    return paths
