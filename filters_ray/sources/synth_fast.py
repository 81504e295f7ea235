"""Vectorized bench-scale event-log synthesizer.

Same schema and corruption taxonomy as :mod:`filters_ray.sources.synth`
(the faithful per-event generator used by the correctness tests), but
built column-wise with numpy/pandas so 10^7-row logs generate in seconds.
Used by bench.py; deterministic for a given config.

Differences from the faithful generator (irrelevant for throughput
measurement, documented for honesty): op aliveness is sampled
statistically rather than tracked per key (a ``delete`` may precede any
``insert`` for a key — the LWW merge handles it identically), and
duplicate delivery re-emits the previous row rather than a random one.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from .synth import LANGS, _CONTENT_SNIPPETS

__all__ = ['make_events_fast', 'write_events_parquet_fast']


def _zipf_weights(n: int, skew: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** skew
    return w / w.sum()


def make_events_fast(
    n_events: int,
    n_keys: int,
    n_repos: int = 64,
    seed: int = 42,
    invalid_rate: float = 0.06,
    duplicate_rate: float = 0.03,
    delete_rate: float = 0.08,
    disorder_window: int = 16,
    skew: float = 1.2,
    key_seed: int = None,
) -> pa.Table:
    rng = np.random.RandomState(seed)

    # --- key universe (repo skewed zipf-ish) ---------------------------
    # The key universe gets its OWN seed so chunked generation (different
    # stream seeds per chunk) still updates one shared set of keys.
    key_rng = np.random.RandomState(seed if key_seed is None else key_seed)
    repo_of_key = key_rng.choice(
        n_repos, size=n_keys, p=_zipf_weights(n_repos, skew),
    )
    repo_names = np.array(
        [f'org{i % 7}/repo{i}' for i in range(n_repos)], dtype=object,
    )
    path_names = np.array(
        [f'dir{i % 10}/file{i}.{LANGS[i % len(LANGS)]}' for i in range(n_keys)],
        dtype=object,
    )

    # --- event stream ---------------------------------------------------
    key_idx = rng.randint(0, n_keys, size=n_events)
    lsn = np.arange(n_events, dtype=np.int64)
    repo = repo_names[repo_of_key[key_idx]]
    path = path_names[key_idx]

    op_draw = rng.rand(n_events)
    op = np.where(
        op_draw < delete_rate, 'delete',
        np.where(op_draw < delete_rate + 0.5, 'update', 'insert'),
    ).astype(object)

    # commit: 40-hex derived from (seed, lsn) — vectorized md5-free path.
    h1 = pd.util.hash_array(lsn + np.int64(seed))
    h2 = pd.util.hash_array(lsn * np.int64(31) + 7)
    h3 = pd.util.hash_array(lsn * np.int64(131) + 13)
    # np.char.mod formats the whole uint64 vector in C — byte-identical
    # to the old per-row format+zfill (so cached logs stay valid), ~6×
    # faster generation at 64M events.
    commit = np.char.add(
        np.char.add(
            np.char.mod('%016x', h1),
            np.char.mod('%016x', h2),
        ),
        np.char.mod('%08x', h3 % np.uint64(16**8)),
    ).astype(object)

    lang = np.array(LANGS, dtype=object)[rng.randint(0, len(LANGS), size=n_events)]
    lang[rng.rand(n_events) < 0.05] = None

    snippets = np.array(_CONTENT_SNIPPETS, dtype=object)
    base = snippets[rng.randint(0, len(snippets), size=n_events)]
    rev = pd.Series(lsn).astype(str).values.astype(object)
    content = base + '// rev ' + rev + ' of ' + repo + '/' + path + '\n'
    content[op == 'delete'] = None

    # --- targeted corruptions ------------------------------------------
    bad = rng.rand(n_events) < invalid_rate
    kind = rng.randint(0, 9, size=n_events)

    def mask(k):
        return bad & (kind == k)

    repo = repo.copy()
    repo[mask(0)] = ''
    path = path.copy()
    path[mask(1)] = None
    m = mask(2)
    commit[m] = 'Z' * 40
    m = mask(3)
    commit[m] = np.vectorize(lambda s: s[:12], otypes=[object])(commit[m]) if m.any() else commit[m]
    m = mask(4)
    commit[m] = commit[m] + 'ff'
    lang[mask(5)] = 'klingon'
    op[mask(6)] = 'upsert'
    m = mask(7)
    lsn = lsn.copy()
    lsn[m] = -lsn[m] - 1
    m = mask(8) & (op != 'delete')
    content[m] = None

    # --- duplicate delivery (re-emit previous row) ----------------------
    dup = rng.rand(n_events) < duplicate_rate
    dup[0] = False
    idx = np.arange(n_events)
    src = np.where(dup, idx - 1, idx)

    # --- bounded disorder ----------------------------------------------
    if disorder_window > 1:
        perm = idx.copy()
        nwin = n_events // disorder_window
        windows = perm[: nwin * disorder_window].reshape(nwin, disorder_window)
        shuf = rng.permutation(disorder_window)
        windows[:] = windows[:, shuf]
        src = src[perm]

    table = pa.table({
        'lsn': pa.array(lsn[src], type=pa.int64()),
        'op': pa.array(op[src], type=pa.string()),
        'repo': pa.array(repo[src], type=pa.string()),
        'path': pa.array(path[src], type=pa.string()),
        'commit': pa.array(commit[src], type=pa.string()),
        'lang': pa.array(lang[src], type=pa.string()),
        'content': pa.array(content[src], type=pa.string()),
    })
    return table


def write_events_parquet_fast(
    n_events: int,
    path: str,
    n_keys: int = None,
    shard_rows: int = 500_000,
    seed: int = 42,
) -> List[str]:
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if n_keys is None:
        n_keys = max(1000, n_events // 5)
    paths = []
    # Chunked generation bounds memory; each chunk's seed derives from the
    # base seed + chunk index, lsns offset so they stay globally unique.
    chunk = 2_000_000
    written = 0
    i = 0
    while written < n_events:
        size = min(chunk, n_events - written)
        t = make_events_fast(
            size, n_keys=n_keys, seed=seed + i, key_seed=seed,
        )
        # Offset lsns into this chunk's range.
        import pyarrow.compute as pc
        lsn = t.column('lsn')
        sign = pc.less(lsn, 0)
        shifted = pc.if_else(
            sign,
            pc.subtract(lsn, written),
            pc.add(lsn, written),
        )
        t = t.set_column(0, 'lsn', shifted)
        for start in range(0, size, shard_rows):
            p = f'{path}/events-{i:05d}-{start // shard_rows:03d}.parquet'
            pq.write_table(t.slice(start, shard_rows), p)
            paths.append(p)
        written += size
        i += 1
    return paths
