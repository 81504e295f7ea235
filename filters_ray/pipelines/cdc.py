"""CDC / incremental-ingest pipeline: change log → validated LWW lake upsert.

The north-star pipeline (BASELINE.json ``north_star``), Ray-Data-first:

    read_parquet(events)                               # ordered change log
      → map_batches(ValidateStage, pyarrow, zero-copy)  # compiled chains
          # + _part (hash of raw (repo,path) % P) + _raw_lsn columns
      → groupby('_part').map_groups(upsert_partition)   # THE one shuffle
          # per partition: watermark drop → clean/DLQ split → LWW merge
          # with base partition → atomic commit (data + manifest + DLQ)
      → per-partition summaries (tiny) → run report

Scale design (SURVEY.md §4):

* **Exactly one shuffle** — the hash exchange on ``_part``. The partition
  key is the *full* ``(repo, path)`` hash, strictly finer than ``repo``:
  a hot repo's files spread uniformly over partitions, which is the
  salted-repartition requirement solved structurally. ``num_partitions``
  is pinned in ``_meta.json`` so every replay reshuffles identically.
* **Partition-local merge** — the base table is partitioned by the same
  key, so the LWW merge never joins across partitions.
* **Delta commits** — a micro-batch appends ONE sorted delta file per
  touched partition instead of rewriting its base (write amplification
  O(batch), not O(partition)); readers merge-on-read (base ∪ manifest-
  listed deltas, LWW, tombstones dropped) and the partition compacts
  back into a single base every ``compact_every`` deltas.
* **Exactly-once** — per-partition high-watermark manifests with atomic
  rename commits (see :mod:`filters_ray.state.manifest`); replayed events
  with ``lsn <= hwm`` are dropped before merging, so resuming from any
  checkpoint (or replaying the whole log) reproduces the identical table.
  Delivery contract (standard CDC source semantics): within one delivered
  batch, disorder is unbounded (the per-partition sort restores per-key
  LSN order), but across batch boundaries the source must not introduce a
  *new* event at or below an already-delivered LSN — re-deliveries
  (duplicates) are fine and are dropped/deduplicated by identity.
* **Schema evolution** — additive columns arriving on events (allowed
  "extra keys", reference complex.py:306-315) widen the partition schema
  via :func:`filters_ray.state.registry.widen_schema`.
* **Content bytes preserved** — ``content`` goes through
  ``ByteString(normalize=False)`` only (no normalizing Unicode), keeping
  ``sha256(content)`` invariant per ``(repo, path)``.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.synth import LANGS
from ..state.manifest import (
    CommitConflictError,
    ManifestStore,
    PartitionManifest,
    TableMeta,
)
from ..state.registry import align_table, widen_schema
from ..stages.validate import (
    ERRORS_COLUMN,
    ORIGINAL_COLUMN,
    RecordValidator,
)

__all__ = [
    'CDCPipeline',
    'RunReport',
    'cdc_validator_spec',
    'key_partition',
]

PART_COLUMN = '_part'
RAW_LSN_COLUMN = '_raw_lsn'

OPS = {'insert', 'update', 'delete'}


def cdc_validator_spec(
    langs: Optional[Iterable[str]] = None,
    allow_extra_keys: Union[bool, Iterable[str]] = True,
) -> dict:
    """The default CDC validation chain (FIXTURES.md §5)."""
    import filters_ray as f
    from ..functions.engine_filters import First, content_required_rule

    lang_choices = set(langs if langs is not None else LANGS) | {''}
    return {
        'filter_map': {
            'lsn': f.Required | f.Int | f.Min(0),
            'op': f.Required | f.Unicode | f.Choice(choices=OPS),
            'repo': f.Required | f.Unicode | f.Strip | f.NotEmpty | f.MaxLength(256),
            'path': f.Required | f.Unicode | f.NotEmpty | f.MaxLength(4096),
            # Regex returns the list of matches; First unwraps to the str.
            'commit': f.Required | f.Unicode | f.Regex(r'^[0-9a-f]{40}$') | First(),
            'lang': f.Unicode | f.Optional('') | f.Choice(choices=lang_choices),
            # Byte-preserving: sha256(content) equality forbids normalization.
            'content': f.ByteString(normalize=False),
        },
        'allow_missing_keys': False,
        'allow_extra_keys': allow_extra_keys,
        'row_rules': [content_required_rule()],
    }


def key_partition(repo: pa.Array, path: pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic hash partition of the raw (repo, path) key.

    Each column is SipHashed independently (pandas ``hash_array``, fixed
    default key — stable across processes and nodes, vectorized in C) and
    the two 64-bit hashes are mixed; no per-row Python string join
    (VERDICT r1 #9).
    """
    repo_np = np.asarray(repo.to_numpy(zero_copy_only=False), dtype=object)
    path_np = np.asarray(path.to_numpy(zero_copy_only=False), dtype=object)
    h_repo = pd.util.hash_array(repo_np, categorize=False)
    h_path = pd.util.hash_array(path_np, categorize=False)
    mixed = (h_repo * np.uint64(0x9E3779B97F4A7C15)) ^ h_path
    return (mixed % np.uint64(num_partitions)).astype(np.int64)


class CDCValidateStage:
    """map_batches callable: validation + partition/raw-lsn assignment.

    Compiles the chain set once per actor (``__init__``), then per batch:
    computes ``_part`` and ``_raw_lsn`` from the *raw* columns (errored
    rows must still route deterministically), then validates.
    """

    def __init__(
        self,
        num_partitions: int,
        langs: Optional[List[str]] = None,
        allow_extra_keys: Union[bool, List[str]] = True,
    ) -> None:
        self.num_partitions = num_partitions
        self.validator = RecordValidator(
            **cdc_validator_spec(langs=langs, allow_extra_keys=allow_extra_keys),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw_lsn = batch.column('lsn').combine_chunks()
        if not pa.types.is_integer(raw_lsn.type):
            raw_lsn = pa.nulls(batch.num_rows, type=pa.int64())
        elif raw_lsn.type != pa.int64():
            raw_lsn = raw_lsn.cast(pa.int64())

        out = self.validator.validate_table(batch)

        # Partition on the VALIDATED key (Strip may canonicalize `repo`;
        # two raw spellings of one key must land in one partition), falling
        # back to the raw value for rows whose key failed validation (DLQ
        # rows only need a deterministic home).
        def merged_key(name: str) -> pa.Array:
            validated = out.column(name).combine_chunks()
            raw = batch.column(name).combine_chunks()
            if not pa.types.is_string(raw.type):
                raw = pa.nulls(batch.num_rows, type=pa.string())
            return pc.coalesce(validated, raw)

        parts = key_partition(
            merged_key('repo'), merged_key('path'), self.num_partitions,
        )
        out = out.append_column(PART_COLUMN, pa.array(parts, type=pa.int64()))
        out = out.append_column(RAW_LSN_COLUMN, raw_lsn)
        # Metadata-bearing schemas are unhashable (dict) and break Ray's
        # schema-dedup fast path at the shuffle — strip before the exchange.
        return out.replace_schema_metadata(None)


# Per-worker-process cache of compiled validators (compiled chains hold
# weakrefs and cannot be pickled; each worker builds its own, once).
_VALIDATOR_CACHE: dict = {}


def _make_validate_fn(num_partitions, langs, allow_extra_keys):
    langs_key = tuple(langs) if langs is not None else None
    extra_key = (
        tuple(sorted(allow_extra_keys))
        if isinstance(allow_extra_keys, (set, frozenset, list, tuple))
        else bool(allow_extra_keys)
    )
    cache_key = (num_partitions, langs_key, extra_key)

    def validate(batch: pa.Table) -> pa.Table:
        stage = _VALIDATOR_CACHE.get(cache_key)
        if stage is None:
            stage = CDCValidateStage(
                num_partitions=num_partitions,
                langs=list(langs_key) if langs_key is not None else None,
                allow_extra_keys=(
                    set(extra_key) if isinstance(extra_key, tuple) else extra_key
                ),
            )
            _VALIDATOR_CACHE[cache_key] = stage
        return stage(batch)

    return validate


@dataclass
class RunReport:
    events_seen: int = 0
    events_applied: int = 0
    events_skipped: int = 0
    rejected_by_code: Dict[str, int] = field(default_factory=dict)
    partitions: int = 0
    lake_rows: int = 0

    def merge_row(self, row: dict) -> None:
        self.events_seen += row['events_seen']
        self.events_applied += row['events_applied']
        self.events_skipped += row['events_skipped']
        for code, cnt in json.loads(row['rejected_by_code']).items():
            self.rejected_by_code[code] = self.rejected_by_code.get(code, 0) + cnt
        self.partitions += 1
        self.lake_rows += row['lake_rows']


# ---------------------------------------------------------------------------
# partition upsert (runs inside the post-shuffle task)
# ---------------------------------------------------------------------------


_SUMMARY_SCHEMA = {
    'partition_id': pa.int64(),
    'events_seen': pa.int64(),
    'events_applied': pa.int64(),
    'events_skipped': pa.int64(),
    'lake_rows': pa.int64(),
    'rejected_by_code': pa.string(),
}


def _summary_row(pid, seen, applied, skipped, lake_rows, rejected) -> pa.Table:
    return pa.table({
        'partition_id': pa.array([pid], type=pa.int64()),
        'events_seen': pa.array([seen], type=pa.int64()),
        'events_applied': pa.array([applied], type=pa.int64()),
        'events_skipped': pa.array([skipped], type=pa.int64()),
        'lake_rows': pa.array([lake_rows], type=pa.int64()),
        'rejected_by_code': pa.array([json.dumps(rejected, sort_keys=True)]),
    })


def _dlq_counts(table: pa.Table) -> Dict[str, int]:
    """Per-code rejection counts, vectorized (list_flatten + value_counts)."""
    entries = table.column(ERRORS_COLUMN)
    if isinstance(entries, pa.ChunkedArray):
        entries = entries.combine_chunks()
    flat = pc.list_flatten(entries)
    if len(flat) == 0:
        return {}
    vc = pc.value_counts(flat.field('code'))
    return dict(zip(
        vc.field('values').to_pylist(),
        (int(c) for c in vc.field('counts').to_pylist()),
    ))


def _dedup_by_lsn(table: pa.Table) -> pa.Table:
    """Keep the first row per raw lsn (null-lsn rows all kept).

    Exact-integer dedup: a ``to_numpy`` on a nullable int64 column would
    round-trip through float64 (NaN for nulls), where distinct lsns above
    2^53 collide — so nulls are masked out first and ``np.unique`` runs
    over the exact int64 values of the non-null rows only.
    """
    col = table.column(RAW_LSN_COLUMN).combine_chunks()
    null = _as_np_bool(pc.is_null(col))
    nn_idx = np.flatnonzero(~null)
    if nn_idx.size == 0:
        return table
    vals = np.asarray(
        pc.fill_null(col, 0).to_numpy(zero_copy_only=False), dtype=np.int64,
    )[nn_idx]
    _, first = np.unique(vals, return_index=True)
    keep = null.copy()
    keep[nn_idx[first]] = True
    if keep.all():
        return table
    return table.filter(pa.array(keep))


def _as_np_bool(mask: pa.Array) -> np.ndarray:
    return np.asarray(
        pc.fill_null(mask, False).to_numpy(zero_copy_only=False), dtype=bool,
    )


def _canonical_digest(table: pa.Table) -> str:
    """Deterministic digest over the canonical (sorted) partition rows.

    Vectorized: rows are serialized with embedded separators into ONE
    binary column (``binary_join_element_wise``) and the sha256 runs
    over its contiguous values buffer — byte-identical to hashing
    ``repo \\0 path \\0 content lsn \\1`` row by row, with no per-row
    Python (VERDICT r1 hot-loop rule)."""
    h = hashlib.sha256()
    if table.num_rows:
        as_bin = {}
        for name in ('repo', 'path', 'content'):
            col = table.column(name).combine_chunks()
            if pa.types.is_string(col.type):
                col = col.cast(pa.binary())
            elif pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
                col = col.cast(pa.binary())
            as_bin[name] = pc.fill_null(col, b'')
        lsn_bin = pc.fill_null(
            table.column('last_lsn').combine_chunks().cast(pa.string()), 'None',
        ).cast(pa.binary())
        joined = pc.binary_join_element_wise(
            as_bin['repo'], b'\x00', as_bin['path'], b'\x00',
            as_bin['content'], lsn_bin, b'\x01', b'',
        )
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        n = len(joined)
        offs = np.frombuffer(
            joined.buffers()[1], dtype=np.int32, count=joined.offset + n + 1,
        )
        start, end = int(offs[joined.offset]), int(offs[joined.offset + n])
        h.update(memoryview(joined.buffers()[2])[start:end])
    return h.hexdigest()


# Columns sufficient for the LWW/tombstone merge decision (thin reads).
_MERGE_KEY_COLUMNS = ('repo', 'path', 'last_lsn', 'op')

# Optimistic (CAS) commit: attempts before declaring pathological
# contention. Conflicts are per-partition, so even N writers racing one
# hot partition serialize in ~N rounds.
_CAS_MAX_RETRIES = 16


def _ensure_op(table: pa.Table) -> pa.Table:
    """Rows without an op column act as op=NULL records (base semantics)."""
    if 'op' not in table.column_names:
        return table.append_column('op', pa.nulls(table.num_rows, type=pa.string()))
    return table


def _drop_tombstones(latest: pa.Table) -> pa.Table:
    """Filter deleted keys out of an LWW result (order-preserving)."""
    return latest.filter(
        pc.or_kleene(
            pc.is_null(latest.column('op')),
            pc.not_equal(latest.column('op'), pa.scalar('delete')),
        ),
    )


def _merge_partition_tables(tables: List[pa.Table]) -> pa.Table:
    """base ∪ deltas ∪ incoming → canonical live rows.

    Additive schema widening across inputs, last-writer-wins on
    (repo, path, last_lsn), tombstones (op='delete') dropped. ONE sort:
    the LWW (repo, path, last_lsn) sort already leaves the surviving
    (unique-keyed) rows in canonical (repo, path) order, so no second
    sort is needed. Idempotent: re-merging already-merged rows yields
    the identical table (crash-retry safety)."""
    tables = [_ensure_op(t) for t in tables]
    schema = tables[0].schema
    for t in tables[1:]:
        schema, _ = widen_schema(schema, t.schema)
    both = pa.concat_tables([align_table(t, schema) for t in tables])
    return _drop_tombstones(_last_writer_wins(both))


def _concat_widened(tables: List[pa.Table]) -> pa.Table:
    """Concat with additive schema widening across inputs."""
    if not tables:
        return pa.table({})
    schema = tables[0].schema
    for t in tables[1:]:
        schema, _ = widen_schema(schema, t.schema)
    return pa.concat_tables([align_table(t, schema) for t in tables])


def _partition_file_paths(store: ManifestStore, pid: int, manifest) -> List[str]:
    """Base + manifest-LISTED delta paths (unlisted deltas are orphans)."""
    paths = []
    if os.path.exists(store.data_path(pid)):
        paths.append(store.data_path(pid))
    if manifest is not None:
        for name in manifest.deltas:
            p = store.delta_path(pid, name)
            if os.path.exists(p):
                paths.append(p)
    return paths


def _read_partition_tables(
    store: ManifestStore, pid: int, manifest, columns=None,
) -> List[pa.Table]:
    """Read the partition's base + listed deltas, optionally pruned to
    ``columns`` (each file keeps only the columns it actually has)."""
    tables = []
    for path in _partition_file_paths(store, pid, manifest):
        if columns is None:
            tables.append(pq.read_table(path))
        else:
            have = set(pq.read_schema(path).names)
            tables.append(pq.read_table(path, columns=[c for c in columns if c in have]))
    return tables


def _last_writer_wins(table: pa.Table) -> pa.Table:
    """Keep the last row per (repo, path) — max last_lsn, last delivery
    on ties — output in canonical (repo, path) order.

    Fast path (the upsert's CPU hot spot — VERDICT r2 #1, per-row memory
    traffic): EXACT integer group keys via ``dictionary_encode`` (C hash
    tables over the Arrow string buffers — no Python objects), one
    integer ``np.lexsort`` to find each key's winner, then a ``take`` +
    string sort over the SURVIVORS ONLY. The full batch's payload
    columns (content/commit/...) are never gathered or string-sorted —
    only ~state-size rows are. Semantics are identical to the exact
    sort-based path (differential-tested), which remains the fallback
    for null/exotic key or lsn columns.
    """
    if table.num_rows == 0:
        return table
    n = table.num_rows
    repo = table.column('repo').combine_chunks()
    path = table.column('path').combine_chunks()
    lsn = table.column('last_lsn').combine_chunks()
    if (
        repo.null_count or path.null_count or lsn.null_count
        or not (pa.types.is_string(repo.type) or pa.types.is_large_string(repo.type))
        or not (pa.types.is_string(path.type) or pa.types.is_large_string(path.type))
        or not pa.types.is_integer(lsn.type)
    ):
        return _last_writer_wins_sorted(table)
    repo_idx = pc.dictionary_encode(repo).indices.to_numpy().astype(np.int64)
    path_idx = pc.dictionary_encode(path).indices.to_numpy().astype(np.int64)
    if path_idx.size and (
        path_idx.max() >= (1 << 32) or repo_idx.max() >= (1 << 31)
    ):  # pragma: no cover — >4B distinct paths / >2B repos in ONE group
        return _last_writer_wins_sorted(table)
    combined = (repo_idx << np.int64(32)) | path_idx  # exact key id
    lsn_np = np.asarray(
        lsn.cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64,
    )
    order = np.lexsort((lsn_np, combined))
    gs = combined[order]
    run_ends = np.flatnonzero(gs[1:] != gs[:-1])
    winners = order[np.concatenate([run_ends, [n - 1]])]
    out = table.take(pa.array(winners, type=pa.int64()))
    return out.sort_by([('repo', 'ascending'), ('path', 'ascending')])


def _last_writer_wins_sorted(table: pa.Table) -> pa.Table:
    """Exact fallback: full (repo, path, last_lsn) sort, keep last per key."""
    if table.num_rows == 0:
        return table
    table = table.sort_by([
        ('repo', 'ascending'), ('path', 'ascending'), ('last_lsn', 'ascending'),
    ])
    repo = np.asarray(table.column('repo').to_numpy(zero_copy_only=False), dtype=object)
    path = np.asarray(table.column('path').to_numpy(zero_copy_only=False), dtype=object)
    n = len(repo)
    is_last = np.ones(n, dtype=bool)
    same_as_next = (repo[:-1] == repo[1:]) & (path[:-1] == path[1:])
    is_last[:-1] = ~same_as_next
    return table.filter(pa.array(is_last))


def _parse_delta_range(name: str) -> Optional[tuple]:
    """LSN window from a delta/history file name (``delta-<lo>-<hi>.parquet``)
    — the pruning key for changes()/table_as_of() file selection."""
    import re

    m = re.fullmatch(r'delta-(\d+)-(\d+)\.parquet', name)
    if m is None:
        return None
    return int(m.group(1)), int(m.group(2))


def make_upsert_fn(lake_root: str, redrive: bool = False,
                   compact_every: int = 8, retain_history: bool = False,
                   concurrency: str = 'flock'):
    """Build the per-partition map_groups function (closure: picklable).

    ``redrive=True`` is the dead-letter replay mode: the incoming group IS
    the partition's (re-validated) DLQ, so the watermark filter is skipped
    (DLQ'd events never applied, though the watermark passed them) and the
    partition's DLQ directory is REWRITTEN to contain only the rows that
    are still invalid. LWW against the base still protects ordering: a
    redriven event older than the current row loses the merge.

    ``compact_every``: a micro-batch writes ONE sorted delta file per
    touched partition (no base rewrite — VERDICT r2 #5); when the active
    delta list reaches this length the partition compacts back into one
    base file. Redrive always compacts (it must rewrite counts anyway).

    ``retain_history``: every commit also publishes its (within-run
    LWW'd, tombstones kept) delta snapshot under ``part=<p>/history/``
    and lists it in the manifest's ``history`` — the record behind the
    change-data-feed (:meth:`CDCPipeline.changes`) and as-of-LSN time
    travel (:meth:`CDCPipeline.table_as_of`). Commit granularity, like
    Delta Lake CDF: versions a key overwrote *within* one micro-batch
    are collapsed by that batch's LWW.

    ``concurrency``: how concurrent writers into one partition
    serialize (VERDICT r4 #3). ``'flock'`` (default) holds the advisory
    per-partition lock across the whole read-merge-commit cycle —
    correct on one node / POSIX shared filesystems. ``'cas'`` is the
    optimistic path for shared object storage where flock does not
    exist: read-merge runs lock-free, the commit is conditional on the
    ``commit_version`` observed at read time
    (:class:`~filters_ray.state.manifest.CommitConflictError` on a lost
    race), and conflicts re-read + re-merge with bounded retries. The
    commit is version-checked in BOTH modes, so a lost update can never
    be silent.
    """

    if concurrency not in ('flock', 'cas'):
        raise ValueError(f"concurrency must be 'flock' or 'cas', got {concurrency!r}")

    def upsert_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({k: pa.array([], type=v) for k, v in _SUMMARY_SCHEMA.items()})
        store = ManifestStore(lake_root)
        pid = int(group.column(PART_COLUMN)[0].as_py())
        if concurrency == 'cas':
            # Optimistic path for shared object storage where flock
            # does not exist (VERDICT r4 #3): read-merge runs lock-free
            # against a commit_version snapshot, the commit is
            # conditional on that version, and a lost race re-reads and
            # re-merges. FileNotFoundError counts as a conflict too —
            # the winner's compaction may reclaim a delta file mid-read
            # of a doomed attempt.
            import time

            last_exc: Optional[Exception] = None
            for attempt in range(_CAS_MAX_RETRIES):
                try:
                    return _apply_partition(group, store, pid)
                except (CommitConflictError, FileNotFoundError) as exc:
                    last_exc = exc
                    time.sleep(min(0.25, 0.01 * (1 << min(attempt, 4))))
            raise RuntimeError(
                f'partition {pid}: CAS commit lost {_CAS_MAX_RETRIES} '
                f'races in a row — pathological contention',
            ) from last_exc
        # Serialize concurrent writers per partition: the whole
        # read-merge-commit cycle runs under the partition lock, so a
        # second pipeline writing the same lake interleaves cleanly
        # instead of losing updates / tearing the manifest. Intra-run
        # there is no contention (one group task per partition), so the
        # single-writer fast path pays one uncontended flock syscall.
        with store.partition_lock(pid):
            return _apply_partition(group, store, pid)

    def _apply_partition(group: pa.Table, store: ManifestStore, pid: int) -> pa.Table:
        prev = store.read_manifest(pid)
        hwm = prev.hwm_lsn if prev else -1
        # CAS token: the version this merge is computed against. The
        # commit below is conditional on it in BOTH modes — under flock
        # it always matches (the lock serialized us), so the check is a
        # free lost-update detector; under 'cas' it is the protocol.
        read_version = prev.commit_version if prev else 0

        seen = group.num_rows

        if redrive:
            fresh = _dedup_by_lsn(group)
            skipped = seen - fresh.num_rows
        else:
            # 1. Watermark drop: already-applied events (duplicate
            #    delivery / replay overlap). The raw LSN is the event
            #    identity (globally unique — FIXTURES.md §2). Corrupt LSNs
            #    (null / negative) are unwatermarkable: they always pass
            #    here and are deduplicated at DLQ-count time instead (they
            #    can never reach the lake — the lsn chain rejects them).
            raw_lsn = group.column(RAW_LSN_COLUMN)
            fresh_mask = pc.fill_null(
                pc.or_(pc.greater(raw_lsn, hwm), pc.less(raw_lsn, 0)), True,
            )
            fresh = group.filter(fresh_mask)
            skipped = seen - fresh.num_rows

        # 2. Clean / DLQ split.
        has_errors = pc.greater(
            pc.list_value_length(fresh.column(ERRORS_COLUMN)), 0,
        )
        clean = fresh.filter(pc.invert(has_errors))
        dlq = fresh.filter(has_errors)

        dlq_dir = os.path.dirname(store.dlq_path(pid))

        # 3. DLQ write — range-keyed file, deterministic per replay window.
        #    Dedup deliveries by event identity (raw lsn) first: a
        #    re-delivered invalid event is one rejection, not two.
        #    In redrive mode the swap is DEFERRED: the replacement file
        #    stays at its tmp name and obsolete files are removed only
        #    AFTER the manifest commit, so a crash mid-redrive never loses
        #    dead-letter rows (ADVICE r1: atomic redrive swap).
        new_dlq_tmp = None
        new_dlq_final = None
        if dlq.num_rows:
            dlq = _dedup_by_lsn(dlq)
            lsns = [v for v in dlq.column(RAW_LSN_COLUMN).to_pylist() if v is not None]
            lo = min(lsns) if lsns else 0
            hi = max(lsns) if lsns else 0
            os.makedirs(dlq_dir, exist_ok=True)
            dlq_out = dlq.select([ORIGINAL_COLUMN, ERRORS_COLUMN, RAW_LSN_COLUMN])
            dlq_out = dlq_out.sort_by([(RAW_LSN_COLUMN, 'ascending')])
            final = os.path.join(dlq_dir, f'dlq-{lo}-{hi}.parquet')
            tmp = final + '.tmp'
            pq.write_table(dlq_out, tmp)
            if redrive:
                new_dlq_tmp, new_dlq_final = tmp, final
            else:
                os.replace(tmp, final)

        # DLQ accounting — INCREMENTAL (VERDICT r2 #3): cumulative
        # per-code counts live in the manifest; each run folds in only
        # its own (lsn-deduped) rejections, so ingest cost no longer
        # scales with historical DLQ size. Watermarkable (lsn ≥ 0)
        # rejections can't recount across runs (the watermark drops
        # them); corrupt negative lsns pass every watermark, so the
        # already-counted set rides the manifest.
        prev_corrupt = set(prev.dlq_corrupt_lsns) if prev else set()
        corrupt_lsns = set(prev_corrupt)
        if redrive:
            # The re-validated group IS the whole DLQ: the replacement
            # file alone defines the new rejection counts.
            rejected_total = _dlq_counts(dlq) if dlq.num_rows else {}
            corrupt_lsns = set()
            if dlq.num_rows:
                lsn_col = dlq.column(RAW_LSN_COLUMN).combine_chunks()
                neg_mask = pc.fill_null(pc.less(lsn_col, 0), False)
                corrupt_lsns = set(pc.drop_null(lsn_col.filter(neg_mask)).to_pylist())
        else:
            rejected_total = dict(prev.rejected_by_code) if prev else {}
            if dlq.num_rows:
                lsn_col = dlq.column(RAW_LSN_COLUMN).combine_chunks()
                neg_mask = pc.fill_null(pc.less(lsn_col, 0), False)
                if prev_corrupt:
                    already = pc.fill_null(pc.and_(neg_mask, pc.is_in(
                        lsn_col,
                        value_set=pa.array(sorted(prev_corrupt), type=pa.int64()),
                    )), False)
                    countable = dlq.filter(pc.invert(already))
                else:
                    countable = dlq
                for code, cnt in _dlq_counts(countable).items():
                    rejected_total[code] = rejected_total.get(code, 0) + cnt
                corrupt_lsns |= set(pc.drop_null(lsn_col.filter(neg_mask)).to_pylist())

        # 4. LWW upsert. A micro-batch appends ONE sorted delta file (no
        #    base read/rewrite — VERDICT r2 #5); the partition compacts
        #    into a single base when the delta list hits compact_every.
        applied = clean.num_rows
        incoming = clean.drop_columns([
            c for c in (ERRORS_COLUMN, ORIGINAL_COLUMN, PART_COLUMN, RAW_LSN_COLUMN)
            if c in clean.column_names
        ])
        incoming = incoming.rename_columns([
            'last_lsn' if c == 'lsn' else c for c in incoming.column_names
        ])

        prev_deltas = list(prev.deltas) if prev else []
        base_exists = os.path.exists(store.data_path(pid))

        new_hwm = hwm
        valid_lsns = pc.drop_null(fresh.column(RAW_LSN_COLUMN))
        if len(valid_lsns):
            new_hwm = max(new_hwm, pc.max(valid_lsns).as_py())

        if redrive:
            mode = 'compact'  # counts rebuilt ⇒ rewrite state too
        elif incoming.num_rows == 0:
            mode = 'noop'     # counts/hwm-only manifest update
        elif not base_exists and not prev_deltas:
            mode = 'bootstrap'  # first data: run state IS the base
        elif len(prev_deltas) + 1 >= compact_every:
            mode = 'compact'
        else:
            mode = 'delta'

        # 5. Commit: data/delta first, then manifest, atomically. With
        #    retain_history, the micro-batch's own LWW'd snapshot (with
        #    tombstones — a CDF must show deletes) is ALSO published under
        #    history/ before the manifest lists it; idempotent under
        #    retry (replayed windows overwrite their own file name).
        prev_history = list(prev.history) if prev else []
        new_history = prev_history
        tmp_data = None
        remove_data = False
        new_deltas = prev_deltas

        def retain_incoming_snapshot() -> None:
            nonlocal new_history
            hist = _last_writer_wins(incoming)
            lsns = hist.column('last_lsn')
            lo, hi = pc.min(lsns).as_py(), pc.max(lsns).as_py()
            name = f'delta-{lo}-{hi}.parquet'
            os.makedirs(store.history_dir(pid), exist_ok=True)
            tmp = store.tmp_path(pid, kind='hist')
            pq.write_table(hist, tmp)
            os.replace(tmp, store.history_path(pid, name))
            if name not in new_history:
                new_history = new_history + [name]

        if mode == 'noop':
            rows = prev.rows if prev else 0
            nbytes = prev.bytes if prev else 0
            sha = prev.sha256 if prev else _canonical_digest(incoming)
        elif mode == 'delta':
            # Within-run LWW; tombstones stay (a delta's delete must mask
            # older base/delta rows at merge-on-read time). The LWW sort
            # leaves the delta in canonical (repo, path) order already.
            delta = _last_writer_wins(incoming)
            lsns = delta.column('last_lsn')
            lo, hi = pc.min(lsns).as_py(), pc.max(lsns).as_py()
            # Deterministic per replay window: a retried/replayed window
            # overwrites its own file instead of appending a second copy.
            name = f'delta-{lo}-{hi}.parquet'
            tmp = store.tmp_path(pid, kind='delta')
            pq.write_table(delta, tmp)
            os.replace(tmp, store.delta_path(pid, name))
            if name not in prev_deltas:
                new_deltas = prev_deltas + [name]
            if retain_history:
                # Hardlink the just-written delta into history (same
                # bytes, no second write).
                store.retain_to_history(
                    pid, store.delta_path(pid, name), name)
                if name not in new_history:
                    new_history = new_history + [name]
            # Exact live-row count WITHOUT touching content bytes: merge
            # the key columns only (column-pruned reads of base+deltas).
            key_tables = _read_partition_tables(
                store, pid, prev, columns=list(_MERGE_KEY_COLUMNS),
            )
            key_tables.append(delta.select(
                [c for c in _MERGE_KEY_COLUMNS if c in delta.column_names],
            ))
            rows = _merge_partition_tables(key_tables).num_rows
            nbytes = (prev.bytes if prev else 0) + int(delta.nbytes)
            # Chained digest (full canonical digest is recomputed at each
            # compaction; between them the chain stays deterministic for
            # replay comparison).
            prev_sha = prev.sha256 if prev else ''
            sha = hashlib.sha256(
                f'{prev_sha}:{_canonical_digest(delta)}'.encode(),
            ).hexdigest()
        else:  # bootstrap | compact — full canonical state in hand
            if retain_history and incoming.num_rows:
                # The prev ACTIVE deltas being folded away were already
                # retained at their own commit time; only this batch's
                # snapshot is new to history.
                retain_incoming_snapshot()
            state_tables = []
            if mode == 'compact':
                state_tables = _read_partition_tables(store, pid, prev)
            state_tables.append(incoming)
            alive = _merge_partition_tables(state_tables)
            if alive.num_rows:
                tmp_data = store.tmp_path(pid)
                pq.write_table(alive, tmp_data)
            else:
                remove_data = True
            new_deltas = []
            rows = alive.num_rows
            nbytes = int(alive.nbytes) if alive.num_rows else 0
            sha = _canonical_digest(alive)

        manifest = PartitionManifest(
            partition_id=pid,
            hwm_lsn=int(new_hwm),
            rows=int(rows),
            bytes=int(nbytes),
            sha256=sha,
            rejected_by_code=rejected_total,
            events_applied=int(applied),
            events_skipped=int(skipped),
            deltas=new_deltas,
            dlq_corrupt_lsns=sorted(corrupt_lsns),
            history=new_history,
        )
        store.commit_partition(manifest, tmp_data, remove_data=remove_data,
                               expected_version=read_version)
        # Post-commit hygiene: compacted / orphaned delta files reclaim.
        if mode in ('bootstrap', 'compact'):
            store.clean_orphan_deltas(pid, new_deltas)

        if redrive:
            # Manifest committed — now swap the DLQ atomically: promote
            # the replacement file, then drop obsolete range files. A
            # crash before this point leaves the old DLQ intact (redrive
            # re-runs idempotently); after it, the lake and manifest
            # already reflect the redriven rows.
            keep = os.path.basename(new_dlq_final) if new_dlq_final else None
            if new_dlq_tmp is not None:
                os.replace(new_dlq_tmp, new_dlq_final)
            if os.path.isdir(dlq_dir):
                for name in os.listdir(dlq_dir):
                    if name.endswith('.parquet') and name != keep:
                        os.remove(os.path.join(dlq_dir, name))

        return _summary_row(
            pid, seen, applied, skipped, rows, rejected_total,
        )

    return upsert_partition


def _vacuum_partition(lake_root: str, pid: int, before_lsn: int) -> int:
    """One partition's vacuum cycle (see :meth:`CDCPipeline.vacuum_history`
    for semantics): collapse the sub-``before_lsn`` history window into a
    checkpoint, record the floor, reclaim the dropped files. Runs under
    the partition lock — safe alongside concurrent writers and other
    vacuums. Module-level so it ships as a Ray task."""
    store = ManifestStore(lake_root)
    removed = 0
    with store.partition_lock(pid):
        manifest = store.read_manifest(pid)
        if manifest is None:
            return 0
        # Orphan sweep (ADVICE r4): a crash between a previous vacuum's
        # manifest commit and its file removals strands history files no
        # manifest lists — re-running vacuum would never touch them.
        # Under the lock the manifest is the read authority, so removing
        # unlisted files only reclaims space (mirrors
        # clean_orphan_deltas for the partition dir).
        hist_dir = store.history_dir(pid)
        if os.path.isdir(hist_dir):
            listed = set(manifest.history)
            for name in os.listdir(hist_dir):
                if (
                    name.startswith('delta-') and name.endswith('.parquet')
                    and name not in listed
                ):
                    try:
                        os.remove(os.path.join(hist_dir, name))
                        removed += 1
                    except FileNotFoundError:
                        pass
        if not manifest.history:
            return removed
        keep, drop, drop_rng = [], [], []
        for name in manifest.history:
            rng = _parse_delta_range(name)
            if rng is not None and rng[1] < before_lsn:
                drop.append(name)
                drop_rng.append(rng)
            else:
                keep.append(name)
        if not drop:
            return removed
        tables = []
        for name in drop:
            p = store.history_path(pid, name)
            if os.path.exists(p):
                tables.append(_ensure_op(pq.read_table(p)))
        lo = min(r[0] for r in drop_rng)
        hi = max(r[1] for r in drop_rng)
        ckpt_name = None
        if tables:
            ckpt = _last_writer_wins(_concat_widened(tables))
            ckpt_name = f'delta-{lo}-{hi}.parquet'
            os.makedirs(store.history_dir(pid), exist_ok=True)
            tmp = store.tmp_path(pid, kind='vac')
            pq.write_table(ckpt, tmp)
            os.replace(tmp, store.history_path(pid, ckpt_name))
        manifest.history = ([ckpt_name] if ckpt_name else []) + keep
        manifest.history_floor_lsn = max(manifest.history_floor_lsn, hi)
        store.commit_partition(manifest, None, remove_data=False,
                               expected_version=manifest.commit_version)
        for name in drop:
            if name == ckpt_name:
                continue  # collapsed in place (single-file window)
            try:
                os.remove(store.history_path(pid, name))
                removed += 1
            except FileNotFoundError:
                pass
    return removed


# ---------------------------------------------------------------------------
# pipeline façade
# ---------------------------------------------------------------------------


class CDCPipeline:
    """End-to-end CDC ingest over a Ray Data pipeline.

    :param lake_root: lake table directory (manifests + partitions live here)
    :param num_partitions: hash-partition count — FIXED for the lake's
        lifetime (recorded in ``_meta.json``; replay must reshuffle
        identically). Size it to cluster-cores × small factor; at the
        10^10-event design point use 1024-4096.
    :param compact_every: micro-batches write per-partition delta files;
        a partition compacts into one base file when its active delta
        list reaches this length (VERDICT r2 #5).
    :param concurrency: concurrent-writer serialization — ``'flock'``
        (advisory per-partition lock, single-node/POSIX) or ``'cas'``
        (optimistic conditional commit keyed on ``commit_version``, the
        shared-object-storage protocol; see :func:`make_upsert_fn`).
    """

    def __init__(
        self,
        lake_root: str,
        num_partitions: int = 32,
        langs: Optional[List[str]] = None,
        allow_extra_keys: Union[bool, List[str]] = True,
        batch_size: int = 131072,
        validate_concurrency: Optional[int] = None,
        compact_every: int = 8,
        retain_history: bool = False,
        concurrency: str = 'flock',
    ) -> None:
        self.lake_root = lake_root
        self.langs = list(langs) if langs is not None else None
        self.allow_extra_keys = allow_extra_keys
        self.batch_size = batch_size
        self.validate_concurrency = validate_concurrency
        self.compact_every = compact_every
        self.concurrency = concurrency

        store = ManifestStore(lake_root)
        meta = store.read_meta()
        if meta is None:
            # Creation races under a concurrent writer: re-check under
            # an exclusive lock so exactly one constructor creates the
            # meta and the loser adopts the winner's pinned settings.
            with store.meta_lock():
                meta = store.read_meta()
                if meta is None:
                    meta = TableMeta(num_partitions=num_partitions,
                                     retain_history=retain_history)
                    store.write_meta(meta)
        # The pinned settings win (a no-op for the creator): partition
        # count for replay determinism; retention because a lake that
        # ever compacted without it has unfillable history holes.
        num_partitions = meta.num_partitions
        retain_history = bool(getattr(meta, 'retain_history', False))
        self.num_partitions = num_partitions
        self.retain_history = retain_history
        self.store = store

    # -- execution -------------------------------------------------------

    def run(self, events) -> RunReport:
        """Ingest an event Dataset / parquet path; returns the run report."""
        import ray.data as rd

        if isinstance(events, (str, list)):
            events = rd.read_parquet(events)

        num_partitions = self.num_partitions
        langs = self.langs
        allow_extra = self.allow_extra_keys

        # Validation runs as STATELESS tasks with a per-worker-process
        # compiled-chain cache (see _cached_validate_stage) rather than an
        # actor pool: chain compilation is cheap enough to amortize per
        # worker, and elastic tasks use every core while the actor pool
        # measured 3× slower end-to-end (startup + queueing on this
        # pipeline shape).
        validated = events.map_batches(
            _make_validate_fn(num_partitions, langs, allow_extra),
            batch_format='pyarrow',
            batch_size=self.batch_size,
            zero_copy_batch=True,
        )

        summaries = validated.groupby(PART_COLUMN).map_groups(
            make_upsert_fn(self.lake_root, compact_every=self.compact_every,
                           retain_history=self.retain_history,
                           concurrency=self.concurrency),
            batch_format='pyarrow',
        )

        report = RunReport()
        for row in summaries.take_all():
            report.merge_row(row)
        # Per-stage wall/cpu/memory breakdown for the run — the feedback
        # loop for batch/block-size tuning (`ds.stats()`).
        try:
            self.last_stats = summaries.stats()
        except Exception:  # noqa: BLE001 — observability must not fail a run
            self.last_stats = None
        return report

    # -- continuous tail -------------------------------------------------

    def tail(
        self,
        events_dir: str,
        poll_interval: float = 2.0,
        max_batches: Optional[int] = None,
        idle_timeout: Optional[float] = None,
        stop_file: Optional[str] = None,
    ) -> 'RunReport':
        """Continuously tail ``events_dir`` for NEW event parquet files
        and ingest each batch of arrivals (the binlog/WAL-tail shape).

        A file-granular ingest ledger (``_ingest_ledger.json`` in the
        lake root, atomically replaced AFTER each batch commits) skips
        already-processed files; exactly-once does NOT depend on it —
        a crash between commit and ledger write merely re-reads files
        whose events the per-partition watermarks then drop.

        Delivery contract (same as :meth:`run`, per file batch): once a
        batch is committed, later-arriving files must not introduce new
        events at or below the committed LSNs (re-deliveries are fine).

        Stops when ``max_batches`` non-empty batches were ingested, when
        no new files appear for ``idle_timeout`` seconds, or when
        ``stop_file`` exists. Returns the aggregate report.
        """
        import time

        ledger_path = os.path.join(self.lake_root, '_ingest_ledger.json')
        processed: set = set()
        if os.path.exists(ledger_path):
            with open(ledger_path) as fh:
                processed = set(json.load(fh)['files'])

        total = RunReport()
        batches = 0
        last_progress = time.monotonic()
        while True:
            if stop_file and os.path.exists(stop_file):
                break
            try:
                names = sorted(
                    f for f in os.listdir(events_dir)
                    if f.endswith('.parquet') and f not in processed
                )
            except FileNotFoundError:
                names = []
            if names:
                report = self.run([os.path.join(events_dir, f) for f in names])
                total.events_seen += report.events_seen
                total.events_applied += report.events_applied
                total.events_skipped += report.events_skipped
                for code, cnt in report.rejected_by_code.items():
                    total.rejected_by_code[code] = (
                        total.rejected_by_code.get(code, 0) + cnt
                    )
                total.partitions = max(total.partitions, report.partitions)
                total.lake_rows = report.lake_rows
                processed.update(names)
                tmp = ledger_path + '.tmp'
                with open(tmp, 'w') as fh:
                    json.dump({'files': sorted(processed)}, fh)
                os.replace(tmp, ledger_path)
                batches += 1
                last_progress = time.monotonic()
                if max_batches is not None and batches >= max_batches:
                    break
                continue  # drain immediately — don't sleep while behind
            if idle_timeout is not None and (
                time.monotonic() - last_progress >= idle_timeout
            ):
                break
            time.sleep(poll_interval)
        return total

    # -- inspection (small results; test/driver use) ---------------------

    def partition_table(self, pid: int) -> Optional[pa.Table]:
        """One partition's live rows, merged-on-read (base ∪ listed
        deltas, LWW, tombstones dropped, canonical sort)."""
        manifest = self.store.read_manifest(pid)
        tables = _read_partition_tables(self.store, pid, manifest)
        if not tables:
            return None
        return _merge_partition_tables(tables)

    def final_table(self) -> pa.Table:
        """Read the whole lake (tests / small scales only)."""
        tables = []
        for pid in range(self.num_partitions):
            t = self.partition_table(pid)
            if t is not None and t.num_rows:
                tables.append(t)
        if not tables:
            return pa.table({})
        schema = tables[0].schema
        for t in tables[1:]:
            schema, _ = widen_schema(schema, t.schema)
        return pa.concat_tables([align_table(t, schema) for t in tables]).sort_by(
            [('repo', 'ascending'), ('path', 'ascending')],
        )

    # -- change-data-feed + time travel (retain_history lakes) -----------

    def _require_history(self, what: str) -> None:
        meta = self.store.read_meta()
        if meta is None or not getattr(meta, 'retain_history', False):
            raise ValueError(
                f'{what} needs a lake created with retain_history=True '
                '(commits before retention was on are unrecoverable)',
            )

    def _history_files(self, since_lsn: int = -1,
                       until_lsn: Optional[int] = None) -> List[str]:
        """History file paths whose LSN window overlaps
        (since_lsn, until_lsn] — filename-pruned, no file reads."""
        paths: List[str] = []
        for pid in range(self.num_partitions):
            manifest = self.store.read_manifest(pid)
            if manifest is None:
                continue
            floor = getattr(manifest, 'history_floor_lsn', -1)
            if since_lsn < floor:
                raise ValueError(
                    f'changes(since_lsn={since_lsn}) needs history at or '
                    f'below the vacuum floor (lsn {floor}); that window '
                    'was collapsed by vacuum_history() and individual '
                    'change rows in it are unrecoverable',
                )
            for name in manifest.history:
                rng = _parse_delta_range(name)
                if rng is None:
                    continue
                lo, hi = rng
                if hi <= since_lsn or (until_lsn is not None and lo > until_lsn):
                    continue
                p = self.store.history_path(pid, name)
                if os.path.exists(p):
                    paths.append(p)
        return paths

    def changes_dataset(self, since_lsn: int = -1,
                        until_lsn: Optional[int] = None):
        """Change-data-feed as a streaming Dataset: every committed
        change row (op='delete' tombstones included) with
        ``since_lsn < last_lsn <= until_lsn``, at commit granularity
        (within-micro-batch overwrites are collapsed by that batch's
        LWW, as in Delta Lake CDF). File pruning via the LSN window in
        each history file's name — only overlapping files are read."""
        import ray.data as rd

        self._require_history('changes()')
        paths = self._history_files(since_lsn, until_lsn)
        if not paths:
            return rd.from_arrow(pa.table({
                'repo': pa.array([], type=pa.string()),
                'path': pa.array([], type=pa.string()),
                'op': pa.array([], type=pa.string()),
                'last_lsn': pa.array([], type=pa.int64()),
            }))

        def window(batch: pa.Table) -> pa.Table:
            lsn = batch.column('last_lsn')
            mask = pc.greater(lsn, since_lsn)
            if until_lsn is not None:
                mask = pc.and_(mask, pc.less_equal(lsn, until_lsn))
            return batch.filter(mask)

        # History files have heterogeneous schemas across commits
        # (additive widening) — reading them under first-fragment schema
        # inference can drop later-added columns (ADVICE r3). Widen
        # across the pruned files and pass the explicit schema: the
        # reader then null-fills missing columns per file.
        schema = None
        for p in paths:
            s = pq.read_schema(p).remove_metadata()
            schema = s if schema is None else widen_schema(schema, s)[0]
        return rd.read_parquet(paths, schema=schema).map_batches(
            window, batch_format='pyarrow')

    def changes(self, since_lsn: int = -1,
                until_lsn: Optional[int] = None) -> pa.Table:
        """Small-result/test wrapper over :meth:`changes_dataset`,
        ordered by (last_lsn, repo, path)."""
        table = _concat_widened(
            list(self.changes_dataset(since_lsn, until_lsn)
                 .iter_batches(batch_format='pyarrow')),
        )
        if table.num_rows == 0:
            return table
        return table.sort_by([
            ('last_lsn', 'ascending'),
            ('repo', 'ascending'), ('path', 'ascending'),
        ])

    def table_as_of(self, lsn: int) -> pa.Table:
        """The lake's live rows as of ``lsn`` (state after every commit
        whose events were all ≤ lsn): union the retained history up to
        ``lsn``, LWW, drop tombstones. Exact at commit boundaries —
        within one micro-batch a key's overwritten versions were
        collapsed by that batch's LWW, so an ``lsn`` splitting a batch's
        per-key update run reflects only the batch's winners (commit
        granularity, as documented for :meth:`changes`)."""
        self._require_history('table_as_of()')
        out = []
        for pid in range(self.num_partitions):
            manifest = self.store.read_manifest(pid)
            if manifest is None:
                continue
            floor = getattr(manifest, 'history_floor_lsn', -1)
            if lsn < floor:
                raise ValueError(
                    f'table_as_of({lsn}) predates the vacuum floor '
                    f'(lsn {floor}): versions inside the vacuumed window '
                    'were collapsed into a checkpoint and snapshots '
                    'before it are unrecoverable',
                )
            tables = []
            for name in manifest.history:
                rng = _parse_delta_range(name)
                if rng is None or rng[0] > lsn:
                    continue
                p = self.store.history_path(pid, name)
                if not os.path.exists(p):
                    continue
                t = pq.read_table(p)
                tables.append(t.filter(
                    pc.less_equal(t.column('last_lsn'), lsn)))
            tables = [t for t in tables if t.num_rows]
            if tables:
                merged = _merge_partition_tables(tables)
                if merged.num_rows:
                    out.append(merged)
        if not out:
            return pa.table({})
        return _concat_widened(out).sort_by(
            [('repo', 'ascending'), ('path', 'ascending')],
        )

    def vacuum_history(self, before_lsn: int) -> int:
        """Reclaim history files whose whole LSN window is < before_lsn
        (bounding changes()/table_as_of() to the retained window, like
        Delta Lake VACUUM). Returns the number of files removed.

        The vacuumed window is first collapsed into ONE checkpoint file
        per partition (LWW over the dropped files, tombstones kept — the
        Delta-checkpoint analogue), so every cold key's latest retained
        version survives and ``table_as_of(lsn >= floor)`` stays exact
        for keys untouched since the vacuumed window (ADVICE r3 high:
        without this, vacuum silently dropped cold keys from every as-of
        result). The partition's ``history_floor_lsn`` records the
        collapse boundary: as-of / changes requests *inside* the
        vacuumed window raise instead of returning collapsed history.
        Manifest commits first; file removal after (crash-safe).

        Partitions vacuum independently (each under its own partition
        lock), so the work fans out as one Ray task per partition when a
        Ray session is up — the 64M soak measured the driver-sequential
        loop at 45 s for 640 files, scaling with reclaimed-file count;
        distributed, it scales with files-per-partition instead. Falls
        back to the inline loop for small lakes / no Ray session."""
        import ray

        pids = list(range(self.num_partitions))
        if ray.is_initialized() and self.num_partitions >= 8:
            task = ray.remote(_vacuum_partition)
            return sum(ray.get([
                task.remote(self.lake_root, pid, before_lsn)
                for pid in pids
            ]))
        return sum(
            _vacuum_partition(self.lake_root, pid, before_lsn)
            for pid in pids
        )

    def replay_dlq(
        self,
        langs: Optional[List[str]] = None,
        allow_extra_keys: Union[bool, List[str], None] = None,
    ) -> 'RunReport':
        """Dead-letter redrive: re-validate every DLQ'd event under a
        (typically widened) chain config and upsert the now-valid ones.

        Rows that validate are merged into the lake (LWW vs the base
        still applies, so a redriven event never overrides a newer
        writer); rows that still fail remain the partition's entire DLQ
        (files rewritten; rejection counts shrink accordingly).
        """
        import ray.data as rd

        dlq = self.dlq_dataset()
        if dlq.count() == 0:
            return RunReport()

        def reconstruct(batch: pa.Table) -> pa.Table:
            rows = [json.loads(s) for s in batch.column(ORIGINAL_COLUMN).to_pylist()]
            cols = ['lsn', 'op', 'repo', 'path', 'commit', 'lang', 'content']
            extras = sorted({k for r in rows for k in r} - set(cols))
            out = {}
            out['lsn'] = pa.array(
                [r.get('lsn') if isinstance(r.get('lsn'), int) else None for r in rows],
                type=pa.int64(),
            )
            for c in cols[1:] + extras:
                out[c] = pa.array(
                    [None if r.get(c) is None else str(r.get(c)) for r in rows],
                    type=pa.string(),
                )
            return pa.table(out)

        events = dlq.map_batches(reconstruct, batch_format='pyarrow')

        validated = events.map_batches(
            _make_validate_fn(
                self.num_partitions,
                langs if langs is not None else self.langs,
                allow_extra_keys if allow_extra_keys is not None else self.allow_extra_keys,
            ),
            batch_format='pyarrow',
            batch_size=self.batch_size,
            zero_copy_batch=True,
        )
        summaries = validated.groupby(PART_COLUMN).map_groups(
            make_upsert_fn(self.lake_root, redrive=True,
                           retain_history=self.retain_history,
                           concurrency=self.concurrency),
            batch_format='pyarrow',
        )
        report = RunReport()
        for row in summaries.take_all():
            report.merge_row(row)
        return report

    def as_dataset(self, columns: Optional[List[str]] = None):
        """The lake as a streaming ``ray.data.Dataset`` (the reader a
        downstream pipeline composes with; no driver materialization).

        ``columns`` prunes the read: base/delta files are read with only
        the requested columns (plus, on the merge path, the LWW key
        columns the merge itself needs — dropped again before return).
        A downstream 2-column transform must not lift the content bytes
        off disk.

        Fast path: with no active deltas anywhere (fresh single-run lake,
        or post-compaction) this is a plain streaming ``read_parquet`` of
        the base files. With deltas, each partition merges-on-read inside
        its own task (one task per partition; Ray's dynamic block
        splitting re-slices large merged outputs)."""
        import ray.data as rd

        manifests = {
            pid: self.store.read_manifest(pid)
            for pid in range(self.num_partitions)
        }
        any_deltas = any(m is not None and m.deltas for m in manifests.values())
        if not any_deltas:
            paths = [
                self.store.data_path(pid)
                for pid in range(self.num_partitions)
                if os.path.exists(self.store.data_path(pid))
            ]
            if not paths:
                return rd.from_arrow(pa.table({}))
            return rd.read_parquet(paths, columns=columns)

        lake_root = self.lake_root
        pids = [
            pid for pid in range(self.num_partitions)
            if _partition_file_paths(self.store, pid, manifests[pid])
        ]
        if not pids:
            return rd.from_arrow(pa.table({}))

        read_cols = None
        if columns is not None:
            read_cols = list(dict.fromkeys(
                list(columns) + list(_MERGE_KEY_COLUMNS)))

        def read_merged(batch: pa.Table) -> pa.Table:
            store = ManifestStore(lake_root)
            out = []
            for pid in batch.column('pid').to_pylist():
                tables = _read_partition_tables(
                    store, pid, store.read_manifest(pid), columns=read_cols)
                if tables:
                    merged = _merge_partition_tables(tables)
                    if columns is not None:
                        merged = merged.select(
                            [c for c in columns if c in merged.column_names])
                    out.append(merged)
            if not out:
                return pa.table({})
            schema = out[0].schema
            for t in out[1:]:
                schema, _ = widen_schema(schema, t.schema)
            return pa.concat_tables([align_table(t, schema) for t in out])

        return rd.from_arrow(pa.table({'pid': pa.array(pids, type=pa.int64())})) \
            .repartition(len(pids)) \
            .map_batches(read_merged, batch_format='pyarrow', batch_size=1)

    def dlq_dataset(self):
        """The dead-letter dataset (original payload + errors + lsn)."""
        import ray.data as rd

        paths = []
        for pid in range(self.num_partitions):
            dlq_dir = os.path.dirname(self.store.dlq_path(pid))
            if os.path.isdir(dlq_dir):
                paths.extend(
                    os.path.join(dlq_dir, f)
                    for f in sorted(os.listdir(dlq_dir)) if f.endswith('.parquet')
                )
        if not paths:
            return rd.from_arrow(pa.table({}))
        return rd.read_parquet(paths)

    def rejection_counts(self) -> Dict[str, int]:
        counts: Dict[str, int] = {}
        for manifest in self.store.all_manifests().values():
            for code, cnt in manifest.rejected_by_code.items():
                counts[code] = counts.get(code, 0) + cnt
        return counts

    def lineage(self) -> List[dict]:
        """Per-partition lineage/metrics records."""
        from dataclasses import asdict
        return [
            asdict(m) for _, m in sorted(self.store.all_manifests().items())
        ]

    def lookup(self, repo: str, path: str) -> Optional[dict]:
        """Point lookup by full key: hash (repo, path) to its ONE
        partition, merge-read just that partition (base + listed deltas,
        column-complete), and return the live row as a dict — or None if
        the key is absent/deleted. Cost is one partition, never a scan."""
        pid = int(key_partition(
            pa.array([repo], type=pa.string()),
            pa.array([path], type=pa.string()),
            self.num_partitions,
        )[0])
        table = self.partition_table(pid)
        if table is None:
            return None
        hit = table.filter(pc.and_(
            pc.equal(table.column('repo'), repo),
            pc.equal(table.column('path'), path),
        ))
        if hit.num_rows == 0:
            return None
        return {c: hit.column(c)[0].as_py() for c in hit.column_names}

    def lake_report(self) -> dict:
        """Ops summary of the whole lake from manifests alone (no data
        files touched): totals, per-partition extremes (skew evidence),
        delta/compaction and history state, cumulative rejections."""
        manifests = self.store.all_manifests()
        if not manifests:
            return {'partitions': self.num_partitions, 'committed': 0}
        rows = [m.rows for m in manifests.values()]
        nbytes = [m.bytes for m in manifests.values()]
        report = {
            'partitions': self.num_partitions,
            'committed': len(manifests),
            'lake_rows': int(sum(rows)),
            'lake_bytes': int(sum(nbytes)),
            'max_partition_rows': int(max(rows)),
            'min_partition_rows': int(min(rows)),
            'skew_ratio': round(
                max(rows) / max(1.0, sum(rows) / len(rows)), 3),
            'hwm_lsn': int(max(m.hwm_lsn for m in manifests.values())),
            'active_deltas': int(sum(len(m.deltas) for m in manifests.values())),
            'history_files': int(
                sum(len(m.history) for m in manifests.values())),
            'events_applied': int(
                sum(m.events_applied for m in manifests.values())),
            'events_skipped': int(
                sum(m.events_skipped for m in manifests.values())),
            'rejected_by_code': self.rejection_counts(),
            'retain_history': bool(self.retain_history),
        }
        return report
