"""Change-data-feed + as-of-LSN time travel (retain_history lakes).

Semantics under test:
* ``changes()`` = every committed change row (tombstones included) in an
  LSN window, at commit granularity; LWW over the full feed reproduces
  the live table exactly.
* ``table_as_of(X)`` at a commit boundary == a fresh-lake replay of the
  event prefix ``lsn <= X`` — including across compactions (the history
  files, not the compacted base, are the record).
* retention is pinned at lake creation; non-retaining lakes refuse.
* ``vacuum_history`` bounds the retained window without touching the
  live table.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from filters_ray.pipelines.cdc import CDCPipeline
from filters_ray.sources.oracle import final_state_digests, replay_oracle
from filters_ray.sources.synth import SynthConfig, make_events


def _lsn_ordered_chunks(log: pa.Table, n_chunks: int):
    """Split by LSN rank (not arrival position) so chunk boundaries are
    clean prefix boundaries — the granularity at which as-of is exact."""
    log = log.sort_by([('lsn', 'ascending')])
    per = log.num_rows // n_chunks
    return [
        log.slice(i * per, per if i < n_chunks - 1 else log.num_rows - i * per)
        for i in range(n_chunks)
    ]


def _applied_max_lsn(pipeline: CDCPipeline) -> int:
    return max(
        m.hwm_lsn for m in pipeline.store.all_manifests().values()
    )


@pytest.fixture(scope='module')
def history_lake(tmp_path_factory, ray_session):
    """One retained-history lake ingested in 4 micro-batches with
    compact_every=2 (so compaction provably happened), plus the chunk
    list and per-chunk boundary LSNs."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=60, n_events=800, n_repos=6, seed=31)
    log = make_events(cfg)
    chunks = _lsn_ordered_chunks(log, 4)
    lake = str(tmp_path_factory.mktemp('tt') / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4, compact_every=2,
                           retain_history=True)
    boundaries = []
    for c in chunks:
        pipeline.run(rd.from_arrow(c))
        boundaries.append(_applied_max_lsn(pipeline))
    return pipeline, log, chunks, boundaries


def test_compaction_happened_and_history_retained(history_lake):
    pipeline, log, chunks, _ = history_lake
    manifests = pipeline.store.all_manifests()
    # compact_every=2 over 4 micro-batches ⇒ every partition compacted
    # at least once (delta list shorter than its commit count).
    assert any(len(m.history) > len(m.deltas) for m in manifests.values())
    for pid, m in manifests.items():
        for name in m.history:
            assert os.path.exists(pipeline.store.history_path(pid, name))


def test_full_feed_lww_reproduces_live_table(history_lake):
    pipeline, *_ = history_lake
    from filters_ray.pipelines.cdc import (
        _drop_tombstones,
        _last_writer_wins,
    )

    feed = pipeline.changes()
    assert feed.num_rows > 0
    assert 'delete' in set(feed.column('op').to_pylist())  # CDF shows deletes
    replayed = _drop_tombstones(_last_writer_wins(feed))
    final = pipeline.final_table()
    assert final_state_digests(replayed) == final_state_digests(final)


def test_changes_window_filters_exactly(history_lake):
    pipeline, _, _, boundaries = history_lake
    lo, hi = boundaries[0], boundaries[2]
    window = pipeline.changes(since_lsn=lo, until_lsn=hi)
    lsns = window.column('last_lsn').to_pylist()
    assert all(lo < v <= hi for v in lsns)
    # Window = full feed filtered to the window (same rows).
    full = pipeline.changes()
    expected = full.filter(
        pc.and_(pc.greater(full.column('last_lsn'), lo),
                pc.less_equal(full.column('last_lsn'), hi)),
    )
    assert window.num_rows == expected.num_rows


def test_as_of_matches_prefix_replay(history_lake, tmp_path):
    import ray.data as rd

    pipeline, log, chunks, boundaries = history_lake
    for i, x in enumerate(boundaries[:3]):
        snap = pipeline.table_as_of(x)
        prefix = log.filter(pc.less_equal(log.column('lsn'), x))
        fresh = CDCPipeline(str(tmp_path / f'prefix-{i}'), num_partitions=4)
        fresh.run(rd.from_arrow(prefix))
        assert final_state_digests(snap) == \
            final_state_digests(fresh.final_table()), f'boundary {i}'


def test_as_of_latest_equals_final_table(history_lake):
    pipeline, _, _, boundaries = history_lake
    snap = pipeline.table_as_of(boundaries[-1])
    assert final_state_digests(snap) == \
        final_state_digests(pipeline.final_table())


def test_history_idempotent_under_replay(history_lake):
    import ray.data as rd

    pipeline, _, chunks, _ = history_lake
    before = {
        pid: list(m.history)
        for pid, m in pipeline.store.all_manifests().items()
    }
    pipeline.run(rd.from_arrow(chunks[-1]))  # duplicate delivery
    after = {
        pid: list(m.history)
        for pid, m in pipeline.store.all_manifests().items()
    }
    assert before == after


def test_non_retaining_lake_refuses(tmp_path, ray_session):
    import ray.data as rd

    cfg = SynthConfig(n_keys=20, n_events=150, n_repos=3, seed=5)
    log = make_events(cfg)
    pipeline = CDCPipeline(str(tmp_path / 'plain'), num_partitions=2)
    pipeline.run(rd.from_arrow(log))
    with pytest.raises(ValueError, match='retain_history'):
        pipeline.changes()
    with pytest.raises(ValueError, match='retain_history'):
        pipeline.table_as_of(10**9)
    # And retention cannot be flipped on after creation.
    reopened = CDCPipeline(str(tmp_path / 'plain'), num_partitions=2,
                           retain_history=True)
    assert reopened.retain_history is False


def test_vacuum_bounds_the_window(history_lake):
    pipeline, _, _, boundaries = history_lake
    # Vacuum everything strictly below the first boundary.
    removed = pipeline.vacuum_history(before_lsn=boundaries[0] + 1)
    assert removed > 0
    # Live table untouched; recent window still answerable.
    oracle_rows = pipeline.final_table().num_rows
    assert pipeline.table_as_of(boundaries[-1]).num_rows == oracle_rows
    recent = pipeline.changes(since_lsn=boundaries[1])
    assert recent.num_rows > 0
    # Vacuumed files are gone from disk.
    for pid, m in pipeline.store.all_manifests().items():
        hdir = pipeline.store.history_dir(pid)
        if os.path.isdir(hdir):
            assert set(os.listdir(hdir)) == set(m.history)
