"""Delta files + compaction + incremental DLQ accounting (round 3).

VERDICT r2 #3/#5 done-criteria: a micro-batch must not rewrite untouched
base bytes; the delta list compacts at the threshold; rejection
accounting is cumulative in the manifest (no O(historical-DLQ) rescan,
corrupt-lsn re-deliveries count once); merged-on-read state stays
row-for-row equal to the scalar oracle throughout.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from filters_ray.pipelines.cdc import CDCPipeline
from filters_ray.sources.oracle import final_state_digests, replay_oracle
from filters_ray.sources.synth import SynthConfig, make_events


def _split_log(log: pa.Table, n_chunks: int):
    per = log.num_rows // n_chunks
    return [
        log.slice(i * per, per if i < n_chunks - 1 else log.num_rows - i * per)
        for i in range(n_chunks)
    ]


@pytest.mark.usefixtures('ray_session')
def test_micro_batch_writes_delta_not_base(tmp_path):
    """Run 2+ must leave the base file's bytes untouched and append one
    listed delta file instead; merged view equals the oracle."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=60, n_events=600, n_repos=6, seed=23)
    log = make_events(cfg)
    chunks = _split_log(log, 3)
    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4, compact_every=8)

    pipeline.run(rd.from_arrow(chunks[0]))  # bootstrap: base only
    base_stats = {}
    for pid in range(4):
        p = pipeline.store.data_path(pid)
        if os.path.exists(p):
            st = os.stat(p)
            base_stats[pid] = (st.st_mtime_ns, st.st_size)
        m = pipeline.store.read_manifest(pid)
        assert m is None or m.deltas == []

    pipeline.run(rd.from_arrow(chunks[1]))
    pipeline.run(rd.from_arrow(chunks[2]))

    touched_any_delta = False
    for pid, (mtime, size) in base_stats.items():
        st = os.stat(pipeline.store.data_path(pid))
        # Micro-batches appended deltas; the base bytes never moved.
        assert (st.st_mtime_ns, st.st_size) == (mtime, size)
        m = pipeline.store.read_manifest(pid)
        if m.deltas:
            touched_any_delta = True
            for name in m.deltas:
                assert os.path.exists(pipeline.store.delta_path(pid, name))
    assert touched_any_delta

    oracle = replay_oracle(log.to_pylist())
    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code


@pytest.mark.usefixtures('ray_session')
def test_compaction_folds_deltas_into_base(tmp_path):
    """With compact_every=2 the second micro-batch compacts: delta list
    empties, files are reclaimed, state still equals the oracle."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=50, n_events=600, n_repos=5, seed=29)
    log = make_events(cfg)
    chunks = _split_log(log, 4)
    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4, compact_every=2)

    for chunk in chunks:
        pipeline.run(rd.from_arrow(chunk))

    for pid in range(4):
        m = pipeline.store.read_manifest(pid)
        if m is None:
            continue
        assert len(m.deltas) < 2  # compaction threshold enforced
        part_dir = pipeline.store.partition_dir(pid)
        on_disk = {
            n for n in os.listdir(part_dir)
            if n.startswith('delta-') and n.endswith('.parquet')
        }
        assert on_disk == set(m.deltas)  # orphans reclaimed post-compact

    oracle = replay_oracle(log.to_pylist())
    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code


@pytest.mark.usefixtures('ray_session')
def test_replay_over_delta_state_is_idempotent(tmp_path):
    """Full-log replay over a lake holding active deltas applies nothing
    and changes nothing."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=40, n_events=400, n_repos=4, seed=31)
    log = make_events(cfg)
    chunks = _split_log(log, 2)
    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4, compact_every=8)
    for chunk in chunks:
        pipeline.run(rd.from_arrow(chunk))
    digests_before = final_state_digests(pipeline.final_table())
    counts_before = pipeline.rejection_counts()

    report = pipeline.run(rd.from_arrow(log))  # full replay
    assert report.events_applied == 0
    assert final_state_digests(pipeline.final_table()) == digests_before
    assert pipeline.rejection_counts() == counts_before


@pytest.mark.usefixtures('ray_session')
def test_micro_batched_equals_single_run(tmp_path):
    """N micro-batches (delta path) ≡ one run (bootstrap path): same
    final digests, same lake row count, same rejection counts."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=60, n_events=800, n_repos=6, seed=37)
    log = make_events(cfg)

    one = CDCPipeline(str(tmp_path / 'one'), num_partitions=4)
    one.run(rd.from_arrow(log))

    many = CDCPipeline(str(tmp_path / 'many'), num_partitions=4,
                       compact_every=100)
    for chunk in _split_log(log, 5):
        many.run(rd.from_arrow(chunk))

    assert final_state_digests(many.final_table()) == \
        final_state_digests(one.final_table())
    assert many.rejection_counts() == one.rejection_counts()
    assert sum(m['rows'] for m in many.lineage()) == \
        sum(m['rows'] for m in one.lineage())


@pytest.mark.usefixtures('ray_session')
def test_corrupt_lsn_redelivery_counts_once(tmp_path):
    """A negative-lsn (unwatermarkable) invalid event re-delivered across
    runs is one rejection, not one per delivery."""
    import ray.data as rd

    def corrupt_log():
        return pa.table({
            'lsn': pa.array([-5], type=pa.int64()),
            'op': pa.array(['update']),
            'repo': pa.array(['r1']),
            'path': pa.array(['p1']),
            'commit': pa.array(['0' * 40]),
            'lang': pa.array(['py']),
            'content': pa.array(['x']),
        })

    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=2)
    pipeline.run(rd.from_arrow(corrupt_log()))
    assert pipeline.rejection_counts() == {'too_small': 1}
    pipeline.run(rd.from_arrow(corrupt_log()))  # re-delivery
    assert pipeline.rejection_counts() == {'too_small': 1}


@pytest.mark.usefixtures('ray_session')
def test_dlq_accounting_does_not_rescan_history(tmp_path):
    """Sequential runs each with fresh rejections: counts accumulate via
    the manifest, without any whole-DLQ-directory rescan (the O(historic)
    walk was deleted; this pins the cumulative semantics)."""
    import ray.data as rd

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=2)
    n_runs = 4
    for i in range(n_runs):
        log = pa.table({
            'lsn': pa.array([10 * i + 1, 10 * i + 2], type=pa.int64()),
            'op': pa.array(['update', 'bogus-op']),     # second row rejects
            'repo': pa.array(['r1', 'r1']),
            'path': pa.array([f'f{i}', f'g{i}']),
            'commit': pa.array(['0' * 40] * 2),
            'lang': pa.array(['py'] * 2),
            'content': pa.array(['a', 'b']),
        })
        pipeline.run(rd.from_arrow(log))
    assert pipeline.rejection_counts() == {'not_valid_choice': n_runs}
    assert pipeline.final_table().num_rows == n_runs


@pytest.mark.usefixtures('ray_session')
def test_as_dataset_column_pruning(tmp_path):
    """as_dataset(columns=...) returns exactly the requested columns on
    both the fast (base-only) and merge-on-read (deltas) paths, with the
    same rows as final_table."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=40, n_events=400, n_repos=4, seed=37)
    log = make_events(cfg)
    chunks = _split_log(log, 2)

    # Fast path: single run, no deltas.
    lake1 = CDCPipeline(str(tmp_path / 'one'), num_partitions=4)
    lake1.run(rd.from_arrow(log))
    pruned = lake1.as_dataset(columns=['repo', 'last_lsn'])
    t = pruned.to_pandas()
    assert sorted(t.columns) == ['last_lsn', 'repo']
    assert len(t) == lake1.final_table().num_rows

    # Merge-on-read path: two runs leave active deltas.
    lake2 = CDCPipeline(str(tmp_path / 'two'), num_partitions=4,
                        compact_every=8)
    lake2.run(rd.from_arrow(chunks[0]))
    lake2.run(rd.from_arrow(chunks[1]))
    assert any(m.deltas for m in lake2.store.all_manifests().values())
    t2 = lake2.as_dataset(columns=['repo', 'last_lsn']).to_pandas()
    assert sorted(t2.columns) == ['last_lsn', 'repo']
    final = lake2.final_table()
    assert len(t2) == final.num_rows
    assert sorted(t2['last_lsn']) == sorted(
        final.column('last_lsn').to_pylist())


@pytest.mark.usefixtures('ray_session')
def test_lake_report_totals(tmp_path):
    import ray.data as rd

    cfg = SynthConfig(n_keys=30, n_events=300, n_repos=3, seed=41)
    log = make_events(cfg)
    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=4)
    run = pipeline.run(rd.from_arrow(log))
    report = pipeline.lake_report()
    assert report['lake_rows'] == run.lake_rows
    assert report['events_applied'] == run.events_applied
    assert report['rejected_by_code'] == pipeline.rejection_counts()
    assert report['committed'] <= report['partitions'] == 4
    assert report['max_partition_rows'] >= report['min_partition_rows'] > 0
    assert report['skew_ratio'] >= 1.0


@pytest.mark.usefixtures('ray_session')
def test_point_lookup(tmp_path):
    import ray.data as rd

    cfg = SynthConfig(n_keys=40, n_events=400, n_repos=4, seed=43)
    log = make_events(cfg)
    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=4,
                           compact_every=8)
    for c in _split_log(log, 2):
        pipeline.run(rd.from_arrow(c))

    final = pipeline.final_table()
    # Every live row is findable and matches the merged view exactly.
    for i in range(0, final.num_rows, max(1, final.num_rows // 7)):
        repo = final.column('repo')[i].as_py()
        path = final.column('path')[i].as_py()
        row = pipeline.lookup(repo, path)
        assert row is not None
        assert row['last_lsn'] == final.column('last_lsn')[i].as_py()
        assert row['content'] == final.column('content')[i].as_py()
    # Absent key → None.
    assert pipeline.lookup('no-such-repo', 'nope') is None
