"""Crash/retry recovery: a lost partition commit is rebuilt by replay.

Simulates a task crash between data write and manifest commit (the only
dangerous window) by deleting one partition's outputs after a successful
run, then replaying the full log: only the damaged partition re-applies
events, and the final state equals the oracle.
"""

from __future__ import annotations

import os
import shutil

import pytest

from filters_ray.pipelines.cdc import CDCPipeline
from filters_ray.sources.oracle import final_state_digests, replay_oracle
from filters_ray.sources.synth import SynthConfig, make_events


@pytest.mark.usefixtures('ray_session')
def test_lost_partition_rebuilt_by_replay(tmp_path):
    import ray.data as rd

    cfg = SynthConfig(n_keys=80, n_events=600, n_repos=8, seed=13)
    log = make_events(cfg)
    oracle = replay_oracle(log.to_pylist())

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=8)
    pipeline.run(rd.from_arrow(log))

    # Simulate a crashed partition: wipe its data + manifest + DLQ (as if
    # the task died before its atomic commits).
    victim = 3
    if os.path.exists(pipeline.store.data_path(victim)):
        os.remove(pipeline.store.data_path(victim))
    if os.path.exists(pipeline.store.manifest_path(victim)):
        os.remove(pipeline.store.manifest_path(victim))
    shutil.rmtree(os.path.dirname(pipeline.store.dlq_path(victim)),
                  ignore_errors=True)

    # Replay the full log (the retry path): untouched partitions drop
    # everything via their watermark; the victim rebuilds from scratch.
    pipeline2 = CDCPipeline(lake, num_partitions=8)
    report = pipeline2.run(rd.from_arrow(log))

    assert final_state_digests(pipeline2.final_table()) == oracle.sha256_by_key()
    assert pipeline2.rejection_counts() == oracle.rejected_by_code
    # Only the victim partition re-applied anything.
    applied_parts = [
        m for m in pipeline2.lineage() if m['events_applied'] > 0
    ]
    assert {m['partition_id'] for m in applied_parts} <= {victim}


@pytest.mark.usefixtures('ray_session')
def test_tmp_files_are_ignored(tmp_path):
    """Leftover tmp files from a crashed write never corrupt the lake."""
    import ray.data as rd

    cfg = SynthConfig(n_keys=40, n_events=200, n_repos=4, seed=17,
                      invalid_rate=0.0, duplicate_rate=0.0)
    log = make_events(cfg)

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4)

    # Plant a fake orphaned tmp file before the run.
    os.makedirs(pipeline.store.partition_dir(0), exist_ok=True)
    orphan = os.path.join(
        pipeline.store.partition_dir(0), 'data.parquet.tmp-deadbeef',
    )
    with open(orphan, 'wb') as fh:
        fh.write(b'garbage')

    pipeline.run(rd.from_arrow(log))
    oracle = replay_oracle(log.to_pylist())
    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()


@pytest.mark.usefixtures('ray_session')
def test_two_concurrent_writers_no_lost_updates(tmp_path):
    """Optimistic-concurrency guard (VERDICT r3 #5): two simultaneous
    ``CDCPipeline.run``s of the same delivered log into one lake (the
    competing-consumer / redundant-delivery shape) must behave like
    exactly-once: every valid event applied exactly ONCE across the two
    writers, final state equal to the single-writer oracle, and no torn
    manifest (every listed delta file exists). Each partition's
    read-merge-commit cycle runs under the partition lock, so writers
    interleave per partition instead of overwriting each other's
    manifests (which orphaned committed deltas before the fix)."""
    import threading

    import ray.data as rd

    cfg = SynthConfig(n_keys=120, n_events=1500, n_repos=10, seed=77)
    log = make_events(cfg)
    oracle = replay_oracle(log.to_pylist())
    # Single-writer reference: the applied count the two writers must
    # jointly reproduce exactly (it exceeds the oracle's unique-event
    # count when the log carries in-batch duplicate deliveries — those
    # are applied-then-LWW'd, not skipped).
    ref = CDCPipeline(str(tmp_path / 'ref'), num_partitions=8,
                      compact_every=3).run(rd.from_arrow(log))
    n_valid = ref.events_applied

    lake = str(tmp_path / 'lake')
    reports, errors = {}, []

    def writer(tag):
        try:
            pipeline = CDCPipeline(lake, num_partitions=8, compact_every=3)
            reports[tag] = pipeline.run(rd.from_arrow(log))
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            errors.append((tag, exc))

    threads = [threading.Thread(target=writer, args=(t,)) for t in 'AB']
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    pipeline = CDCPipeline(lake, num_partitions=8)
    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code
    # Exactly-once across BOTH writers: whoever locked a partition first
    # applied its events; the other's were watermark-dropped.
    total_applied = sum(r.events_applied for r in reports.values())
    assert total_applied == n_valid
    # No torn manifests: every listed delta/history file exists on disk,
    # and commit versions advanced monotonically per partition.
    for pid, m in pipeline.store.all_manifests().items():
        for name in m.deltas:
            assert os.path.exists(pipeline.store.delta_path(pid, name))
        assert m.commit_version >= 1
