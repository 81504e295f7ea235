"""Dead-letter redrive: widen the chain, replay the DLQ, lake updates."""

from __future__ import annotations

import pyarrow as pa
import pytest

from filters_ray.pipelines.cdc import CDCPipeline


def log_with_bad_langs() -> pa.Table:
    rows = []
    for i in range(30):
        rows.append({
            'lsn': i, 'op': 'insert', 'repo': 'org/r', 'path': f'f{i}',
            'commit': 'a' * 40,
            # A third of the events carry a lang outside the default set.
            'lang': 'klingon' if i % 3 == 0 else 'py',
            'content': f'body {i}',
        })
    # One event that is broken beyond lang (stays dead after redrive).
    rows.append({
        'lsn': 100, 'op': 'insert', 'repo': '', 'path': 'dead',
        'commit': 'a' * 40, 'lang': 'py', 'content': 'x',
    })
    return pa.Table.from_pylist(rows)


@pytest.mark.usefixtures('ray_session')
def test_redrive_after_widening_langs(tmp_path):
    import ray.data as rd

    lake = str(tmp_path / 'lake')
    pipeline = CDCPipeline(lake, num_partitions=4)
    report = pipeline.run(rd.from_arrow(log_with_bad_langs()))

    assert report.rejected_by_code == {'not_valid_choice': 10, 'empty': 1}
    rows_before = pipeline.final_table().num_rows
    assert rows_before == 20

    # Ops decision: 'klingon' is a legal lang now. Redrive the DLQ.
    from filters_ray.sources.synth import LANGS
    redrive = pipeline.replay_dlq(langs=list(LANGS) + ['klingon'])

    assert redrive.events_applied == 10
    table = pipeline.final_table()
    assert table.num_rows == 30
    langs = set(table.column('lang').to_pylist())
    assert 'klingon' in langs

    # Only the genuinely-broken event remains dead; counts shrank.
    assert pipeline.rejection_counts() == {'empty': 1}
    assert pipeline.dlq_dataset().count() == 1

    # Redriving again is a no-op (remaining row still fails).
    again = pipeline.replay_dlq(langs=list(LANGS) + ['klingon'])
    assert again.events_applied == 0
    assert pipeline.rejection_counts() == {'empty': 1}


@pytest.mark.usefixtures('ray_session')
def test_redrive_never_overrides_newer_writer(tmp_path):
    """A redriven old event must lose LWW to a newer already-applied row."""
    import ray.data as rd

    lake = str(tmp_path / 'lake2')
    pipeline = CDCPipeline(lake, num_partitions=2)
    log = pa.Table.from_pylist([
        # lsn 1 invalid (bad lang), lsn 2 valid newer write to SAME key.
        {'lsn': 1, 'op': 'insert', 'repo': 'org/r', 'path': 'f',
         'commit': 'a' * 40, 'lang': 'klingon', 'content': 'OLD'},
        {'lsn': 2, 'op': 'update', 'repo': 'org/r', 'path': 'f',
         'commit': 'b' * 40, 'lang': 'py', 'content': 'NEW'},
    ])
    pipeline.run(rd.from_arrow(log))

    from filters_ray.sources.synth import LANGS
    pipeline.replay_dlq(langs=list(LANGS) + ['klingon'])

    table = pipeline.final_table()
    assert table.num_rows == 1
    content = table.column('content').to_pylist()[0]
    content = content if isinstance(content, str) else content.decode()
    assert content == 'NEW'          # lsn 2 wins; redriven lsn 1 lost
    assert table.column('last_lsn').to_pylist() == [2]


@pytest.mark.usefixtures('ray_session')
def test_redrive_crash_between_commit_and_dlq_swap(tmp_path, monkeypatch):
    """ADVICE r1: a crash AFTER the manifest commit but BEFORE the DLQ
    file swap must lose no dead-letter rows — the old DLQ stays intact,
    and re-running the redrive converges to the correct state."""
    import json as _json
    import os

    import ray.data as rd

    from filters_ray.pipelines.cdc import CDCValidateStage, make_upsert_fn
    from filters_ray.sources.synth import LANGS
    from filters_ray.stages.validate import ORIGINAL_COLUMN

    lake = str(tmp_path / 'lake3')
    pipeline = CDCPipeline(lake, num_partitions=1)
    pipeline.run(rd.from_arrow(log_with_bad_langs()))
    assert pipeline.rejection_counts() == {'not_valid_choice': 10, 'empty': 1}

    dlq_dir = os.path.dirname(pipeline.store.dlq_path(0))
    files_before = sorted(
        f for f in os.listdir(dlq_dir) if f.endswith('.parquet')
    )
    assert files_before

    # Build the redrive group IN-PROCESS (replay_dlq's stages, no Ray)
    # so the injected crash hits the upsert function directly.
    import pyarrow.parquet as pq
    dlq_table = pa.concat_tables([
        pq.read_table(os.path.join(dlq_dir, f)) for f in files_before
    ])
    rows = [_json.loads(s) for s in dlq_table.column(ORIGINAL_COLUMN).to_pylist()]
    events = pa.table({
        'lsn': pa.array([r.get('lsn') for r in rows], type=pa.int64()),
        **{
            c: pa.array([r.get(c) for r in rows], type=pa.string())
            for c in ('op', 'repo', 'path', 'commit', 'lang', 'content')
        },
    })
    stage = CDCValidateStage(num_partitions=1, langs=list(LANGS) + ['klingon'])
    group = stage(events)

    real_replace = os.replace

    def crash_on_dlq_swap(src, dst, *a, **k):
        if 'dlq-' in os.path.basename(str(dst)):
            raise OSError('injected crash before DLQ swap')
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(os, 'replace', crash_on_dlq_swap)
    with pytest.raises(OSError, match='injected crash'):
        make_upsert_fn(lake, redrive=True)(group)
    monkeypatch.setattr(os, 'replace', real_replace)

    # Crash window: manifest/lake already carry the redriven rows, but
    # every pre-crash DLQ file is still on disk — nothing was lost.
    files_mid = sorted(
        f for f in os.listdir(dlq_dir) if f.endswith('.parquet')
    )
    assert set(files_before) <= set(files_mid)
    assert pipeline.final_table().num_rows == 30

    # Recovery: re-run the redrive through the normal pipeline path. The
    # pre-crash DLQ still holds the redriven rows, so they re-apply —
    # and the LWW merge makes that idempotent (state unchanged).
    redo = pipeline.replay_dlq(langs=list(LANGS) + ['klingon'])
    assert redo.events_applied == 10
    assert pipeline.final_table().num_rows == 30
    assert pipeline.rejection_counts() == {'empty': 1}
    assert pipeline.dlq_dataset().count() == 1
