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
