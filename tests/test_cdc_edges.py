"""CDC edge cases: empty log, lake/DLQ readers, all-invalid log."""

from __future__ import annotations

import pyarrow as pa
import pytest

from filters_ray.pipelines.cdc import CDCPipeline
from filters_ray.sources.synth import SynthConfig, make_events


def empty_log() -> pa.Table:
    return pa.table({
        'lsn': pa.array([], type=pa.int64()),
        'op': pa.array([], type=pa.string()),
        'repo': pa.array([], type=pa.string()),
        'path': pa.array([], type=pa.string()),
        'commit': pa.array([], type=pa.string()),
        'lang': pa.array([], type=pa.string()),
        'content': pa.array([], type=pa.string()),
    })


@pytest.mark.usefixtures('ray_session')
def test_empty_log_is_a_noop(tmp_path):
    import ray.data as rd

    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=4)
    report = pipeline.run(rd.from_arrow(empty_log()))
    assert report.events_seen == 0
    assert pipeline.final_table().num_rows == 0
    assert pipeline.rejection_counts() == {}


@pytest.mark.usefixtures('ray_session')
def test_all_invalid_log_goes_entirely_to_dlq(tmp_path):
    import ray.data as rd

    n = 50
    log = pa.table({
        'lsn': pa.array(range(n), type=pa.int64()),
        'op': pa.array(['frobnicate'] * n),          # invalid op
        'repo': pa.array([''] * n),                  # empty repo
        'path': pa.array([f'f{i}' for i in range(n)]),
        'commit': pa.array(['zz'] * n),              # malformed commit
        'lang': pa.array(['py'] * n),
        'content': pa.array(['x'] * n),
    })
    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=4)
    report = pipeline.run(rd.from_arrow(log))
    assert report.events_applied == 0
    assert pipeline.final_table().num_rows == 0
    counts = pipeline.rejection_counts()
    assert counts['not_valid_choice'] == n
    assert counts['empty'] == n
    assert counts['malformed'] == n

    dlq = pipeline.dlq_dataset().to_pandas()
    assert len(dlq) == n
    assert '_original' in dlq.columns


@pytest.mark.usefixtures('ray_session')
def test_lake_reader_composes_with_ray_pipelines(tmp_path):
    import ray.data as rd
    from ray.data.aggregate import Count

    cfg = SynthConfig(n_keys=60, n_events=400, n_repos=6, seed=31,
                      invalid_rate=0.0, duplicate_rate=0.0)
    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=4)
    pipeline.run(rd.from_arrow(make_events(cfg)))

    lake = pipeline.as_dataset()
    per_lang = lake.groupby('lang').aggregate(Count(alias_name='n')).to_pandas()
    assert per_lang['n'].sum() == pipeline.final_table().num_rows
