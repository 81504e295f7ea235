"""Fast (vectorized) bench generator: determinism + oracle compatibility."""

from __future__ import annotations

import pyarrow.compute as pc
import pytest

from filters_ray.sources.synth_fast import make_events_fast


def test_deterministic():
    a = make_events_fast(5_000, n_keys=500, seed=9)
    b = make_events_fast(5_000, n_keys=500, seed=9)
    assert a.equals(b)
    c = make_events_fast(5_000, n_keys=500, seed=10)
    assert not a.equals(c)


def test_corruption_taxonomy_present():
    t = make_events_fast(20_000, n_keys=2_000, seed=42)
    assert t.filter(pc.less(t.column('lsn'), 0)).num_rows > 0
    assert t.filter(pc.equal(t.column('op'), 'upsert')).num_rows > 0
    assert t.filter(pc.equal(t.column('repo'), '')).num_rows > 0
    assert t.filter(pc.is_null(t.column('path'))).num_rows > 0
    # lsn unique among non-negative (event identity), modulo duplicates.
    lsns = [v for v in t.column('lsn').to_pylist() if v is not None and v >= 0]
    assert len(set(lsns)) > 0.9 * len(lsns)


@pytest.mark.usefixtures('ray_session')
def test_cdc_over_fast_log_matches_oracle(tmp_path):
    import ray.data as rd

    from filters_ray.pipelines.cdc import CDCPipeline
    from filters_ray.sources.oracle import final_state_digests, replay_oracle

    log = make_events_fast(3_000, n_keys=300, seed=21)
    oracle = replay_oracle(log.to_pylist())

    pipeline = CDCPipeline(str(tmp_path / 'lake'), num_partitions=8)
    pipeline.run(rd.from_arrow(log))

    assert final_state_digests(pipeline.final_table()) == oracle.sha256_by_key()
    assert pipeline.rejection_counts() == oracle.rejected_by_code
