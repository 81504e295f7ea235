"""Bloom-filter semi-join pushdown (stages/bloom.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from filters_ray.stages.bloom import (
    BloomFilter,
    bloom_semi_filter,
    build_bloom,
)


def test_no_false_negatives_ints():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    bf = BloomFilter.sized_for(len(keys))
    bf.add(keys)
    assert bf.contains(keys).all()


def test_no_false_negatives_strings():
    keys = np.array([f'repo-{i}/path/{i * 31}.py' for i in range(5_000)],
                    dtype=object)
    bf = BloomFilter.sized_for(len(keys))
    bf.add(keys)
    assert bf.contains(keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    present = rng.integers(0, 2**40, size=50_000, dtype=np.int64)
    absent = rng.integers(2**41, 2**42, size=50_000, dtype=np.int64)
    bf = BloomFilter.sized_for(len(present))  # 12 bits/key, k=7 → ~0.5%
    bf.add(present)
    fpr = bf.contains(absent).mean()
    assert fpr < 0.02, fpr


def test_union_is_mergeable():
    a_keys = np.arange(0, 1000, dtype=np.int64)
    b_keys = np.arange(1000, 2000, dtype=np.int64)
    a = BloomFilter(2**14)
    b = BloomFilter(2**14)
    a.add(a_keys)
    b.add(b_keys)
    u = a.union(b)
    assert u.contains(a_keys).all() and u.contains(b_keys).all()
    with pytest.raises(ValueError):
        a.union(BloomFilter(2**15))


def test_geometry_is_power_of_two_and_pinned():
    bf = BloomFilter(1000)  # rounds up
    assert bf.num_bits == 1024
    clone = BloomFilter(bf.num_bits, bf.num_hashes, bf.words)
    assert clone.num_bits == bf.num_bits
    with pytest.raises(ValueError):
        BloomFilter(2**14, words=np.zeros(4, dtype=np.uint64))


def test_build_and_probe_distributed(ray_session):
    import ray.data as rd

    build_keys = np.arange(0, 3000, 3, dtype=np.int64)      # multiples of 3
    probe_keys = np.arange(0, 3000, dtype=np.int64)
    build_ds = rd.from_arrow(pa.table({'k': build_keys}))
    probe_ds = rd.from_arrow(pa.table({'k': probe_keys,
                                       'payload': probe_keys * 10}))

    bloom = build_bloom(build_ds, 'k', expected_keys=len(build_keys))
    kept = bloom_semi_filter(probe_ds, 'k', bloom).to_pandas()

    # Superset of the true semi-join; false positives bounded.
    true = set(build_keys.tolist())
    kept_keys = set(kept['k'].tolist())
    assert true <= kept_keys
    assert len(kept_keys) <= len(true) * 1.05
    # Payload columns ride along untouched.
    assert (kept['payload'].to_numpy() == kept['k'].to_numpy() * 10).all()


def test_probe_drops_null_keys(ray_session):
    import ray.data as rd

    build_ds = rd.from_arrow(pa.table({'k': pa.array([1, 2, 3],
                                                     type=pa.int64())}))
    probe = pa.table({'k': pa.array([1, None, 3, 99], type=pa.int64())})
    bloom = build_bloom(build_ds, 'k', expected_keys=3)
    kept = bloom_semi_filter(rd.from_arrow(probe), 'k', bloom).to_pandas()
    assert kept['k'].notna().all()
    assert set(kept['k'].astype(int)) <= {1, 3, 99}
    assert {1, 3} <= set(kept['k'].astype(int))


def test_exact_join_after_bloom_matches_unfiltered(ray_session):
    """The end-to-end guarantee: bloom prefilter + exact join ≡ exact
    join without the prefilter."""
    import ray.data as rd

    from filters_ray.stages.cogroup import hash_bucket_join

    rng = np.random.default_rng(3)
    right = pa.table({
        'k': np.sort(rng.choice(10_000, size=800, replace=False)
                     .astype(np.int64)),
        'tag': np.arange(800, dtype=np.int64),
    })
    left = pa.table({
        'k': rng.integers(0, 10_000, size=5_000).astype(np.int64),
        'v': rng.integers(0, 100, size=5_000).astype(np.int64),
    })
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)

    bloom = build_bloom(rds, 'k', expected_keys=800)
    filtered = bloom_semi_filter(rd.from_arrow(left), 'k', bloom)

    plain = hash_bucket_join(lds, rds, left_on='k', right_on='k') \
        .to_pandas().sort_values(['k', 'v', 'tag']).reset_index(drop=True)
    pushed = hash_bucket_join(filtered, rds, left_on='k', right_on='k') \
        .to_pandas().sort_values(['k', 'v', 'tag']).reset_index(drop=True)
    assert plain.equals(pushed)
