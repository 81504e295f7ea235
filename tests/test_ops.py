"""Unit tests for the training-data ops: dedup, similarity, text, multimodal."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from filters_ray.pipelines.dedup import (
    MinHashStage,
    SimHashStage,
    _shingles,
    exact_dedup,
    jaccard,
    minhash_dedup,
)
from filters_ray.pipelines.multimodal import (
    AudioFeatureStage,
    DecodeImageStage,
    VideoFrameSampleStage,
)
from filters_ray.pipelines.similarity import knn_brute_force, knn_ivf
from filters_ray.pipelines.text import (
    LangIdStage,
    add_fingerprint,
    add_quality_score,
    add_token_count,
)

DOCS = [
    'the quick brown fox jumps over the lazy dog',
    'the quick brown fox jumps over the lazy cat',   # near-dup of 0
    'completely different content about ray data pipelines',
    'der schnelle braune fuchs springt über den faulen hund und die katze',
    'the quick brown fox jumps over the lazy dog',   # exact dup of 0
    '',
]


def docs_table():
    return pa.table({
        'doc_id': list(range(len(DOCS))),
        'text': DOCS,
    })


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_token_count_vectorized():
    out = add_token_count(docs_table())
    assert out.column('n_tokens_ws').to_pylist()[0] == 9
    assert out.column('n_tokens_ws').to_pylist()[-1] == 0


def test_quality_score_bounds():
    out = add_quality_score(docs_table())
    scores = out.column('quality_score').to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    # The empty doc gets the length penalty.
    assert scores[-1] < scores[0]


def test_fingerprint_stability_and_dups():
    out1 = add_fingerprint(docs_table())
    out2 = add_fingerprint(docs_table())
    fp1 = out1.column('fingerprint').to_pylist()
    assert fp1 == out2.column('fingerprint').to_pylist()  # deterministic
    assert fp1[0] == fp1[4]   # exact dups share fingerprints
    assert fp1[0] != fp1[2]


def test_lang_id_stage():
    stage = LangIdStage()
    out = stage(docs_table())
    preds = out.column('lang_pred').to_pylist()
    assert preds[0] == 'en'
    assert preds[3] == 'de'


def test_lang_id_detects_chinese():
    """zh profile (VERDICT r2 #6): CJK stopchars count without \\b (RE2
    word boundaries never fire between CJK codepoints)."""
    stage = LangIdStage()
    table = pa.table({
        'doc_id': [0, 1],
        'text': ['我有一个测试的句子，这是不错的例子。',
                 'the quick brown fox is in the yard'],
    })
    out = stage(table)
    assert out.column('lang_pred').to_pylist() == ['zh', 'en']


# ---------------------------------------------------------------------------
# dedup primitives
# ---------------------------------------------------------------------------


def test_shingles_and_jaccard():
    a = _shingles('abcdef', 3)
    assert a == {'abc', 'bcd', 'cde', 'def'}
    assert jaccard(a, a) == 1.0
    assert jaccard(a, set()) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_minhash_signature_similarity():
    stage = MinHashStage(num_perm=128, bands=32, shingle_k=4)
    s0 = stage.signature(DOCS[0])
    s1 = stage.signature(DOCS[1])
    s2 = stage.signature(DOCS[2])
    sim01 = (s0 == s1).mean()
    sim02 = (s0 == s2).mean()
    assert sim01 > 0.6            # near-dups agree on most permutations
    assert sim02 < 0.3
    # Deterministic across instances (fixed seed — pool consistency).
    assert (MinHashStage(num_perm=128, bands=32, shingle_k=4).signature(DOCS[0]) == s0).all()


def test_simhash_hamming():
    h0 = SimHashStage.simhash64(DOCS[0].split())
    h1 = SimHashStage.simhash64(DOCS[1].split())
    h2 = SimHashStage.simhash64(DOCS[2].split())
    ham01 = bin(h0 ^ h1).count('1')
    ham02 = bin(h0 ^ h2).count('1')
    assert ham01 < ham02


# ---------------------------------------------------------------------------
# distributed ops (Ray)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures('ray_session')
def test_exact_dedup_ray():
    import ray.data as rd

    out = exact_dedup(rd.from_arrow(docs_table())).to_pandas()
    # Docs 0 and 4 are exact dups (after normalization) → keep doc 0.
    assert 4 not in set(out['doc_id'])
    assert 0 in set(out['doc_id'])
    assert len(out) == len(DOCS) - 1


@pytest.mark.usefixtures('ray_session')
def test_minhash_dedup_ray():
    import ray.data as rd

    survivors, clusters = minhash_dedup(
        rd.from_arrow(docs_table()), num_perm=64, bands=16,
        shingle_k=4, threshold=0.6, concurrency=2,
    )
    ids = set(survivors.to_pandas()['doc_id'])
    # Cluster {0, 1, 4} keeps only doc 0.
    assert 0 in ids
    assert 4 not in ids
    assert 1 not in ids
    assert 2 in ids and 3 in ids


@pytest.mark.usefixtures('ray_session')
def test_knn_brute_force_and_ivf():
    import ray.data as rd

    rng = np.random.RandomState(3)
    mat = rng.normal(size=(200, 16))
    table = pa.table({
        'vec_id': list(range(200)),
        'embedding': [row.tolist() for row in mat],
    })
    ds = rd.from_arrow(table)
    query = mat[17]

    exact = knn_brute_force(ds, query[None, :], k=5)
    assert exact[0][0][0] == 17          # self is the best match
    assert exact[0][0][1] == pytest.approx(1.0)
    # Results sorted descending by cosine.
    sims = [s for _, s in exact[0]]
    assert sims == sorted(sims, reverse=True)

    approx = knn_ivf(ds, query[None, :], k=5, num_centroids=8, nprobe=8)
    # With nprobe = all centroids, IVF must equal brute force.
    assert [k for k, _ in approx[0]] == [k for k, _ in exact[0]]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def media_batch(n=8):
    rng = np.random.RandomState(0)
    return pa.table({
        'media_id': pa.array(range(n), type=pa.int64()),
        'media_type': pa.array(['image'] * n),
        'payload': pa.array([rng.bytes(64) for _ in range(n)], type=pa.large_binary()),
        'duration_ms': pa.array([1000 * i for i in range(n)], type=pa.int32()),
    })


def test_image_decode_stub_schema():
    stage = DecodeImageStage()
    out = stage(media_batch())
    assert 'payload' not in out.column_names  # heavy bytes dropped post-decode
    feats = out.column('features').to_pylist()
    assert len(feats[0]) == DecodeImageStage.FEATURE_DIM
    # Deterministic fake: same payload → same features.
    again = DecodeImageStage()(media_batch())
    assert again.column('features').to_pylist() == feats


def test_image_decode_strict_raises():
    stage = DecodeImageStage(strict=True)
    if stage._pil is None:
        with pytest.raises(NotImplementedError):
            stage(media_batch())


def test_audio_stage():
    out = AudioFeatureStage()(media_batch())
    assert len(out.column('audio_features').to_pylist()[0]) == AudioFeatureStage.FEATURE_DIM


def test_video_frame_sampling_layout():
    out = VideoFrameSampleStage(num_frames=3)(media_batch(4))
    assert out.num_rows == 12  # one row per (video, frame)
    assert set(out.column('frame').to_pylist()) == {0, 1, 2}


# ---------------------------------------------------------------------------
# distributed clustering / planted near-dups / recall (round 2)
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures('ray_session')
def test_connected_components_matches_union_find():
    """Distributed min-label propagation == min-rooted union-find on a
    random graph (VERDICT r1 #5)."""
    import ray.data as rd

    from filters_ray.pipelines.dedup import connected_components

    rng = np.random.RandomState(11)
    nodes = np.arange(60)
    edges = []
    for _ in range(70):
        a, b = rng.choice(nodes, size=2, replace=False)
        edges.append((int(min(a, b)), int(max(a, b))))
    pairs = rd.from_arrow(pa.table({
        'left': [e[0] for e in edges],
        'right': [e[1] for e in edges],
    }))

    # Reference: local union-find with min roots.
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    expected = {n: find(n) for n in set(x for e in edges for x in e)}

    got = {
        r['node']: r['label']
        for r in connected_components(pairs).take_all()
    }
    assert got == expected


@pytest.mark.usefixtures('ray_session')
def test_minhash_dedup_distributed_cc_path():
    """Forcing the distributed-CC branch must give the same clusters as
    the driver union-find branch."""
    import ray.data as rd

    drv = minhash_dedup(
        rd.from_arrow(docs_table()), num_perm=64, bands=16,
        shingle_k=4, threshold=0.6, concurrency=2,
    )[1]
    dist = minhash_dedup(
        rd.from_arrow(docs_table()), num_perm=64, bands=16,
        shingle_k=4, threshold=0.6, concurrency=2,
        cc_driver_threshold=0,
    )[1]
    assert drv == dist
    assert drv  # the {0,1,4} cluster exists


@pytest.mark.usefixtures('ray_session')
def test_embedding_neardup_planted_recall():
    """Banded hyperplane LSH must recover ≥90% of planted near-dup
    pairs and no false positives at threshold 0.99 (VERDICT r1 #2)."""
    import ray.data as rd

    from filters_ray.pipelines.dedup import embedding_dedup

    rng = np.random.RandomState(21)
    n, dim = 300, 32
    base = rng.normal(size=(n, dim))
    planted = []
    rows_id, rows_vec = list(range(n)), [r.tolist() for r in base]
    for i in range(0, n, 20):
        noise = 0.05 * rng.normal(size=dim)
        rows_id.append(10_000 + i)
        rows_vec.append((base[i] + noise).tolist())
        planted.append((i, 10_000 + i))
    ds = rd.from_arrow(pa.table({'vec_id': rows_id, 'embedding': rows_vec}))
    pairs = embedding_dedup(ds, threshold=0.99).to_pandas()
    got = set(zip(pairs['left'], pairs['right']))
    recall = len(got & set(planted)) / len(planted)
    assert recall >= 0.9, (recall, got)
    assert not got - set(planted)  # random vectors never hit 0.99


@pytest.mark.usefixtures('ray_session')
def test_ivf_recall_vs_brute_force():
    """IVF with nprobe < num_centroids: recall@10 ≥ 0.9 vs brute force
    (VERDICT r1 #10)."""
    import ray.data as rd

    rng = np.random.RandomState(9)
    # Clustered corpus (IVF's design point): 8 well-separated centers,
    # points = center + small noise, so true neighbours share a list.
    centers = rng.normal(size=(8, 24)) * 4.0
    assign = rng.randint(0, 8, size=400)
    mat = centers[assign] + 0.4 * rng.normal(size=(400, 24))
    ds = rd.from_arrow(pa.table({
        'vec_id': list(range(400)),
        'embedding': [r.tolist() for r in mat],
    }))
    queries = mat[[5, 100, 250]]
    exact = knn_brute_force(ds, queries, k=10)
    approx = knn_ivf(ds, queries, k=10, num_centroids=8, nprobe=4)
    recalls = []
    for e, a in zip(exact, approx):
        e_ids = {k for k, _ in e}
        a_ids = {k for k, _ in a}
        recalls.append(len(e_ids & a_ids) / len(e_ids))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


# ---------------------------------------------------------------------------
# dependency-free media codecs (round 2: de-stubbed decode)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_decode():
    from filters_ray.pipelines.codecs import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    img = rng.rand(13, 21)  # odd sizes exercise 4-byte row padding
    payload = encode_bmp(img)
    w, h, gray = decode_bmp(payload)
    assert (w, h) == (21, 13)
    expected = (np.clip(img, 0, 1) * 255).astype(np.uint8) / 255.0
    assert np.allclose(gray, expected, atol=1e-6)


def test_ppm_roundtrip_decode():
    from filters_ray.pipelines.codecs import decode_ppm, encode_ppm

    rng = np.random.RandomState(4)
    img = rng.rand(9, 17)
    w, h, gray = decode_ppm(encode_ppm(img))
    assert (w, h) == (17, 9)
    expected = (np.clip(img, 0, 1) * 255).astype(np.uint8) / 255.0
    assert np.allclose(gray, expected, atol=1e-6)


def test_ppm_p6_with_comment():
    from filters_ray.pipelines.codecs import decode_ppm

    payload = b'P6 # a comment\n# another\n4 2\n255\n' + bytes(range(24))
    w, h, gray = decode_ppm(payload)
    assert (w, h) == (4, 2)
    assert gray.shape == (2, 4)


def test_wav_roundtrip_decode():
    from filters_ray.pipelines.codecs import decode_wav, encode_wav

    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, channels, samples = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000 and channels == 1
    assert len(samples) == 8000
    assert np.allclose(samples, sig, atol=1e-3)


def test_codec_rejects_garbage():
    from filters_ray.pipelines.codecs import (
        decode_bmp, decode_ppm, decode_wav, sniff_format,
    )

    junk = b'\x00' * 100
    assert sniff_format(junk) is None
    for dec in (decode_bmp, decode_ppm, decode_wav):
        with pytest.raises(ValueError):
            dec(junk)
    # truncated BMP: valid header, missing pixels
    from filters_ray.pipelines.codecs import encode_bmp
    good = encode_bmp(np.zeros((8, 8)))
    with pytest.raises(ValueError):
        decode_bmp(good[:60])


def test_image_stage_real_bmp_decode():
    from filters_ray.pipelines.codecs import encode_bmp

    rng = np.random.RandomState(6)
    imgs = [rng.rand(10 + i, 20 + i) for i in range(4)]
    batch = pa.table({
        'media_id': pa.array(range(4), type=pa.int64()),
        'media_type': pa.array(['image'] * 4),
        'payload': pa.array([encode_bmp(i) for i in imgs], type=pa.large_binary()),
    })
    out = DecodeImageStage(strict=True)(batch)  # strict: no fake allowed
    assert out.column('decoded_width').to_pylist() == [20, 21, 22, 23]
    assert out.column('decoded_height').to_pylist() == [10, 11, 12, 13]
    feats = out.column('features').to_pylist()
    assert all(len(f) == DecodeImageStage.FEATURE_DIM for f in feats)
    # Features come from the actual pixels: distinct images -> distinct.
    assert feats[0] != feats[1]


def test_audio_stage_real_wav_decode():
    from filters_ray.pipelines.codecs import encode_wav

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    quiet = 0.1 * np.sin(2 * np.pi * 220 * t)
    loud = 0.9 * np.sin(2 * np.pi * 220 * t)
    batch = pa.table({
        'media_id': pa.array([0, 1], type=pa.int64()),
        'media_type': pa.array(['audio'] * 2),
        'payload': pa.array(
            [encode_wav(quiet, 8000), encode_wav(loud, 8000)],
            type=pa.large_binary(),
        ),
    })
    out = AudioFeatureStage(strict=True)(batch)
    assert out.column('decoded_ms').to_pylist() == [500, 500]
    f_quiet, f_loud = out.column('audio_features').to_pylist()
    assert max(f_loud) > max(f_quiet) * 5  # real RMS, not a hash


# ---------------------------------------------------------------------------
# round-3 scale knobs: byte-capped broadcast verify, sized bucket counts
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures('ray_session')
def test_verify_byte_cap_routes_to_shuffle_join():
    """Few-but-huge docs must take the shuffle-join verify path (VERDICT
    r2 #8) and produce the same verified pairs as the broadcast path."""
    import ray.data as rd

    from filters_ray.pipelines.dedup import minhash_candidates, verify_jaccard_pairs

    big_a = 'lorem ipsum dolor sit amet consectetur ' * 2000
    big_b = big_a + 'tail'
    table = pa.table({
        'doc_id': [1, 2, 3],
        'text': [big_a, big_b, 'tiny unrelated doc about something else'],
    })
    ds = rd.from_arrow(table)
    pairs = minhash_candidates(ds, num_perm=32, bands=8, shingle_k=4)

    def norm(df):
        return sorted(zip(df['left'], df['right'], np.round(df['jaccard'], 9)))

    broadcast = norm(verify_jaccard_pairs(pairs, ds, threshold=0.5).to_pandas())
    # Matched candidate texts are ~160 KB >> 64 bytes → shuffle path.
    shuffled = norm(verify_jaccard_pairs(
        pairs, ds, threshold=0.5, broadcast_byte_limit=64,
    ).to_pandas())
    assert shuffled == broadcast
    assert any(l == 1 and r == 2 for l, r, _ in shuffled)


@pytest.mark.usefixtures('ray_session')
def test_minhash_pairs_bucket_count_independent():
    """Sub-/pair-bucket counts only co-locate keys — the candidate pair
    set must be identical under any bucket sizing (VERDICT r2 #4)."""
    import ray.data as rd

    from filters_ray.pipelines.dedup import minhash_candidates

    ds = rd.from_arrow(docs_table())
    a = minhash_candidates(ds, num_perm=32, bands=8, shingle_k=4).to_pandas()
    b = minhash_candidates(ds, num_perm=32, bands=8, shingle_k=4,
                           sub_buckets=7, pair_buckets=3).to_pandas()

    def norm(df):
        return sorted(zip(df['left'], df['right']))

    assert norm(a) == norm(b)
    assert norm(a)  # non-vacuous: docs 0/1/4 produce candidates


def test_bucket_count_bounds_per_group_rows():
    """_bucket_count keeps rows-per-group ≤ target at ANY corpus size
    (uniform keys) instead of the old fixed 64 (VERDICT r2 #4)."""
    from filters_ray.pipelines.queries import _bucket_count

    assert _bucket_count(0) == 64
    assert _bucket_count(10_000) == 64          # floor at small scale
    for rows in (10**6, 10**8, 10**10):
        nb = _bucket_count(rows)
        assert rows / nb <= 131072
    assert _bucket_count(10**10) >= 10**10 // 131072


def test_pii_redact_stage():
    from filters_ray.pipelines.text import PiiRedactStage

    t = pa.table({
        'doc_id': [1, 2, 3],
        'text': [
            'mail me at jane.doe+spam@example.co.uk thanks',
            'server 192.168.1.254 called 555-123-4567; ssn 321-54-9876',
            'nothing sensitive here',
        ],
    })
    out = PiiRedactStage('text', out_column='scrubbed')(t)
    scrubbed = out.column('scrubbed').to_pylist()
    assert scrubbed[0] == 'mail me at <EMAIL> thanks'
    assert scrubbed[1] == 'server <IP> called <PHONE>; ssn <SSN>'
    assert scrubbed[2] == 'nothing sensitive here'
    assert out.column('n_email').to_pylist() == [1, 0, 0]
    assert out.column('n_ipv4').to_pylist() == [0, 1, 0]
    assert out.column('n_phone').to_pylist() == [0, 1, 0]
    assert out.column('n_ssn').to_pylist() == [0, 1, 0]
    # In-place mode replaces the source column.
    inplace = PiiRedactStage('text')(t)
    assert inplace.column('text').to_pylist()[0] == 'mail me at <EMAIL> thanks'
    assert 'scrubbed' not in inplace.column_names


def test_resize_image_stage_real_bmp():
    from filters_ray.pipelines.codecs import decode_bmp, encode_bmp
    from filters_ray.pipelines.multimodal import ResizeImageStage

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(48, 32)).astype(np.uint8)
    t = pa.table({
        'media_id': pa.array([1], type=pa.int64()),
        'payload': pa.array([encode_bmp(gray)], type=pa.binary()),
    })
    out = ResizeImageStage(target_size=16)(t)
    assert out.column('resized').to_pylist() == [True]
    w, h, small = decode_bmp(out.column('payload')[0].as_py())
    assert (w, h) == (16, 16)
    # Nearest-neighbor: corner pixels survive exactly (decoded gray is
    # float in [0,1]; the source was uint8).
    assert small[0, 0] == pytest.approx(gray[0, 0] / 255.0, abs=1e-6)


def test_resize_image_stage_unknown_format_passthrough_and_strict():
    from filters_ray.pipelines.multimodal import ResizeImageStage

    t = pa.table({
        'media_id': pa.array([1], type=pa.int64()),
        'payload': pa.array([b'\x89PNG fake'], type=pa.binary()),
    })
    out = ResizeImageStage(target_size=16)(t)
    assert out.column('resized').to_pylist() == [False]
    assert out.column('payload').to_pylist() == [b'\x89PNG fake']
    with pytest.raises(NotImplementedError):
        ResizeImageStage(target_size=16, strict=True)(t)
