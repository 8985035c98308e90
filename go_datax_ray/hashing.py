"""Deterministic hashing: partition assignment, salting, synth randomness.

The reference's fallback split strategy is ``CRC32(pk) % N == taskId``
(/root/reference/plugins/reader/mysqlreader/mysql_reader.go:432-444).
We generalise it to the engine's key-hash partitioner. Two hash families:

* ``md5_lower64`` — oracle-checkable: identical to DuckDB's
  ``md5_number_lower(s)`` (lower 16 hex digits of md5, little-endian),
  so partition histograms can be verified in SQL.
* ``splitmix64`` — fast vectorised integer mixer used for synthetic
  data generation (pure function of index; batch-boundary independent).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def md5_lower64(s: str | bytes) -> int:
    """Lower 64 bits of md5, matching DuckDB ``md5_number_lower``."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[8:16], "little")


def _utf8_slices(arr: pa.Array):
    """(memoryview, offsets) over an Arrow string array's UTF-8 data —
    per-row byte slices with NO Python str materialisation or re-encode."""
    if arr.offset != 0:
        arr = pa.concat_arrays([arr])  # compact the slice
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype, count=len(arr) + 1)
    return memoryview(arr.buffers()[2] or b""), offs


def _hash_string_array(values, hasher) -> np.ndarray:
    """Hash an Arrow/py sequence of strings with a bytes->uint64 hasher.

    Hot-path shape (VERDICT r1 finding #7): ``dictionary_encode`` (C++)
    collapses repeated keys, the Python-level hasher runs ONLY over the
    unique strings (zero-copy memoryview slices of the UTF-8 buffer),
    and a numpy gather fans the results back out. CDC keys repeat
    heavily (4M events over ~2k urls), so the per-row Python loop of the
    naive version becomes a per-UNIQUE loop. Nulls hash to 0.
    """
    if isinstance(values, pa.ChunkedArray):
        if values.num_chunks != 1:
            if values.num_chunks == 0:
                return np.zeros(0, dtype=np.uint64)
            return np.concatenate(
                [_hash_string_array(c, hasher) for c in values.chunks]
            )
        values = values.chunk(0)
    elif not isinstance(values, pa.Array):
        values = pa.array(list(values), pa.string())
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    enc = values.dictionary_encode()
    uniq = enc.dictionary
    if len(uniq) == 0:  # all-null column
        return np.zeros(n, dtype=np.uint64)
    mv, offs = _utf8_slices(uniq)
    hu = np.fromiter(
        (hasher(mv[offs[i] : offs[i + 1]]) for i in range(len(uniq))),
        dtype=np.uint64,
        count=len(uniq),
    )
    idx = enc.indices
    if values.null_count:
        mask = np.asarray(idx.is_null())
        out = hu[np.asarray(idx.fill_null(0))]
        out[mask] = 0
        return out
    return hu[np.asarray(idx)]


def md5_lower64_array(values) -> np.ndarray:
    """Vectorised md5_lower64 over an Arrow/np/py sequence of strings."""
    md5 = hashlib.md5
    return _hash_string_array(
        values, lambda b: int.from_bytes(md5(b).digest()[8:16], "little")
    )


def crc32_array(values) -> np.ndarray:
    """CRC32 per string — the reference's hash split function
    (mysql_reader.go:432-444), ~4x faster than md5 (zlib C loop)."""
    import zlib

    return _hash_string_array(values, zlib.crc32)


def partition_ids(urls, num_partitions: int, hash_fn: str = "crc32") -> np.ndarray:
    """part_id = hash(url) % P — the engine's key-hash partitioner.

    hash_fn="crc32" (default, reference-exact CRC32(pk)%N) for the
    pipeline hot path; "md5" (DuckDB md5_number_lower-compatible) where
    SQL-oracle checkability matters. Final table state is independent of
    the choice — it only moves placement."""
    h = crc32_array(urls) if hash_fn == "crc32" else md5_lower64_array(urls)
    return (h % np.uint64(num_partitions)).astype(np.int64)


# ---------------------------------------------------------------------------
# splitmix64: fast stateless PRNG for the deterministic generators.

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain constant set), vectorised."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (x + _U64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> _U64(31))


def mix_streams(indices: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Independent uint64 stream per (seed, stream, index) — stateless."""
    base = np.uint64((seed * 0x100000001B3 + stream * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        return splitmix64(indices.astype(np.uint64) ^ splitmix64(np.full(len(indices), base, dtype=np.uint64)))


def uniform01(indices: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Deterministic uniform [0,1) per index."""
    return mix_streams(indices, seed, stream).astype(np.float64) / 2.0**64
