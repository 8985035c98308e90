"""Key-hash partitioning with hot-key salting.

Generalises the reference's hash split — task i reads rows where
``CRC32(pk) % N == i`` (/root/reference/plugins/reader/mysqlreader/
mysql_reader.go:432-444) — into the engine's shuffle partitioner:
``part_id = md5_lower64(url) % P`` (DuckDB-checkable via
``md5_number_lower(url) % P``).

Salting: LWW dedup is associative+commutative (max over (warc_ts, lsn)),
so a hot key can be reduced in two phases — first within salted
sub-partitions ``(part_id, salt = lsn % S)``, then across salts —
without changing semantics. The reference has no salting (SURVEY.md
§2.7); its Cassandra token-range split (cassandra_reader.go:155-258) is
the nearest ancestor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import partition_ids


def add_part_id(batch: pa.Table, *, key: str = "url", num_partitions: int = 64,
                hash_fn: str = "crc32") -> pa.Table:
    """Vectorised stage: append part_id = hash(key) % P (crc32 default)."""
    pid = partition_ids(batch.column(key), num_partitions, hash_fn)
    return batch.append_column("part_id", pa.array(pid, pa.int64()))


def add_salt(batch: pa.Table, *, num_salts: int, salt_from: str = "lsn") -> pa.Table:
    """Append salt = lsn % S. Using lsn (unique) spreads a hot key evenly
    across S sub-reducers; correctness is unaffected because the LWW
    reduction is re-applied across salts afterwards."""
    vals = batch.column(salt_from).to_numpy().astype(np.int64)
    return batch.append_column("salt", pa.array(vals % num_salts, pa.int64()))


def partition_events(ds, *, key: str = "url", num_partitions: int = 64,
                     hash_fn: str = "crc32"):
    """Dataset stage: tag every event with its lake partition."""
    return ds.map_batches(
        add_part_id,
        fn_kwargs={"key": key, "num_partitions": num_partitions, "hash_fn": hash_fn},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def shuffle_blocks(requested: int | None = None) -> int:
    """Bound the block count feeding a sort shuffle: Ray's sort shuffle
    materialises O(blocks x reducers) object refs on the driver (reducers
    = input blocks), so unbounded map-stage block counts quadratically
    blow up driver heap. Default: 2 blocks per CPU, floor 64 — sized so
    reducers track cluster parallelism, not upstream file count."""
    if requested is not None:
        return requested
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:  # noqa: BLE001 — not initialised yet
        cpus = 32
    return max(64, cpus * 2)


def bounded_groupby(ds, keys):
    """groupby with the sort-shuffle fan-out bounded (see shuffle_blocks)."""
    return ds.repartition(shuffle_blocks()).groupby(keys)


def actor_pool(min_actors: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for stateful map_batches stages:
    ceiling tracks the cluster (cpus-2, floor 8) instead of a hardcoded
    8, so per-doc stages don't cap at a quarter of a 32-cpu box; the
    pool only grows when the backlog demands it, so a high ceiling is
    free for small inputs."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:  # noqa: BLE001
        cpus = 32
    return (min_actors, max(8, cpus - 2))
