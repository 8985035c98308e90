"""Last-writer-wins (LWW) dedup kernels.

Per key (url) keep the single row with max ``(warc_ts, lsn)``. ``lsn`` is
unique (total order of the log), so the winner is well-defined even under
``warc_ts`` ties (SURVEY.md §7.4). The winning row may be a tombstone
(op='D') — tombstones are kept through dedup and the lake merge, and only
filtered when reading final state, so a resumed replay cannot resurrect a
deleted url.

This is the engine's analogue of the reference's sink-side PK conflict
resolution — PostgreSQL ``ON CONFLICT (pk) DO UPDATE`` / MySQL
``ON DUPLICATE KEY UPDATE`` (/root/reference/common/database/rdbms/
writer/common.go:557-607) — expressed as an associative, commutative
reduction so it can run (1) within each Arrow batch as a combiner before
the shuffle, (2) per salted sub-partition, and (3) per partition group,
all with identical semantics.

Everything is vectorised: sort_indices over the (warc_ts, lsn) key
columns only, factorize keys, np.unique for first-winner selection, then
a single ``Table.take`` so the wide html payload moves once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

LWW_ORDER = [("warc_ts", "descending"), ("lsn", "descending")]


def lww_indices(table: pa.Table, key: str = "url") -> np.ndarray:
    """Row indices of the per-key winners (unspecified order)."""
    order = pc.sort_indices(
        table.select([k for k, _ in LWW_ORDER]), sort_keys=LWW_ORDER
    ).to_numpy()
    keys = table.column(key).take(pa.array(order))
    codes, _ = pd.factorize(keys.to_pandas(), use_na_sentinel=False)
    _, first = np.unique(codes, return_index=True)
    return order[first]


def lww_table(table: pa.Table, key: str = "url") -> pa.Table:
    """LWW-dedup a table: one winner row per key."""
    if table.num_rows <= 1:
        return table
    return table.take(pa.array(lww_indices(table, key)))


def lww_combine_batch(batch: pa.Table, *, min_reduction: float = 0.05) -> pa.Table:
    """Shuffle combiner: within-batch LWW. Drops superseded versions of a
    key before the all-to-all exchange, shrinking shuffle payload — the
    'pre-aggregate inside map_batches' rule for wide html rows.

    Adaptive: ``Table.take`` copies the whole (html-wide) batch, so when
    the in-batch duplicate ratio is below ``min_reduction`` the copy costs
    more than the shuffle bytes it saves — pass the batch through
    untouched (the merge LWWs anyway; correctness is unaffected). Hot-key
    streams blow past the threshold and still get combined."""
    if batch.num_rows <= 1:
        return batch
    idx = lww_indices(batch)
    if len(idx) >= batch.num_rows * (1.0 - min_reduction):
        return batch
    return batch.take(pa.array(idx))


def lww_sorted(table: pa.Table, key: str = "url") -> pa.Table:
    """LWW winners, sorted by key, with ONE payload copy: compose the
    winner selection and the key sort on indices before a single take
    (the html payload is the expensive thing to move)."""
    if table.num_rows <= 1:
        return table
    idx = lww_indices(table, key)
    keys = table.column(key).take(pa.array(idx))
    order = pc.sort_indices(keys)
    return table.take(pa.array(idx[order.to_numpy()]))


def dedup_events(ds, *, key: str = "url", combine_first: bool = True):
    """Dataset-level LWW dedup: optional per-batch combiner, then a
    per-partition group reduce. Requires a ``part_id`` column (from
    stages.partition); grouping on part_id (P groups) instead of url
    (millions of groups) keeps the shuffle coarse-grained."""
    if combine_first:
        ds = ds.map_batches(lww_combine_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("part_id").map_groups(lww_table, batch_format="pyarrow")
