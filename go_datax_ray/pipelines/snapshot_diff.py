"""Snapshot differ: derive a CDC event log from two table versions.

The classic bootstrap for CDC when no binlog exists (the reference's
"incremental sync" is exactly this, done crudely via WHERE re-query —
/root/reference/docs/USER_GUIDE.md:31-68): given OLD and NEW snapshots
keyed by ``key``, emit

    I  — key only in NEW
    U  — key in both, any compared column differs
    D  — key only in OLD (tombstone)

Expressed as one bucket-hash co-group (stages.joins machinery): both
snapshots are bucket-tagged and co-located with a single groupby; each
bucket pair diffs with a vectorised pandas merge. The produced events
feed straight into ``replay`` (lsns are assigned per event from a base
offset; deterministic order: sorted by key within op class).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import crc32_array


def diff_snapshots(old_ds, new_ds, *, key: str, compare_cols: list[str] | None = None,
                   n_buckets: int = 32, base_lsn: int = 0, ts_us: int = 0):
    """Dataset of CDC events (op in {I,U,D}) describing old -> new.

    Event columns: op, ``key``, all NEW columns (null for D), plus
    lsn/src_offset assigned deterministically: lsn = base_lsn +
    crc-free dense index by (bucket, key) sort order — stable across
    runs and parallelism.
    """
    old_names = old_ds.schema().base_schema.names
    new_names = new_ds.schema().base_schema.names
    cmp_cols = compare_cols or [c for c in new_names if c != key and c in old_names]

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            col = t.column(key)
            if pa.types.is_integer(col.type):
                h = col.cast(pa.int64()).to_numpy() % n_buckets
            else:
                h = crc32_array(col) % np.uint64(n_buckets)
            t = t.append_column("_bucket", pa.array(h.astype(np.int64), pa.int64()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    # conform both sides to the union column set (typed nulls for missing
    # columns) so the union has one schema
    union_types: dict[str, pa.DataType] = {}
    for f in new_ds.schema().base_schema:
        union_types[f.name] = f.type
    for f in old_ds.schema().base_schema:
        union_types.setdefault(f.name, f.type)
    union_names = list(union_types)

    def conform_side():
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n in union_names:
                cols[n] = (
                    t.column(n)
                    if n in t.column_names
                    else pa.nulls(t.num_rows, union_types[n])
                )
            return pa.table(cols)

        return fn

    old_t = old_ds.map_batches(conform_side(), batch_format="pyarrow").map_batches(
        tag("o"), batch_format="pyarrow"
    )
    new_t = new_ds.map_batches(conform_side(), batch_format="pyarrow").map_batches(
        tag("n"), batch_format="pyarrow"
    )
    both = old_t.union(new_t)

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["_bucket"].iloc[0]) if len(g) else 0
        o = g[g["_side"] == "o"].drop(columns=["_side", "_bucket"])
        n = g[g["_side"] == "n"].drop(columns=["_side", "_bucket"])
        merged = o.merge(n, on=key, how="outer", suffixes=("_o", ""), indicator=True)
        out_rows = []
        inserts = merged[merged["_merge"] == "right_only"]
        deletes = merged[merged["_merge"] == "left_only"]
        in_both = merged[merged["_merge"] == "both"]
        if len(in_both):
            changed = pd.Series(False, index=in_both.index)
            for c in cmp_cols:
                a, b = in_both[f"{c}_o"], in_both[c]
                changed |= ~((a == b) | (a.isna() & b.isna()))
            updates = in_both[changed]
        else:
            updates = in_both
        for df, op in ((inserts, "I"), (updates, "U"), (deletes, "D")):
            if not len(df):
                continue
            keep = df[[key] + [c for c in union_names if c != key]].copy()
            if op == "D":
                # payload from the OLD side is irrelevant for a tombstone
                for c in union_names:
                    if c != key:
                        keep[c] = None
            keep["op"] = op
            out_rows.append(keep)
        if not out_rows:
            return pd.DataFrame(columns=[key, *[c for c in union_names if c != key], "op", "_bucket"])
        out = pd.concat(out_rows, ignore_index=True)
        out["_bucket"] = bucket
        return out.sort_values([key]).reset_index(drop=True)

    from ..stages.partition import bounded_groupby

    return bounded_groupby(both, "_bucket").map_groups(diff_bucket, batch_format="pandas")
