"""Distributed set operations (INTERSECT / EXCEPT / UNION DISTINCT).

SQL set semantics over Dataset key projections. The reference engine has
no set operators (record-at-a-time transforms only, SURVEY.md §2.5);
these cover the job class users express today as paired reader jobs +
an external diff.

Shape: tag each side with membership flags, union the (projected) key
rows, ONE bounded groupby with Max-flag aggregates, then a vectorised
filter on the flags. The shuffle carries only the key columns plus two
int8-sized flags — payload columns never move. Max is the dup-safe
reduction (a key occurring 10^6 times on one side still reduces to one
flag), so skew degrades into map-side partial aggregation, not a hot
reducer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def set_op(a, b, *, on: list[str], op: str):
    """``op`` = intersect | except | union — DISTINCT semantics, like the
    SQL operators. ``on`` = the key columns (the output schema)."""
    from ray.data.aggregate import Max

    from .partition import bounded_groupby

    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(in_a: int, in_b: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(on)
            return t.append_column(
                "_in_a", pa.array([in_a] * t.num_rows, pa.int64())
            ).append_column("_in_b", pa.array([in_b] * t.num_rows, pa.int64()))

        return fn

    # pin the key dtypes: the sort-shuffle can surface timestamps in a
    # different unit (same leak _pin_ts_us plugs for window aggregates)
    sch = a.schema()
    key_types = {k: t for k, t in zip(sch.names, sch.types) if k in on}

    both = a.map_batches(tag(1, 0), batch_format="pyarrow").union(
        b.map_batches(tag(0, 1), batch_format="pyarrow")
    )
    flags = bounded_groupby(both, on).aggregate(
        Max("_in_a", alias_name="_in_a"), Max("_in_b", alias_name="_in_b")
    )

    def keep(t: pa.Table) -> pa.Table:
        ia, ib = t.column("_in_a"), t.column("_in_b")
        if op == "intersect":
            mask = pc.and_(pc.equal(ia, 1), pc.equal(ib, 1))
        elif op == "except":
            mask = pc.and_(pc.equal(ia, 1), pc.equal(ib, 0))
        else:  # union distinct: every surviving group qualifies
            mask = pc.equal(pc.add(ia, ib), pc.add(ia, ib))
        out = t.filter(mask).select(on)
        for k, typ in key_types.items():
            i = out.column_names.index(k)
            if out.column(k).type != typ:
                out = out.set_column(i, k, out.column(k).cast(typ))
        return out

    return flags.map_batches(keep, batch_format="pyarrow")
