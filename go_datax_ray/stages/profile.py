"""Single-pass column profiling (data-quality stats).

The deequ/great-expectations-style completeness check users run around
an ingest engine: per column, row count, null count and min/max — in
ONE streaming pass. The reference has nothing comparable (its quality
surface is errorLimit counters, SURVEY.md §2.6); at 100 TB a profile
pass is how you validate an ingest before pointing consumers at it.

Shape: every batch emits one tiny partial row per profiled column
(vectorised pc.min_max / null_count — no Python per row), then a
column-count-sized groupby merges partials (Sum/Sum/Min/Max are all
associative). The shuffle carries O(columns x blocks) rows of five
ints, never data.

Uniform output schema regardless of column type:
  (col, n, nulls, min_v, max_v) — all int64 except col.
Integers/timestamps profile their values; strings profile their UTF-8
LENGTHS (min/max length is the classic profile stat for text and keeps
the schema uniform + SQL-replicable: MIN(LENGTH(c))). Floats are
profiled in exact integer cents. All-null / zero-row partials emit
nulls for min/max so they never skew the merge.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _col_stats(col, typ) -> tuple[int, int, int | None, int | None]:
    n = len(col)
    nulls = col.null_count
    if n == nulls:
        return n, nulls, None, None
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        vals = pc.utf8_length(col)
    elif pa.types.is_floating(typ):
        vals = pc.cast(
            pc.round(pc.multiply(pc.cast(col, pa.float64()), 100.0),
                     options=pc.RoundOptions(round_mode="half_towards_infinity")),
            pa.int64(),
        )
    elif pa.types.is_timestamp(typ) or pa.types.is_integer(typ):
        vals = col.cast(pa.int64())
    else:  # bool/binary/other: profile presence only
        return n, nulls, None, None
    mm = pc.min_max(vals)
    return n, nulls, mm["min"].as_py(), mm["max"].as_py()


def profile_columns(ds, *, columns: list[str] | None = None):
    """One row per profiled column: (col, n, nulls, min_v, max_v)."""
    from ray.data.aggregate import Max, Min, Sum

    from .partition import bounded_groupby

    def partial(t: pa.Table) -> pa.Table:
        cols = columns if columns is not None else t.column_names
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            typ = t.schema.field(c).type
            n, nu, lo, hi = _col_stats(t.column(c), typ)
            names.append(c)
            ns.append(n)
            nulls.append(nu)
            mins.append(lo)
            maxs.append(hi)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.int64()),
                "max_v": pa.array(maxs, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = bounded_groupby(parts, "col").aggregate(
        Sum("n", alias_name="n"),
        Sum("nulls", alias_name="nulls"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )

    def conform(t: pa.Table) -> pa.Table:
        for c in ("n", "nulls", "min_v", "max_v"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, t.column(c).cast(pa.int64()))
        return t

    return out.map_batches(conform, batch_format="pyarrow")
