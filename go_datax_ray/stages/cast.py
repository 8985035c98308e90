"""The 7-type casting matrix, vectorised.

Reference semantics (/root/reference/common/element/column.go:139-508):

| from \\ to | long | double | string | date | bool | bytes |
|---|---|---|---|---|---|---|
| long   | id | float | %d | unix-seconds->ts | !=0 | %d utf8 |
| double | trunc | id | shortest 'f' | unix-seconds->ts | !=0 | utf8 |
| string | parse! | parse! | id | parse! | parse | utf8 |
| date   | unix SECONDS (column.go:272-277) | unix seconds float | "2006-01-02 15:04:05" (column.go:265-270) | id | error->null | utf8 |
| bool   | 1/0 | 1/0 | true/false | error->null | id | utf8 |
| bytes  | parse text | parse text | raw utf8 | parse text | parse | id |

"parse!" = string->long/double/date are ERRORS in the reference (readers
parse eagerly instead); here they raise unless ``lenient=True`` (then the
reader-side lenient rules from stages.render apply). Error cells -> null.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .render import GO_DEFAULT_DATETIME, _double_shortest, strings_to_typed

_KIND = {
    "long": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "date": pa.timestamp("us"),
    "bool": pa.bool_(),
    "bytes": pa.binary(),
}


def _type_name(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_timestamp(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    return "string"


def cast_column(col: pa.ChunkedArray | pa.Array, to: str, *, lenient: bool = False) -> pa.Array:
    """Cast one column with the reference matrix semantics."""
    if to not in _KIND and to != "boolean":
        raise ValueError(f"unknown cast target {to!r}; one of {sorted(_KIND)}")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    src = _type_name(col.type)
    if src == to:
        return col

    if src == "date":
        secs = pc.divide(col.cast(pa.int64()), 1_000_000)  # us -> unix SECONDS
        if to == "long":
            return secs.cast(pa.int64())
        if to == "double":
            return secs.cast(pa.float64())
        # Arrow %S renders fractional digits; truncate to seconds first so
        # the output is exactly "2006-01-02 15:04:05" (column.go:265-270)
        secs_ts = col.cast(pa.timestamp("s"))
        if to == "string":
            return pc.strftime(secs_ts, format=GO_DEFAULT_DATETIME)
        if to == "bytes":
            return pc.strftime(secs_ts, format=GO_DEFAULT_DATETIME).cast(pa.binary())
        if to == "bool":
            return pa.nulls(len(col), pa.bool_())  # error cell -> null

    if src == "bool":
        if to == "long":
            return col.cast(pa.int64())
        if to == "double":
            return col.cast(pa.float64())
        if to == "string":
            return pc.if_else(col, pa.scalar("true"), pa.scalar("false"))
        if to == "bytes":
            return pc.if_else(col, pa.scalar("true"), pa.scalar("false")).cast(pa.binary())
        if to == "date":
            return pa.nulls(len(col), pa.timestamp("us"))

    if src in ("long", "double"):
        if to == "date":  # numeric treated as unix seconds
            return pc.multiply(col.cast(pa.int64()), 1_000_000).cast(pa.timestamp("us"))
        if to == "bool":
            return pc.not_equal(col, pa.scalar(0).cast(col.type))
        if to == "string":
            if src == "double":
                return pa.array(
                    [None if v is None else _double_shortest(v) for v in col.to_pylist()],
                    pa.string(),
                )
            return pc.cast(col, pa.string())
        if to == "bytes":
            return cast_column(col, "string").cast(pa.binary())
        return col.cast(_KIND[to])

    if src == "bytes":
        as_str = col.cast(pa.string())  # raw utf-8 (column.go bytes->string)
        if to == "string":
            return as_str
        return cast_column(as_str, to, lenient=True)

    # src == string
    if to in ("long", "double", "date") and not lenient:
        raise pa.ArrowInvalid(
            f"string->{to} is an error in the reference casting matrix "
            "(readers parse eagerly); pass lenient=True for reader semantics"
        )
    if to == "bytes":
        return col.cast(pa.binary())
    return strings_to_typed(col, "boolean" if to == "bool" else to)


def dx_cast(t: pa.Table, column: str, to: str, *, lenient: bool = False) -> pa.Table:
    """Table-level cast transform (config-chain friendly)."""
    out = cast_column(t.column(column), to, lenient=lenient)
    return t.set_column(t.column_names.index(column), column, out)
