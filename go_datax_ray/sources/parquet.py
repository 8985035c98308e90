"""parquetreader: columnar lake/warehouse source.

The Ray-Data-native collapse of all 11 reference RDBMS readers
(mysql/postgresql/oracle/... — /root/reference/plugins/reader/*, all
the same SELECT-columns-WHERE-split pattern): columns prune at the
read, ``where`` becomes a pyarrow dataset filter expression (row-group
pushdown), and the reference's split strategies (splitPk ranges,
offset slices, CRC32 hash split — mysql_reader.go:214-444) map onto
fragment/row-group splitting which read_parquet does natively.
"""

from __future__ import annotations

from typing import Any

import pyarrow.compute as pc
import pyarrow.dataset as pads


_OPS = {
    ">": lambda f, v: f > v,
    ">=": lambda f, v: f >= v,
    "<": lambda f, v: f < v,
    "<=": lambda f, v: f <= v,
    "=": lambda f, v: f == v,
    "==": lambda f, v: f == v,
    "!=": lambda f, v: f != v,
}


def _coerce(val):
    """Job-JSON values arrive as strings (esp. after ${var} substitution);
    coerce numeric-looking ones so the Arrow kernel types line up."""
    if isinstance(val, str):
        try:
            return int(val)
        except ValueError:
            try:
                return float(val)
            except ValueError:
                return val
    return val


def build_filter(where: list[list] | None):
    """[["col", op, value], ...] conjunction -> pyarrow expression."""
    if not where:
        return None
    expr = None
    for col, op, val in where:
        e = _OPS[op](pc.field(col), _coerce(val))
        expr = e if expr is None else (expr & e)
    return expr


def read(param: dict[str, Any], *, channel: int = 1):
    import ray.data as rd

    kwargs: dict[str, Any] = {}
    cols = param.get("column")
    if cols and cols != ["*"]:
        kwargs["columns"] = list(cols)
    flt = build_filter(param.get("where"))
    if flt is not None:
        kwargs["filter"] = flt
    if channel > 1:
        kwargs["override_num_blocks"] = channel
    return rd.read_parquet(param["path"], **kwargs)
