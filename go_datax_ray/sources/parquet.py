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

import pyarrow as pa
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


def _coerce(val, typ=None):
    """Job-JSON values arrive as strings (esp. after ${var} substitution);
    coerce numeric-looking ones so the Arrow kernel types line up — but
    ONLY when the bound column is actually numeric. A string value bound
    against a STRING column must stay a string: [["sku","==","007"]]
    coerced to int 7 would change match semantics (leading zeros) or
    fail the Arrow kernel type check."""
    if not isinstance(val, str) or typ is None:
        return val
    if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)
            or pa.types.is_decimal(typ)):
        return val
    try:
        return int(val)
    except ValueError:
        try:
            return float(val)
        except ValueError:
            return val


def build_filter(where: list[list] | None, schema: pa.Schema | None = None):
    """[["col", op, value], ...] conjunction -> pyarrow expression.

    ``schema`` drives string->number coercion of job-JSON values (it is
    applied only to numeric columns); pass the source's schema whenever
    it is known."""
    if not where:
        return None
    expr = None
    for col, op, val in where:
        typ = None
        if schema is not None and col in schema.names:
            typ = schema.field(col).type
        e = _OPS[op](pc.field(col), _coerce(val, typ))
        expr = e if expr is None else (expr & e)
    return expr


TD_TIME_FORMAT = "%Y-%m-%d %H:%M:%S"


def time_window(param: dict[str, Any]) -> list[list] | None:
    """beginDateTime/endDateTime -> filter triplets on the timestamp
    column (tdenginereader parity: tdengine_reader.go:146-168 validates
    the '2006-01-02 15:04:05' format and begin < end, :349-355 renders
    ``_c0 >= begin AND _c0 < end``; TDengine's implicit first-timestamp
    alias _c0 is the default column name, configurable as tsColumn)."""
    begin, end = param.get("beginDateTime"), param.get("endDateTime")
    if not begin and not end:
        return None
    import datetime

    col = param.get("tsColumn") or "_c0"
    parsed = {}
    for key, val in (("beginDateTime", begin), ("endDateTime", end)):
        if val:
            try:
                parsed[key] = datetime.datetime.strptime(
                    str(val), TD_TIME_FORMAT)
            except ValueError:
                raise ValueError(
                    f"parameter [{key}] needs to conform to the "
                    f"[{TD_TIME_FORMAT}] format"
                )
    if len(parsed) == 2 and parsed["beginDateTime"] >= parsed["endDateTime"]:
        raise ValueError("parameter [beginDateTime] should be less than "
                         "parameter [endDateTime]")
    out = []
    if begin:
        out.append([col, ">=", parsed["beginDateTime"]])
    if end:
        out.append([col, "<", parsed["endDateTime"]])
    return out


def read(param: dict[str, Any], *, channel: int = 1):
    import ray.data as rd

    kwargs: dict[str, Any] = {}
    cols = param.get("column")
    if cols and cols != ["*"]:
        kwargs["columns"] = list(cols)
    where = param.get("where")
    tw = time_window(param)
    if tw:
        where = (list(where) if where else []) + tw
    schema = None
    if where:
        # Metadata-only schema probe so string filter values bind with
        # the bound column's real type (see _coerce).
        schema = pads.dataset(param["path"]).schema
    flt = build_filter(where, schema)
    if flt is not None:
        kwargs["filter"] = flt
    if channel > 1:
        kwargs["override_num_blocks"] = channel
    return rd.read_parquet(param["path"], **kwargs)
