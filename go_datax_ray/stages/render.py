"""Column conversion + text rendering with the reference's exact semantics.

Covers the 7-type casting matrix (/root/reference/common/element/
column.go:139-508) and the two sink rendering profiles:

* txtfile profile (/root/reference/plugins/writer/txtfilewriter/
  txtfile_writer.go:327-359): long %d, double shortest round-trip
  without exponent (strconv 'f' -1), bool true/false, date via
  dateFormat (default "2006-01-02 15:04:05"), bytes lowercase hex,
  null -> nullFormat.
* stream profile (/root/reference/plugins/writer/streamwriter/
  stream_writer.go:224-255): doubles "%.6f", null -> "".

Reader-side lenient conversion (/root/reference/plugins/reader/
txtfilereader/txtfile_reader.go:434-486): nullFormat or "" -> null
(the reference's ""≡NULL conflation), failed long -> 0, failed double
-> 0.0, failed bool -> false, date tried against format then the
fallback list, failure -> null (deviation: the reference degrades to a
string column, impossible in a typed Arrow column — documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import STRFTIME_DATE_FALLBACKS, go_layout_to_strftime

GO_DEFAULT_DATETIME = "%Y-%m-%d %H:%M:%S"  # "2006-01-02 15:04:05"


# ------------------------------------------------------------- conversion
def strings_to_typed(
    arr: pa.Array | pa.ChunkedArray,
    col_type: str,
    fmt: str = "",
    null_format: str = "\\N",
) -> pa.Array:
    """Lenient string -> typed column, reference reader semantics."""
    s = pd.Series(
        arr.to_pandas() if isinstance(arr, (pa.Array, pa.ChunkedArray)) else arr,
        dtype="object",
    )
    isnull = s.isna() | (s == null_format) | (s == "")
    if col_type == "long":
        # failed parse -> 0 (reference); float-looking longs truncate
        vals = pd.to_numeric(s.where(~isnull), errors="coerce").fillna(0).astype("int64")
        return pa.array(
            [None if n else int(v) for n, v in zip(isnull.values, vals.values)], pa.int64()
        )
    if col_type == "double":
        vals = pd.to_numeric(s.where(~isnull), errors="coerce").fillna(0.0)
        return pa.array(
            [None if n else float(v) for n, v in zip(isnull.values, vals.values)],
            pa.float64(),
        )
    if col_type in ("bool", "boolean"):
        def to_b(v):
            try:
                low = str(v).lower()
                if low in ("1", "t", "true"):
                    return True
                if low in ("0", "f", "false"):
                    return False
                return False  # failed parse -> false (reference)
            except Exception:  # noqa: BLE001
                return False

        return pa.array(
            [None if n else to_b(v) for n, v in zip(isnull.values, s.values)], pa.bool_()
        )
    if col_type == "date":
        formats = []
        if fmt:
            formats.append(go_layout_to_strftime(fmt) if any(c.isdigit() for c in fmt) else fmt)
        formats += STRFTIME_DATE_FALLBACKS
        parsed = pd.Series([pd.NaT] * len(s))
        remaining = ~isnull
        for f in formats:
            if not remaining.any():
                break
            attempt = pd.to_datetime(s[remaining], format=f, errors="coerce")
            ok = attempt.notna()
            parsed.loc[attempt.index[ok]] = attempt[ok]
            remaining.loc[attempt.index[ok]] = False
        return pa.Array.from_pandas(parsed, type=pa.timestamp("us"))
    if col_type == "bytes":
        return pa.array(
            [None if n else str(v).encode("utf-8") for n, v in zip(isnull.values, s.values)],
            pa.binary(),
        )
    # string: "" and nullFormat are null (the reference conflation)
    return pa.array(
        [None if n else str(v) for n, v in zip(isnull.values, s.values)], pa.string()
    )


# -------------------------------------------------------------- rendering
def _double_shortest(v: float) -> str:
    """Go strconv.FormatFloat(v, 'f', -1, 64): shortest round-trip decimal,
    never exponent notation."""
    return np.format_float_positional(v, trim="-")


def render_value(v, typ: pa.DataType, *, profile: str = "txtfile",
                 null_format: str = "\\N", date_format: str | None = None) -> str:
    """Render one value per the reference sink profile."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "" if profile == "stream" else null_format
    if pa.types.is_integer(typ):
        return str(int(v))
    if pa.types.is_floating(typ):
        return f"{v:.6f}" if profile == "stream" else _double_shortest(float(v))
    if pa.types.is_boolean(typ):
        return "true" if v else "false"
    if pa.types.is_timestamp(typ):
        fmt = date_format or GO_DEFAULT_DATETIME
        return v.strftime(fmt)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return v.hex()
    return str(v)


def render_table(t: pa.Table, *, profile: str = "txtfile", null_format: str = "\\N",
                 date_format: str | None = None, delimiter: str = ",") -> list[str]:
    """Render a table into delimiter-joined text lines (golden-output
    parity with the reference sinks)."""
    cols = [t.column(i).to_pylist() for i in range(t.num_columns)]
    types = [f.type for f in t.schema]
    lines = []
    for row in zip(*cols):
        lines.append(
            delimiter.join(
                render_value(v, ty, profile=profile, null_format=null_format,
                             date_format=date_format)
                for v, ty in zip(row, types)
            )
        )
    return lines
