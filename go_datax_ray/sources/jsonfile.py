"""jsonfilereader: JSON-array / JSONL files -> Dataset, reference semantics.

Mirrors /root/reference/plugins/reader/jsonfilereader/jsonfile_reader.go:
format auto-sniff by first non-space byte '[' vs '{' (:378-400,890-912),
recursive dir walk + glob (:168-324 — shared resolve_paths), dotted-path
nested field extraction (:1067-1085), per-type conversion with RFC3339
etc. date fallbacks (:1087-1172), and sampled schema inference: <=100
rows from <=3 files, per-field type frequencies, >=80%-majority type with
name/pattern date sniffing (:403-456,612-738).
"""

from __future__ import annotations

import json
import re
from typing import Any

import pandas as pd
import pyarrow as pa

from ..config import JSON_DATE_FALLBACKS
from ..sources.txtfile import _open_decompressed, resolve_paths

_DATE_NAME_RE = re.compile(r"(date|time|_at|_on)$", re.I)
_DATE_VAL_RE = re.compile(r"^\d{4}[-/]\d{2}[-/]\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?")


def load_json_rows(fpath: str, compress: str | None = None) -> list[dict]:
    """Sniff JSON array vs JSONL by first non-space byte and load rows."""
    data = _open_decompressed(fpath, compress)
    stripped = data.lstrip()
    if stripped[:1] == b"[":
        rows = json.loads(stripped)
        return rows if isinstance(rows, list) else [rows]
    rows = []
    for line in data.splitlines():
        line = line.strip()
        if line:
            rows.append(json.loads(line))
    return rows


def get_dotted(obj: Any, path: str) -> Any:
    """a.b.c nested access (jsonfile_reader.go:1067-1085)."""
    cur = obj
    for part in path.split("."):
        if isinstance(cur, dict):
            cur = cur.get(part)
        elif isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


def _value_type(v: Any, name: str) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        if _DATE_VAL_RE.match(v) or (_DATE_NAME_RE.search(name) and _DATE_VAL_RE.match(v)):
            return "date"
        return "string"
    return "string"  # nested -> re-serialised to string


def infer_schema(paths: list[str], *, sample_rows: int = 100, sample_files: int = 3,
                 majority: float = 0.8) -> list[dict[str, Any]]:
    """Sampled >=80%-majority type inference (jsonfile_reader.go:403-677)."""
    counts: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    order: list[str] = []
    seen = 0
    for p in paths[:sample_files]:
        for row in load_json_rows(p):
            if seen >= sample_rows:
                break
            seen += 1
            for k, v in row.items():
                if k not in totals:
                    totals[k] = 0
                    counts[k] = {}
                    order.append(k)
                t = _value_type(v, k)
                if t is not None:
                    totals[k] += 1
                    counts[k][t] = counts[k].get(t, 0) + 1
    out = []
    for k in order:
        best, n = ("string", 0)
        for t, c in counts[k].items():
            if c > n:
                best, n = t, c
        if totals[k] == 0 or n / totals[k] < majority:
            best = "string"
        out.append({"name": k, "type": best})
    return out


def _convert(values: list[Any], ctype: str) -> pa.Array:
    if ctype == "long":
        out = []
        for v in values:
            if v is None:
                out.append(None)
            else:
                try:
                    out.append(int(float(v)))
                except (TypeError, ValueError):
                    out.append(0)
        return pa.array(out, pa.int64())
    if ctype == "double":
        out = []
        for v in values:
            if v is None:
                out.append(None)
            else:
                try:
                    out.append(float(v))
                except (TypeError, ValueError):
                    out.append(0.0)
        return pa.array(out, pa.float64())
    if ctype in ("bool", "boolean"):
        return pa.array(
            [None if v is None else (v if isinstance(v, bool) else str(v).lower() in ("1", "t", "true"))
             for v in values],
            pa.bool_(),
        )
    if ctype == "date":
        parsed = []
        for v in values:
            if v is None:
                parsed.append(None)
                continue
            ts = None
            for f in JSON_DATE_FALLBACKS:
                try:
                    ts = pd.to_datetime(str(v), format=f)
                    break
                except (ValueError, TypeError):
                    continue
            if ts is None:
                ts = pd.to_datetime(str(v), errors="coerce")
                ts = None if pd.isna(ts) else ts
            if ts is not None and ts.tzinfo is not None:
                ts = ts.tz_convert("UTC").tz_localize(None)
            parsed.append(ts)
        return pa.Array.from_pandas(pd.Series(parsed), type=pa.timestamp("us"))
    # string: nested values re-serialised (reference behaviour)
    return pa.array(
        [None if v is None else (v if isinstance(v, str) else json.dumps(v)) for v in values],
        pa.string(),
    )


def parse_json_file(fpath: str, columns: list[dict[str, Any]], *, compress: str | None = None) -> pa.Table:
    rows = load_json_rows(fpath, compress)
    cols = {}
    for cfg in columns:
        name = cfg["name"]
        ctype = cfg.get("type", "string")
        if "value" in cfg:
            vals = [cfg["value"]] * len(rows)
        else:
            vals = [get_dotted(r, name) for r in rows]
        cols[name.replace(".", "_")] = _convert(vals, ctype)
    return pa.table(cols)


def read(param: dict[str, Any], *, channel: int = 1):
    """Build the Dataset for a jsonfilereader job parameter block."""
    import ray.data as rd

    files = resolve_paths(param["path"])
    columns = param.get("column")
    if not columns:  # no config -> sampled inference
        columns = infer_schema(files)
    compress = param.get("compress")

    def parse_batch(batch: dict) -> pa.Table:
        return pa.concat_tables(
            [parse_json_file(p, columns, compress=compress) for p in batch["path"]]
        )

    return rd.from_items(
        [{"path": p} for p in files], override_num_blocks=min(len(files), max(channel, 1))
    ).map_batches(parse_batch, batch_format="numpy", batch_size=1)
