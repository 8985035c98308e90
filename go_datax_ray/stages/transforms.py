"""The dx_* per-record transformer chain, as vectorised Arrow kernels.

The reference documents five transformers (dx_filter, dx_substr,
dx_replace, dx_pad, dx_digest) chained in config order
(/root/reference/docs/TRANSFORMER.md:18-183) but its execution hook is
commented out ("awaiting future reimplementation",
/root/reference/core/task/taskgroupcontainer.go:56-69). We implement
them for real:

* dx_filter — DROP a record when ``col <op> value`` holds (classic
  DataX filter semantics: a match removes the record; the doc's use
  cases are all exclusion). Ops: > < = != >= <= like, not like.
  Values are strings in config; comparison is numeric when both sides
  parse as doubles, else lexicographic — mirroring the reference's
  string-typed paras.
* dx_substr — col = col[start : start+length].
* dx_replace — regex replace (docs: "supports regular expressions").
* dx_pad — left/right pad to length with a pad string.
* dx_digest — md5/sha1/sha256 hex digest of the column.

Each has (a) a named-column functional form over ``pa.Table`` and (b) a
config-driven chain builder accepting the reference's JSON shape
({"name": "dx_substr", "parameter": {"columnIndex": 1, "paras": [...]}}),
with columnIndex resolved positionally against the schema — the
reference's positional Record model (common/element/record.go:36-80).
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CMP = {
    ">": pc.greater,
    "<": pc.less,
    "=": pc.equal,
    "!=": pc.not_equal,
    ">=": pc.greater_equal,
    "<=": pc.less_equal,
}


def _filter_mask(col: pa.ChunkedArray | pa.Array, op: str, value: str) -> pa.Array:
    """Boolean mask: True where the condition HOLDS (record to drop)."""
    op = op.strip().lower()
    if op in ("like", "not like"):
        m = pc.match_like(col.cast(pa.string()), value)
        return pc.invert(m) if op == "not like" else m
    fn = _CMP[op]
    # numeric compare when both sides are numeric, else string compare
    try:
        fval = float(value)
        num = col if pa.types.is_floating(col.type) or pa.types.is_integer(col.type) else col.cast(
            pa.float64()
        )
        return fn(num.cast(pa.float64()), pa.scalar(fval, pa.float64()))
    except (ValueError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return fn(col.cast(pa.string()), pa.scalar(value))


def dx_filter(t: pa.Table, column: str, op: str, value: str) -> pa.Table:
    """Drop rows where ``column <op> value`` holds (nulls are kept —
    null comparisons are null -> not dropped)."""
    mask = _filter_mask(t.column(column), op, value)
    keep = pc.fill_null(pc.invert(mask), True)
    return t.filter(keep)


def dx_filter_keep(t: pa.Table, column: str, op: str, value: str) -> pa.Table:
    """SQL-style variant: KEEP rows where the condition holds."""
    mask = pc.fill_null(_filter_mask(t.column(column), op, value), False)
    return t.filter(mask)


def dx_substr(t: pa.Table, column: str, start: int, length: int) -> pa.Table:
    out = pc.utf8_slice_codeunits(t.column(column), start, start + length)
    return t.set_column(t.column_names.index(column), column, out)


def dx_replace(t: pa.Table, column: str, pattern: str, replacement: str) -> pa.Table:
    out = pc.replace_substring_regex(t.column(column), pattern, replacement)
    return t.set_column(t.column_names.index(column), column, out)


def dx_pad(t: pa.Table, column: str, direction: str, length: int, pad: str) -> pa.Table:
    fn = pc.utf8_lpad if direction.lower() == "left" else pc.utf8_rpad
    out = fn(t.column(column), length, pad)
    return t.set_column(t.column_names.index(column), column, out)


_DIGESTS = {"md5": hashlib.md5, "sha1": hashlib.sha1, "sha256": hashlib.sha256}


# PII masking patterns. Both pyarrow and DuckDB run RE2, so the same
# pattern string is oracle-checkable with regexp_replace(..., 'g').
# Order matters: emails first (their local part can look phone-ish).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
    "ip": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
}


def dx_mask(t: pa.Table, column: str, kinds: str = "email,phone,ip") -> pa.Table:
    """Redact PII-shaped substrings with fixed tokens (engine extension:
    the curation-side sibling of dx_replace — a training-data pipeline
    masks emails/phones/IPs before the corpus leaves the ingest tier).
    ``kinds`` is a comma list selecting patterns from PII_PATTERNS,
    applied in the listed order."""
    out = t.column(column)
    for kind in (s.strip() for s in kinds.split(",")):
        if kind not in PII_PATTERNS:
            raise ValueError(f"unknown PII kind {kind!r}; have {sorted(PII_PATTERNS)}")
        pat, token = PII_PATTERNS[kind]
        out = pc.replace_substring_regex(out, pat, token)
    return t.set_column(t.column_names.index(column), column, out)


import json as _json
import re as _re

# Fast path applies only to FLAT objects with no nesting/arrays/escapes;
# anything else (nested paths, escaped strings) takes the exact json.loads
# fallback — same guarded-vectorisation pattern as the html extractor.
_JSON_FLAT_RE = r"^\{[^{}\[\]\\]*\}$"


def _json_fallback(vals: list, segs: list[str]) -> list:
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        try:
            cur = _json.loads(v)
            for s in segs:
                cur = cur[s] if isinstance(cur, dict) else None
                if cur is None:
                    break
        except (ValueError, KeyError, TypeError):
            cur = None
        if cur is None:
            out.append(None)
        elif isinstance(cur, bool):
            out.append("true" if cur else "false")
        elif isinstance(cur, (dict, list)):
            out.append(_json.dumps(cur, separators=(",", ":")))
        else:
            out.append(str(cur))
    return out


def dx_json(t: pa.Table, column: str, path: str, out_col: str | None = None) -> pa.Table:
    """Extract a JSON value at a dotted path from a JSON-string column
    into a new STRING column (engine extension: the column-level sibling
    of the jsonfilereader's dotted-path record model — the reference
    reads dotted paths from json FILES but has no per-column JSON
    transformer). Semantics match DuckDB ``json_extract_string``:
    missing key / JSON null / unparsable document -> SQL NULL; booleans
    render as true/false. Chain ``dx_cast`` to type the result.

    Vectorised: flat single-key documents (the overwhelming web-log
    case) are matched with TWO Arrow RE2 kernels (quoted / unquoted
    value); only non-flat or escaped documents fall back to per-row
    ``json.loads``."""
    segs = [s for s in path.lstrip("$").lstrip(".").split(".") if s]
    if not segs:
        raise ValueError(f"empty json path {path!r}")
    out_col = out_col or segs[-1]
    col = t.column(column)
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    flat = pc.fill_null(pc.match_substring_regex(col, _JSON_FLAT_RE), False)
    result = pa.nulls(len(col), pa.string())
    if len(segs) == 1 and pc.any(flat).as_py():
        key = _re.escape(segs[0])
        nulls = pa.nulls(len(col), pa.string())

        def _field(struct_arr):
            # extract_regex non-matches are STRUCT-level nulls; the child
            # holds "" there — mask them back to null before coalescing
            if isinstance(struct_arr, pa.ChunkedArray):
                struct_arr = struct_arr.combine_chunks()
            return pc.if_else(pc.is_valid(struct_arr), struct_arr.field(0), nulls)

        qv = _field(pc.extract_regex(col, f'"{key}"\\s*:\\s*"(?P<v>[^"]*)"'))
        uv = _field(pc.extract_regex(col, f'"{key}"\\s*:\\s*(?P<v>[^",}}\\s][^,}}]*)'))
        uv = pc.utf8_rtrim_whitespace(uv)
        # JSON literal null -> SQL NULL (json_extract_string parity)
        uv = pc.if_else(
            pc.fill_null(pc.equal(uv, pa.scalar("null")), False), nulls, uv
        )
        fastv = pc.coalesce(qv, uv)
        result = pc.if_else(flat, fastv, result)
    need_slow = pc.and_(pc.invert(flat), pc.is_valid(col))
    if pc.any(need_slow).as_py():
        idx = np.flatnonzero(need_slow.to_numpy(zero_copy_only=False))
        slow = _json_fallback(col.take(pa.array(idx)).to_pylist(), segs)
        res_np = result.to_pylist()
        for i, v in zip(idx, slow):
            res_np[i] = v
        result = pa.array(res_np, pa.string())
    return t.append_column(out_col, result)


def dx_extract(t: pa.Table, column: str, pattern: str, group: int = 1,
               out_col: str | None = None) -> pa.Table:
    """Regex capture-group extraction into a new string column — the
    structured-field sibling of dx_replace. Both Arrow and DuckDB run
    RE2, so the same pattern string is oracle-checkable via
    ``regexp_extract(col, pattern, group)``; like DuckDB, a non-match
    yields '' (empty string), null input stays null."""
    named = _re.sub(r"(?<!\\)\((?!\?)", lambda m, c=iter(range(99)): f"(?P<g{next(c)}>",
                    pattern)
    col = t.column(column)
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ext = pc.extract_regex(col, named)
    field_names = [f.name for f in ext.type]
    want = f"g{group - 1}" if group >= 1 else None
    if want is None or want not in field_names:
        raise ValueError(
            f"pattern {pattern!r} has no capture group {group}"
        )
    # extract_regex: non-match -> struct-level null; DuckDB regexp_extract
    # returns '' there — match that, but keep null inputs null
    vals = pc.if_else(pc.is_valid(ext), ext.field(want),
                      pa.scalar("", pa.string()))
    vals = pc.if_else(pc.is_valid(col), vals, pa.nulls(len(col), pa.string()))
    return t.append_column(out_col or f"{column}_extract", vals)


#: RE2 patterns for URL-part extraction. Exported so the DuckDB oracle
#: runs the IDENTICAL pattern through regexp_extract — both engines are
#: RE2, so byte parity is structural (the dx_extract contract).
_URL_PARTS = {
    "scheme": r"^([a-zA-Z][a-zA-Z0-9+.-]*)://",
    "host": r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)",
    "port": r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)",
    "path": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)",
    "query": r"\?([^#]*)",
    "fragment": r"#(.*)$",
}


def url_pattern(part: str) -> str:
    """The RE2 pattern dx_url uses for ``part`` (``param:<name>`` builds
    a per-parameter pattern) — share it with the SQL oracle verbatim."""
    if part.startswith("param:"):
        name = _re.escape(part.split(":", 1)[1])
        return rf"[?&]{name}=([^&#]*)"
    try:
        return _URL_PARTS[part]
    except KeyError:
        raise ValueError(
            f"dx_url: unknown part {part!r} (one of {sorted(_URL_PARTS)} or param:<name>)"
        ) from None


def dx_url(t: pa.Table, column: str, part: str, out_col: str | None = None) -> pa.Table:
    """URL-part extraction for webtext curation: scheme/host/port/path/
    query/fragment/param:<name> as a new string column. Pure RE2 over
    dx_extract's kernels (no per-row urllib); non-match -> '' and null
    stays null, exactly like DuckDB's regexp_extract on the same
    pattern. The reference has no URL functions at all — its webtext
    jobs carry urls as opaque strings (SURVEY.md §1.4 input_hint)."""
    return dx_extract(t, column, url_pattern(part), 1,
                      out_col or f"{column}_{part.replace(':', '_')}")


def dx_digest(t: pa.Table, column: str, algo: str = "md5") -> pa.Table:
    """Hex digest of the column's utf-8 text (null stays null)."""
    h = _DIGESTS[algo.lower()]
    vals = t.column(column).cast(pa.string()).to_pylist()
    out = pa.array(
        [None if v is None else h(v.encode("utf-8")).hexdigest() for v in vals],
        pa.string(),
    )
    return t.set_column(t.column_names.index(column), column, out)


# ---------------------------------------------------------------------------
# Config-driven chain (reference JSON job format)

def _resolve_col(t_schema: pa.Schema, parameter: dict[str, Any]) -> str:
    if "column" in parameter:
        return parameter["column"]
    return t_schema.names[int(parameter["columnIndex"])]


def build_transformer_chain(
    configs: list[dict[str, Any]], schema: pa.Schema
) -> Callable[[pa.Table], pa.Table]:
    """Compile a transformer config list into one batch function, applied
    in config order (docs/TRANSFORMER.md:135-183 chaining)."""
    steps: list[Callable[[pa.Table], pa.Table]] = []
    for cfg in configs:
        name = cfg["name"]
        par = cfg.get("parameter", {})
        col = _resolve_col(schema, par)
        paras = [str(p) for p in par.get("paras", [])]
        if name == "dx_filter":
            op, value = paras[0], paras[1]
            steps.append(lambda t, c=col, o=op, v=value: dx_filter(t, c, o, v))
        elif name == "dx_substr":
            start, length = int(paras[0]), int(paras[1])
            steps.append(lambda t, c=col, s=start, l=length: dx_substr(t, c, s, l))
        elif name == "dx_replace":
            pat, rep = paras[0], paras[1]
            steps.append(lambda t, c=col, p=pat, r=rep: dx_replace(t, c, p, r))
        elif name == "dx_pad":
            d, length, padstr = paras[0], int(paras[1]), paras[2]
            steps.append(lambda t, c=col, dd=d, L=length, p=padstr: dx_pad(t, c, dd, L, p))
        elif name == "dx_mask":
            kinds = paras[0] if paras else "email,phone,ip"
            steps.append(lambda t, c=col, kk=kinds: dx_mask(t, c, kk))
        elif name == "dx_digest":
            algo = paras[0] if paras else "md5"
            steps.append(lambda t, c=col, a=algo: dx_digest(t, c, a))
        elif name == "dx_json":  # engine extension: column-level JSON path
            path = paras[0]
            out = paras[1] if len(paras) > 1 else None
            steps.append(lambda t, c=col, p=path, o=out: dx_json(t, c, p, o))
        elif name == "dx_extract":  # engine extension: regex capture group
            pat = paras[0]
            grp = int(paras[1]) if len(paras) > 1 else 1
            out = paras[2] if len(paras) > 2 else None
            steps.append(
                lambda t, c=col, p=pat, g=grp, o=out: dx_extract(t, c, p, g, o)
            )
        elif name == "dx_url":  # engine extension: URL-part extraction
            part = paras[0]
            out = paras[1] if len(paras) > 1 else None
            steps.append(lambda t, c=col, p=part, o=out: dx_url(t, c, p, o))
        elif name == "dx_cast":  # engine extension: the §1.1 casting matrix
            from .cast import dx_cast

            to = paras[0]
            lenient = len(paras) > 1 and paras[1].lower() in ("1", "true", "lenient")
            steps.append(lambda t, c=col, to_=to, ln=lenient: dx_cast(t, c, to_, lenient=ln))
        else:
            raise ValueError(f"unknown transformer {name!r}")

    def chain(t: pa.Table) -> pa.Table:
        for step in steps:
            t = step(t)
        return t

    return chain


def apply_transformers(ds, configs: list[dict[str, Any]]):
    """Dataset stage: apply a config chain via one fused map_batches."""
    schema = ds.schema().base_schema
    fn = build_transformer_chain(configs, schema)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
