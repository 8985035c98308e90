"""clickhousereader: real reads over ClickHouse's public HTTP interface.

The reference's clickhousereader drives the native TCP protocol via
clickhouse-go (clickhouse_reader.go:113-160 parses
``clickhouse://host:port/database``); no native Python driver ships in
this sandbox, so this reader speaks the SAME server's public HTTP
interface — the one ``sinks.wire.write_clickhouse`` renders INSERTs for.
Each split query POSTs ``SELECT ... FORMAT
TabSeparatedWithNamesAndTypes`` from its own Ray read task and parses
the response into a typed Arrow table; the split machinery
(column/where/querySql/splitPk range + text-dictionary split) is shared
with ``sources.sqldb.build_queries`` (mysql_reader.go:214-268 parity).

An unreachable server fails LOUDLY inside the task (urllib error with
the endpoint in the message) — never a silent fallback.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from typing import Any
from urllib.parse import quote, urlsplit

import pyarrow as pa

from . import sqldb

# TabSeparated decode: the inverse of sinks.wire._CH_ESCAPES
_UNESCAPES = {"\\\\": "\\", "\\t": "\t", "\\n": "\n", "\\r": "\r",
              "\\b": "\b", "\\f": "\f", "\\0": "\0", "\\'": "'"}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        two = s[i:i + 2]
        if two in _UNESCAPES:
            out.append(_UNESCAPES[two])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _arrow_type(ch_type: str) -> pa.DataType:
    """ClickHouse type name -> Arrow type (Nullable/LowCardinality
    unwrap; unknown types fall back to string)."""
    t = ch_type.strip()
    # wrappers nest in either order (LowCardinality(Nullable(T)) is the
    # common idiom); strip until a full pass removes nothing
    stripped = True
    while stripped:
        stripped = False
        for wrap in ("Nullable(", "LowCardinality("):
            if t.startswith(wrap) and t.endswith(")"):
                t = t[len(wrap):-1].strip()
                stripped = True
    if t == "Bool":
        return pa.bool_()
    if t in ("Int8", "Int16", "Int32", "Int64"):
        return pa.int64()
    if t in ("UInt8", "UInt16", "UInt32"):
        return pa.int64()
    if t == "UInt64":
        return pa.uint64()
    if t in ("Float32", "Float64"):
        return pa.float64()
    if t == "Date":
        return pa.date32()
    if t.startswith("DateTime64"):
        return pa.timestamp("us")
    if t.startswith("DateTime"):
        return pa.timestamp("s")
    return pa.string()


def _cast_column(vals: list[str | None], typ: pa.DataType) -> pa.Array:
    if pa.types.is_boolean(typ):
        # TSV renders Bool as true/false (or 1/0 under custom
        # bool_*_representation settings)
        return pa.array(
            [None if v is None else v in ("true", "1") for v in vals], typ)
    if pa.types.is_integer(typ):
        return pa.array(
            [int(v) if v is not None else None for v in vals], typ)
    if pa.types.is_floating(typ):
        return pa.array(
            [float(v) if v is not None else None for v in vals], typ)
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ):
        return pa.compute.cast(
            pa.array(vals, pa.string()), typ, safe=False)
    return pa.array(vals, pa.string())


def parse_tsv_with_names_and_types(data: bytes) -> pa.Table:
    """Decode a ``TabSeparatedWithNamesAndTypes`` response body: line 1
    column names, line 2 ClickHouse types, then escaped rows with
    ``\\N`` nulls."""
    text = data.decode("utf-8")
    if text.endswith("\n"):
        text = text[:-1]
    lines = text.split("\n") if text else []
    if len(lines) < 2:
        raise ValueError(
            "TabSeparatedWithNamesAndTypes response needs a names line and "
            f"a types line; got {len(lines)} lines")
    names = [_unescape(c) for c in lines[0].split("\t")]
    types = [_arrow_type(_unescape(c)) for c in lines[1].split("\t")]
    cols: list[list[str | None]] = [[] for _ in names]
    for ln in lines[2:]:
        for i, cell in enumerate(ln.split("\t")):
            cols[i].append(None if cell == "\\N" else _unescape(cell))
    return pa.table(
        {n: _cast_column(c, t) for n, c, t in zip(names, cols, types)})


def _endpoint(param: dict[str, Any]) -> tuple[str, str]:
    """(http endpoint, database) from the job param. The reference URL
    shape is ``clickhouse://host:port/database`` where port is the
    NATIVE protocol's (9000, clickhouse_reader.go:130); the HTTP
    interface listens on 8123, so the native port maps there unless the
    job sets an explicit ``endpoint``."""
    if param.get("endpoint"):
        return str(param["endpoint"]).rstrip("/"), str(
            param.get("database", "default"))
    urls = sqldb._db_urls(param)
    url = urls[0] if urls else param.get("jdbcUrl")
    if not url:
        raise ValueError("clickhousereader needs a clickhouse:// jdbcUrl "
                         "or an explicit 'endpoint'")
    u = urlsplit(sqldb._strip_jdbc(str(url)))
    if u.scheme != "clickhouse":
        raise ValueError(f"not a clickhouse:// URL: {url}")
    port = u.port if u.port and u.port != 9000 else 8123
    db = (u.path or "").lstrip("/") or param.get("database", "default")
    return f"http://{u.hostname or 'localhost'}:{port}", str(db)


def http_select(endpoint: str, database: str, sql: str, *,
                username: str | None = None, password: str | None = None,
                timeout: float = 60.0) -> pa.Table:
    """POST one SELECT with FORMAT TabSeparatedWithNamesAndTypes."""
    body = (sql.rstrip().rstrip(";")
            + " FORMAT TabSeparatedWithNamesAndTypes").encode("utf-8")
    headers = {"Content-Type": "text/plain"}
    if username:
        headers["X-ClickHouse-User"] = str(username)
    if password:
        # a password without a username targets ClickHouse's implicit
        # 'default' user — still must be sent
        headers.setdefault("X-ClickHouse-User", "default")
        headers["X-ClickHouse-Key"] = str(password)
    url = f"{endpoint}/?database={quote(database)}"
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = resp.read()
    except urllib.error.HTTPError as e:
        raise RuntimeError(
            f"clickhousereader: HTTP {e.code} from {endpoint}: "
            f"{e.read()[:500]!r}") from e
    except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
        raise RuntimeError(
            f"clickhousereader: cannot reach ClickHouse HTTP interface at "
            f"{endpoint} ({e}); check the endpoint / jdbcUrl, or set "
            "reader.parameter.allowCollapse = true to read a parquet dump."
        ) from e
    return parse_tsv_with_names_and_types(payload)


def read(param: dict[str, Any], *, channel: int = 1):
    """The clickhousereader entry: split queries fetched one per Ray
    read task over the HTTP interface."""
    import ray.data as rd

    endpoint, database = _endpoint(param)
    user = param.get("username")
    pwd = param.get("password")

    if str(param.get("splitMode") or "").lower() == "token":
        raise ValueError(
            "splitMode=token needs the gdr_token UDF, which cannot be "
            "registered on a ClickHouse server — use splitPk range split")

    pk = param.get("splitPk")
    min_max = None
    boundaries = None
    if pk and channel > 1 and not param.get("querySql"):
        table = sqldb._table(param)
        where = param.get("where")
        wc = f" WHERE {where}" if where else ""
        probe = http_select(
            endpoint, database,
            f"SELECT MIN({pk}), MAX({pk}) FROM {table}{wc}",
            username=user, password=pwd)
        lo, hi = (probe.column(0)[0].as_py(), probe.column(1)[0].as_py())
        if lo is not None and isinstance(lo, (int, float)):
            min_max = (int(lo), int(hi))
        elif lo is not None:
            # TEXT splitPk: NTILE dictionary boundaries, same strategy
            # as the DB-API source (SURVEY §2.2)
            b = http_select(
                endpoint, database,
                f"SELECT MIN({pk}) FROM (SELECT {pk}, NTILE({channel}) "
                f"OVER (ORDER BY {pk}) AS _b FROM {table}{wc}) AS _t "
                "GROUP BY _b ORDER BY 1",
                username=user, password=pwd)
            boundaries = b.column(0).to_pylist()
    queries = sqldb.build_queries(param, channel=channel, min_max=min_max,
                                  boundaries=boundaries)

    def fetch(batch: dict):
        for q in batch["q"]:
            t = http_select(endpoint, database, str(q),
                            username=user, password=pwd)
            if t.num_rows:
                yield t

    return rd.from_items(
        [{"q": q} for q in queries], override_num_blocks=len(queries)
    ).map_batches(fetch, batch_format="numpy", batch_size=1)
