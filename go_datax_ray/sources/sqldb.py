"""sqlreader: a REAL generic SQL database source (sqlite-backed here).

Mirrors the reference RDBMS reader semantics — column list, WHERE
clause, querySql override, splitPk range splitting
(/root/reference/plugins/reader/mysqlreader/mysql_reader.go:214-444,
:550-616 fetch loop) — against an actual database file instead of the
parquet collapse. sqlite is the only DB engine in this container; the
split/query machinery is engine-agnostic (swap the connection factory
for any DB-API driver).

Ray-Data shape: each split becomes its own ``ray.data.read_sql``
dataset (one read task touching only its key range), and the splits
union into a single streaming Dataset — the reference's
one-task-per-range channel model (mysql_reader.go:214-268) expressed
as Ray read tasks.
"""

from __future__ import annotations

import math
import sqlite3
from typing import Any


def _db_path(param: dict[str, Any]) -> str:
    """Accept DataX-style jdbcUrl ('jdbc:sqlite:/path/db') or plain path."""
    conn = param.get("connection")
    if conn:
        ent = conn[0] if isinstance(conn, list) else conn
        url = ent.get("jdbcUrl")
        if isinstance(url, list):
            url = url[0]
        if url:
            return url.split("jdbc:sqlite:", 1)[-1]
        if ent.get("path"):
            return ent["path"]
    if param.get("jdbcUrl"):
        return str(param["jdbcUrl"]).split("jdbc:sqlite:", 1)[-1]
    return param["path"]


def _table(param: dict[str, Any]) -> str | None:
    conn = param.get("connection")
    if conn:
        ent = conn[0] if isinstance(conn, list) else conn
        t = ent.get("table")
        if t:
            return t[0] if isinstance(t, list) else t
    return param.get("table")


def build_queries(param: dict[str, Any], *, channel: int = 1,
                  min_max: tuple[int, int] | None = None) -> list[str]:
    """The reference's query builder: querySql wins verbatim; otherwise
    SELECT <columns> FROM <table> [WHERE ...], split into ``channel``
    half-open splitPk ranges when a split key and bounds are given
    (mysql_reader.go:214-268 buildRangeSQLs)."""
    qsql = param.get("querySql")
    if qsql:
        return [qsql[0] if isinstance(qsql, list) else qsql]
    cols = param.get("column") or ["*"]
    collist = ", ".join(cols)
    table = _table(param)
    if not table:
        raise ValueError("sqlreader needs 'table' (or querySql)")
    where = param.get("where")
    base = f"SELECT {collist} FROM {table}"
    pk = param.get("splitPk")
    if not pk or channel <= 1 or min_max is None:
        return [base + (f" WHERE {where}" if where else "")]
    lo, hi = min_max
    n = min(channel, max(hi - lo + 1, 1))
    step = math.ceil((hi - lo + 1) / n)
    out = []
    for i in range(n):
        a = lo + i * step
        b = lo + (i + 1) * step
        rng = f"{pk} >= {a} AND {pk} < {b}" if i < n - 1 else f"{pk} >= {a} AND {pk} <= {hi}"
        out.append(base + " WHERE " + (f"({where}) AND " if where else "") + rng)
    return out


def read(param: dict[str, Any], *, channel: int = 1):
    import ray.data as rd

    path = _db_path(param)
    pk = param.get("splitPk")
    min_max = None
    if pk and channel > 1 and not param.get("querySql"):
        with sqlite3.connect(path) as con:
            table = _table(param)
            where = param.get("where")
            q = f"SELECT MIN({pk}), MAX({pk}) FROM {table}"
            if where:
                q += f" WHERE {where}"
            lo, hi = con.execute(q).fetchone()
        if lo is not None:
            min_max = (int(lo), int(hi))
    queries = build_queries(param, channel=channel, min_max=min_max)

    def factory(path=path):
        return sqlite3.connect(path)

    parts = [rd.read_sql(q, factory) for q in queries]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """sqlwriter: single-writer DB sink (sqlite serialises writers by
    design, so the stream funnels through one connection — the analogue
    of the common RDBMS writer's session, with writeMode insert /
    replace mapping to INSERT [OR REPLACE]
    (/root/reference/common/database/rdbms/writer/common.go:557-607)."""
    path = _db_path(param)
    table = _table(param)
    if not table:
        raise ValueError("sqlwriter needs 'table'")
    mode = param.get("writeMode", "insert")
    verb = {"insert": "INSERT", "replace": "INSERT OR REPLACE",
            "update": "INSERT OR REPLACE"}[mode]
    records = 0
    with sqlite3.connect(path) as con:
        pre = param.get("preSql")
        for stmt in (pre if isinstance(pre, list) else [pre]) if pre else []:
            con.execute(stmt)
        first = True
        for batch in ds.iter_batches(batch_format="pyarrow"):
            cols = batch.column_names
            if first:
                coldefs = ", ".join(cols)
                con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({coldefs})")
                first = False
            ph = ", ".join("?" for _ in cols)
            rows = zip(*(batch.column(c).to_pylist() for c in cols))
            con.executemany(
                f"{verb} INTO {table} ({', '.join(cols)}) VALUES ({ph})", rows
            )
            records += batch.num_rows
        post = param.get("postSql")
        for stmt in (post if isinstance(post, list) else [post]) if post else []:
            con.execute(stmt)
        con.commit()
    return {"records": records, "bytes": 0, "path": path, "table": table}
