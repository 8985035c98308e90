"""Actor-pool DB-API writer: the server-database counterpart of the
single-connection file sink in ``sources/sqldb.py``.

The reference's mysqlwriter/postgresqlwriter run N parallel writer
tasks, each holding its own connection and flushing batched
INSERT/REPLACE/upsert statements with per-batch transactions
(/root/reference/plugins/writer/mysqlwriter/mysql_writer.go:377-530,
/root/reference/common/database/rdbms/writer/common.go:520-616). The
Ray-native shape is a ``map_batches`` ACTOR pool: the connection is
opened once per actor in ``__init__``, each ``__call__`` writes one
Arrow batch inside one transaction (executemany), and a failed batch
degrades to per-row retry so a poison row costs one row, not a batch
(tdengine_writer.go:304-355). ``concurrency`` = the job's channel
count, so N writers stream concurrently against the server — the exact
scale-out the single-writer file sink's SCALE NOTE prescribes.

No network driver ships in this sandbox: pymysql/psycopg absence fails
loudly inside the actor (sources/sqldb.py:_net_connect), and tests
exercise the mysql/postgres rendering through an injected DB-API fake
plus the full distributed path through sqlite.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..sources import sqldb

# dialect -> DB-API paramstyle of the modules we bind: pymysql/MySQLdb,
# psycopg/psycopg2, pytds/pymssql are 'format' (%s); sqlite3 is
# 'qmark' (?). oracle/sqlserver render through _merge_dialect_sql
# (oracledb binds the reference's :colN named placeholders, pyodbc
# qmark).
_PARAMSTYLE = {"mysql": "%s", "postgres": "%s", "sqlite": "?"}


def _oracle_ph(i: int) -> str:
    return f":col{i + 1}"


def _merge_dialect_sql(table: str, columns: list[str], pks: list[str],
                       non_pk: list[str], mode: str, ph, *,
                       quote=lambda c: c, source: str = "",
                       terminator: str = "") -> str:
    """Dialects whose public upsert idiom is ANSI MERGE (Oracle, SQL
    Server): insert renders a bare INSERT; skip (and the all-PK
    degrade) a WHEN-NOT-MATCHED-only MERGE; update/replace the full
    matched-update + not-matched-insert MERGE."""
    collist = ", ".join(quote(c) for c in columns)
    binds = ", ".join(ph(i) for i in range(len(columns)))
    if mode == "insert":
        return (f"INSERT INTO {quote(table)} ({collist}) "
                f"VALUES ({binds}){terminator}")
    if mode not in ("skip", "update", "replace"):
        raise ValueError(
            f"unsupported writeMode {mode!r}: insert, replace, update, skip"
        )
    src_cols = ", ".join(f"{ph(i)} AS {quote(c)}"
                         for i, c in enumerate(columns))
    on = " AND ".join(f"t.{quote(c)} = s.{quote(c)}" for c in pks)
    head = (f"MERGE INTO {quote(table)} t USING "
            f"(SELECT {src_cols}{source}) s ON ({on})")
    vals = ", ".join(f"s.{quote(c)}" for c in columns)
    insert = f" WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
    if mode == "skip" or not non_pk:  # all-PK degrades to skip
        return head + insert + terminator
    pairs = ", ".join(f"t.{quote(c)} = s.{quote(c)}" for c in non_pk)
    return head + f" WHEN MATCHED THEN UPDATE SET {pairs}" + insert \
        + terminator


def _pk_list(param: dict[str, Any], columns: list[str]) -> list[str]:
    pks = param.get("primaryKeys") or param.get("primaryKey")
    if pks:
        return list(pks) if isinstance(pks, (list, tuple)) else [pks]
    # the reference's update mode treats the FIRST configured column as
    # the key when none is declared (mysql_writer.go:500-505 builds the
    # update clause over columns[1:])
    return columns[:1]


def build_row_sql(
    dialect: str,
    table: str,
    columns: list[str],
    *,
    mode: str = "insert",
    primary_keys: list[str] | None = None,
) -> str:
    """Single-row statement for ``executemany`` carrying the reference's
    per-dialect conflict strategy (common.go:557-616's four scenarios,
    mysql_writer.go:383-530's writeMode switch):

    - insert  -> plain INSERT (duplicates possible, scenario 1)
    - skip    -> INSERT IGNORE / ON CONFLICT DO NOTHING (scenario 2)
    - update  -> ON DUPLICATE KEY UPDATE col=VALUES(col) /
                 ON CONFLICT (pk) DO UPDATE SET col=EXCLUDED.col
                 over non-PK columns (scenario 3); degrades to skip
                 when every column is a key (all-PK scenario)
    - replace -> REPLACE INTO on mysql (mysql_writer.go:470); the
                 postgres dialect has no REPLACE so it renders the
                 same upsert as update; sqlite INSERT OR REPLACE

    Oracle renders the reference's :colN binds and bare INSERT
    (oracle_writer.go:295-304 prepares INSERT only, whatever writeMode
    says); its skip/update/replace render the dialect's public MERGE
    idiom so the common writer's scenario table still holds. SQL Server
    keeps the reference's [bracket] quoting and ? binds
    (sqlserver_writer.go:414-446) with the same MERGE mapping.
    """
    pks = primary_keys or columns[:1]
    non_pk = [c for c in columns if c not in set(pks)]
    if dialect == "oracle":
        return _merge_dialect_sql(table, columns, pks, non_pk, mode,
                                  _oracle_ph, source=" FROM dual")
    if dialect == "sqlserver":
        return _merge_dialect_sql(
            table, columns, pks, non_pk, mode, lambda i: "?",
            quote=lambda c: f"[{c}]", terminator=";")
    if dialect == "sybase":
        # the reference's sybasewriter prepares INSERT only and degrades
        # replace -> insert with a warning ("Sybase ASE不直接支持REPLACE
        # 模式", sybase_writer.go:296-311); skip/update render ASE
        # 15.7+'s public MERGE (T-SQL [bracket] quoting, %s binds for
        # pytds/pymssql) so the common writer's scenario table holds
        eff = "insert" if mode == "replace" else mode
        return _merge_dialect_sql(
            table, columns, pks, non_pk, eff, lambda i: "%s",
            quote=lambda c: f"[{c}]")
    ph = _PARAMSTYLE[dialect]
    collist = ", ".join(columns)
    values = f"({', '.join(ph for _ in columns)})"
    base = f"INSERT INTO {table} ({collist}) VALUES {values}"

    if mode == "insert":
        return base
    if mode == "skip":
        if dialect == "mysql":
            return f"INSERT IGNORE INTO {table} ({collist}) VALUES {values}"
        if dialect == "sqlite":
            return f"INSERT OR IGNORE INTO {table} ({collist}) VALUES {values}"
        return f"{base} ON CONFLICT ({', '.join(pks)}) DO NOTHING"
    if mode == "replace" and dialect == "mysql":
        return f"REPLACE INTO {table} ({collist}) VALUES {values}"
    if mode == "replace" and dialect == "sqlite":
        return f"INSERT OR REPLACE INTO {table} ({collist}) VALUES {values}"
    if mode in ("update", "replace"):
        if not non_pk:  # all-PK table: upsert degrades to conflict-skip
            return build_row_sql(dialect, table, columns, mode="skip",
                                 primary_keys=pks)
        if dialect == "mysql":
            pairs = ", ".join(f"{c}=VALUES({c})" for c in non_pk)
            return f"{base} ON DUPLICATE KEY UPDATE {pairs}"
        kw = "EXCLUDED" if dialect == "postgres" else "excluded"
        pairs = ", ".join(f"{c}={kw}.{c}" for c in non_pk)
        return f"{base} ON CONFLICT ({', '.join(pks)}) DO UPDATE SET {pairs}"
    raise ValueError(
        f"unsupported writeMode {mode!r}: insert, replace, update, skip"
    )


def _open(dialect: str, url: str, net_factory=None):
    if dialect in sqldb.DBAPI_MODULES:
        # net_factory is the driver-side DBAPI_FACTORIES snapshot shipped
        # into the actor pool — worker processes never see driver-side
        # registrations otherwise (mirrors sqldb.read's read-task factory)
        if net_factory is not None:
            return net_factory(url)
        return sqldb._net_connect(dialect, url)
    if dialect == "sqlite":
        import sqlite3

        # Ray actor methods may run on a different thread than __init__
        con = sqlite3.connect(url, timeout=60.0, check_same_thread=False)
        return con
    raise ValueError(
        f"dbwriter drives mysql/postgres/oracle/sqlserver/sqlite "
        f"connections; for {dialect!r} use 'sqlwriter' (single-writer "
        "file sink)."
    )


class DBWriteActor:
    """One writer task: connection opened once per actor, one
    transaction per batch, per-row degraded retry on batch failure."""

    def __init__(self, *, dialect: str, url: str, table: str,
                 columns: list[str] | None, mode: str,
                 primary_keys: list[str], net_factory=None) -> None:
        self._con = _open(dialect, url, net_factory)
        self._dialect = dialect
        self._table = table
        self._columns = list(columns) if columns else None
        self._mode = mode
        self._pks = primary_keys
        self._sql: str | None = None

    def _statement(self, batch: pa.Table) -> tuple[str, list[str]]:
        cols = self._columns or batch.column_names
        if self._sql is None:
            self._sql = build_row_sql(
                self._dialect, self._table, cols,
                mode=self._mode, primary_keys=self._pks,
            )
        return self._sql, cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        sql, cols = self._statement(batch)
        rows = list(zip(*(batch.column(c).to_pylist() for c in cols)))
        if self._dialect == "oracle":  # :colN named binds -> dict rows
            rows = [{f"col{i + 1}": v for i, v in enumerate(r)}
                    for r in rows]
        con = self._con
        # executemany lives on the CURSOR in DB-API (pymysql/psycopg2
        # connections don't expose it; sqlite3's connection shorthand
        # does); injected test fakes without cursor() stay supported
        cur = con.cursor() if hasattr(con, "cursor") else con
        written = errors = 0
        try:
            cur.executemany(sql, rows)
            con.commit()
            written = len(rows)
        except Exception:  # noqa: BLE001 — degraded per-row retry
            try:
                con.rollback()
            except Exception:  # noqa: BLE001 — no open transaction
                pass
            # one transaction PER ROW: on postgres a failed statement
            # aborts the whole transaction, so without commit/rollback
            # around each row one poison row would silently discard
            # every later (and earlier uncommitted) row in the batch
            for row in rows:
                try:
                    cur.execute(sql, row)
                    con.commit()
                    written += 1
                except Exception:  # noqa: BLE001
                    errors += 1
                    try:
                        con.rollback()
                    except Exception:  # noqa: BLE001
                        pass
        return pa.table({"written": pa.array([written], pa.int64()),
                         "errors": pa.array([errors], pa.int64())})

    def __del__(self):  # best-effort: actors die with the pool
        try:
            self._con.close()
        except Exception:  # noqa: BLE001
            pass


def _run_sqls(dialect: str, url: str, stmts, table: str) -> None:
    if not stmts:
        return
    stmts = stmts if isinstance(stmts, list) else [stmts]
    con = _open(dialect, url)
    cur = con.cursor() if hasattr(con, "cursor") else con
    try:
        for stmt in stmts:
            cur.execute(stmt.replace("@table", table))
        try:
            con.commit()
        except Exception:  # noqa: BLE001
            pass
    finally:
        con.close()


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """mysqlwriter/postgresqlwriter over a live DB-API connection pool.

    Job-level preSql runs ONCE on the driver before the pool starts and
    postSql once after it drains (common.go:369-443 Prepare/Post with
    @table rendering); the N-actor pool between them IS the reference's
    channel-parallel writer-task group.
    """
    dialect = sqldb._driver(param)
    urls = sqldb._db_urls(param) or [sqldb._db_path(param)]
    if len(urls) != 1:
        raise ValueError("dbwriter writes one endpoint per job; got "
                         f"{len(urls)} jdbcUrls")
    url = sqldb._strip_jdbc(str(urls[0]))
    # Only network dialects carry URL credentials; a sqlite/duckdb path
    # must never be rewritten into '//user:pass@/tmp/x.db' (matches
    # sqldb.read's gate).
    if dialect in sqldb.DBAPI_MODULES:
        url = sqldb._with_auth(url, param)
    table = sqldb._table(param)
    if not table:
        raise ValueError("dbwriter needs 'table'")
    cols = param.get("column")
    if cols == ["*"]:
        cols = None
    mode = param.get("writeMode", "insert")
    pks = _pk_list(param, list(cols) if cols else [])
    channel = int(param.get("channel") or 1)
    batch_size = int(param.get("batchSize") or 2048)

    # Validate the connection ON THE DRIVER before spawning the pool: a
    # constructor that raises persistently inside a Ray actor pool spins
    # in restart loops instead of failing the job (observed with a
    # missing DB-API module), so the missing-driver / unreachable-host
    # error must surface here, loudly, first.
    net_factory = sqldb.DBAPI_FACTORIES.get(dialect)
    _open(dialect, url, net_factory).close()
    _run_sqls(dialect, url, param.get("preSql"), table)
    stats = ds.map_batches(
        DBWriteActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=channel,
        num_cpus=0.5,  # connection-bound, not CPU-bound
        fn_constructor_kwargs=dict(
            dialect=dialect, url=url, table=table, columns=cols,
            mode=mode, primary_keys=pks, net_factory=net_factory,
        ),
    ).take_all()  # tiny per-batch stat rows, never data
    _run_sqls(dialect, url, param.get("postSql"), table)
    written = sum(int(r["written"]) for r in stats)
    errors = sum(int(r["errors"]) for r in stats)
    return {"records": written, "bytes": 0, "path": _mask_userinfo(url),
            "table": table, "error_records": errors}


def _mask_userinfo(url: str) -> str:
    """Strip the password from a URL before it reaches job stats/logs —
    the reference keeps credentials out of its logged jdbcUrl."""
    import re

    return re.sub(r"//([^/@:]+)(:[^/@]*)?@", r"//\1:***@", url)
