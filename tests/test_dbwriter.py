"""Actor-pool DB-API writer: per-dialect upsert SQL (the reference's
four conflict scenarios), per-batch transactions with per-row degraded
retry, preSql/postSql once per job, registry routing."""

from __future__ import annotations

import sqlite3

import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.sinks.dbwriter import DBWriteActor, build_row_sql, write
from go_datax_ray.sources import sqldb


# ---- golden SQL: common.go:557-616 / mysql_writer.go:383-530 ----

CASES = [
    ("mysql", "insert", None,
     "INSERT INTO t (id, a, b) VALUES (%s, %s, %s)"),
    ("mysql", "skip", None,
     "INSERT IGNORE INTO t (id, a, b) VALUES (%s, %s, %s)"),
    ("mysql", "replace", None,
     "REPLACE INTO t (id, a, b) VALUES (%s, %s, %s)"),
    ("mysql", "update", ["id"],
     "INSERT INTO t (id, a, b) VALUES (%s, %s, %s) "
     "ON DUPLICATE KEY UPDATE a=VALUES(a), b=VALUES(b)"),
    ("postgres", "update", ["id"],
     "INSERT INTO t (id, a, b) VALUES (%s, %s, %s) "
     "ON CONFLICT (id) DO UPDATE SET a=EXCLUDED.a, b=EXCLUDED.b"),
    ("postgres", "skip", ["id"],
     "INSERT INTO t (id, a, b) VALUES (%s, %s, %s) "
     "ON CONFLICT (id) DO NOTHING"),
    # postgres has no REPLACE INTO: replace renders the same upsert
    ("postgres", "replace", ["id"],
     "INSERT INTO t (id, a, b) VALUES (%s, %s, %s) "
     "ON CONFLICT (id) DO UPDATE SET a=EXCLUDED.a, b=EXCLUDED.b"),
    ("sqlite", "update", ["id"],
     "INSERT INTO t (id, a, b) VALUES (?, ?, ?) "
     "ON CONFLICT (id) DO UPDATE SET a=excluded.a, b=excluded.b"),
]


@pytest.mark.parametrize("dialect,mode,pks,expect", CASES)
def test_row_sql_golden(dialect, mode, pks, expect):
    got = build_row_sql(dialect, "t", ["id", "a", "b"],
                        mode=mode, primary_keys=pks)
    assert got == expect


ORACLE_SQLSERVER_CASES = [
    # oracle_writer.go:295-304: :colN binds, bare INSERT
    ("oracle", "insert", None,
     "INSERT INTO t (id, a, b) VALUES (:col1, :col2, :col3)"),
    ("oracle", "update", ["id"],
     "MERGE INTO t t USING (SELECT :col1 AS id, :col2 AS a, :col3 AS b "
     "FROM dual) s ON (t.id = s.id)"
     " WHEN MATCHED THEN UPDATE SET t.a = s.a, t.b = s.b"
     " WHEN NOT MATCHED THEN INSERT (id, a, b) "
     "VALUES (s.id, s.a, s.b)"),
    ("oracle", "skip", ["id"],
     "MERGE INTO t t USING (SELECT :col1 AS id, :col2 AS a, :col3 AS b "
     "FROM dual) s ON (t.id = s.id)"
     " WHEN NOT MATCHED THEN INSERT (id, a, b) "
     "VALUES (s.id, s.a, s.b)"),
    # sqlserver_writer.go:414-446: [bracket] quoting, ? binds
    ("sqlserver", "insert", None,
     "INSERT INTO [t] ([id], [a], [b]) VALUES (?, ?, ?);"),
    ("sqlserver", "replace", ["id"],
     "MERGE INTO [t] t USING (SELECT ? AS [id], ? AS [a], ? AS [b]) s "
     "ON (t.[id] = s.[id])"
     " WHEN MATCHED THEN UPDATE SET t.[a] = s.[a], t.[b] = s.[b]"
     " WHEN NOT MATCHED THEN INSERT ([id], [a], [b]) "
     "VALUES (s.[id], s.[a], s.[b]);"),
]


@pytest.mark.parametrize("dialect,mode,pks,expect", ORACLE_SQLSERVER_CASES)
def test_merge_dialect_sql_golden(dialect, mode, pks, expect):
    got = build_row_sql(dialect, "t", ["id", "a", "b"],
                        mode=mode, primary_keys=pks)
    assert got == expect


def test_oracle_rows_become_named_bind_dicts():
    log: list = []
    monkey = _FakeCon(log)
    import go_datax_ray.sources.sqldb as sqldb_mod

    sqldb_mod.DBAPI_FACTORIES["oracle"] = lambda url: monkey
    try:
        actor = DBWriteActor(dialect="oracle", url="oracle://h:1521/db",
                             table="t", columns=["id", "v"],
                             mode="insert", primary_keys=["id"])
        actor(pa.table({"id": [7], "v": ["x"]}))
    finally:
        del sqldb_mod.DBAPI_FACTORIES["oracle"]
    kind, sql, rows = log[0]
    assert sql == "INSERT INTO t (id, v) VALUES (:col1, :col2)"
    assert rows == [{"col1": 7, "col2": "x"}]


def test_wire_compat_dialect_routing():
    # GaussDB speaks the postgres protocol; OceanBase's MySQL mode
    # speaks mysql's — their jdbcUrls resolve to those DB-API dialects
    assert sqldb._driver({"jdbcUrl": "jdbc:gaussdb://h:8000/db"}) == "postgres"
    assert sqldb._driver({"jdbcUrl": "jdbc:oceanbase://h:2881/db"}) == "mysql"
    assert sqldb._driver({"jdbcUrl": "jdbc:oracle://h:1521/orcl"}) == "oracle"
    assert sqldb._driver({"jdbcUrl": "mssql://h:1433/db"}) == "sqlserver"


def test_all_pk_table_degrades_to_skip():
    # common.go:572-578 scenario 2: every column is a key -> skip dups
    assert build_row_sql("mysql", "t", ["id", "code"], mode="update",
                         primary_keys=["id", "code"]).startswith(
        "INSERT IGNORE INTO t")
    assert "DO NOTHING" in build_row_sql(
        "postgres", "t", ["id", "code"], mode="update",
        primary_keys=["id", "code"])


def test_default_pk_is_first_column():
    # mysql_writer.go:500-505: no declared key -> columns[1:] update
    got = build_row_sql("mysql", "t", ["k", "v"], mode="update")
    assert got.endswith("ON DUPLICATE KEY UPDATE v=VALUES(v)")


# ---- the mysql network path through a recording DB-API fake ----

class _FakeCon:
    def __init__(self, log):
        self.log = log

    def executemany(self, sql, rows):
        self.log.append(("executemany", sql, list(rows)))

    def execute(self, sql, row=None):
        self.log.append(("execute", sql, row))

    def commit(self):
        self.log.append(("commit", None, None))

    def rollback(self):
        self.log.append(("rollback", None, None))

    def close(self):
        pass


def test_mysql_actor_path_with_fake_driver(monkeypatch):
    log: list = []
    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "mysql",
                        lambda url: _FakeCon(log))
    actor = DBWriteActor(dialect="mysql", url="mysql://h:3306/db",
                         table="t", columns=["id", "v"], mode="update",
                         primary_keys=["id"])
    out = actor(pa.table({"id": [1, 2], "v": ["a", "b"]}))
    assert out.column("written").to_pylist() == [2]
    kind, sql, rows = log[0]
    assert kind == "executemany"
    assert sql == ("INSERT INTO t (id, v) VALUES (%s, %s) "
                   "ON DUPLICATE KEY UPDATE v=VALUES(v)")
    assert rows == [(1, "a"), (2, "b")]
    assert log[1][0] == "commit"  # one transaction per batch


class _StrictCon:
    """DB-API-strict fake: executemany/execute live ONLY on the cursor,
    as in pymysql/psycopg2 (connections expose neither)."""

    def __init__(self, log):
        self.log = log

    class _Cur:
        def __init__(self, log):
            self.log = log

        def executemany(self, sql, rows):
            self.log.append(("executemany", sql, list(rows)))

        def execute(self, sql, row=None):
            self.log.append(("execute", sql, row))

    def cursor(self):
        return self._Cur(self.log)

    def commit(self):
        self.log.append(("commit", None, None))

    def rollback(self):
        self.log.append(("rollback", None, None))

    def close(self):
        pass


def test_strict_dbapi_connection_uses_cursor(monkeypatch):
    log: list = []
    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "mysql",
                        lambda url: _StrictCon(log))
    actor = DBWriteActor(dialect="mysql", url="mysql://h:3306/db",
                         table="t", columns=["id", "v"], mode="insert",
                         primary_keys=["id"])
    out = actor(pa.table({"id": [1], "v": ["x"]}))
    assert out.column("written").to_pylist() == [1]
    assert [k for k, _, _ in log] == ["executemany", "commit"]


def test_missing_driver_fails_loudly():
    with pytest.raises(RuntimeError, match="pymysql"):
        DBWriteActor(dialect="mysql", url="mysql://h:3306/db", table="t",
                     columns=["id"], mode="insert", primary_keys=["id"])


# ---- full distributed path over sqlite (ray actor pool) ----

def _read(db, sql):
    con = sqlite3.connect(db)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_upsert_end_to_end_sqlite(ray_session, tmp_path):
    db = str(tmp_path / "w.db")
    base = {
        "jdbcUrl": db, "driver": "sqlite", "table": "t",
        "primaryKeys": ["id"], "writeMode": "update", "channel": 1,
        "preSql": ["CREATE TABLE IF NOT EXISTS @table "
                   "(id INTEGER PRIMARY KEY, v TEXT)"],
    }
    r1 = write(rd.from_arrow(pa.table({"id": [1, 2, 3],
                                       "v": ["a", "b", "c"]})), base)
    assert (r1["records"], r1["error_records"]) == (3, 0)
    # second wave updates 2 and inserts 4 — last write wins per key
    r2 = write(rd.from_arrow(pa.table({"id": [2, 4],
                                       "v": ["B", "d"]})), base)
    assert (r2["records"], r2["error_records"]) == (2, 0)
    assert _read(db, "SELECT id, v FROM t ORDER BY id") == [
        (1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_poison_row_degraded_retry_sqlite(ray_session, tmp_path):
    db = str(tmp_path / "p.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.execute("INSERT INTO t VALUES (2, 'taken')")
    con.commit()
    con.close()
    # plain insert: id=2 collides -> batch fails -> per-row retry lands
    # 1 and 3, counts one error, and postSql still runs
    res = write(rd.from_arrow(pa.table({"id": [1, 2, 3],
                                        "v": ["a", "x", "c"]})), {
        "jdbcUrl": db, "driver": "sqlite", "table": "t",
        "writeMode": "insert", "channel": 1,
        "postSql": ["INSERT INTO @table VALUES (99, 'post')"],
    })
    assert (res["records"], res["error_records"]) == (2, 1)
    assert _read(db, "SELECT id FROM t ORDER BY id") == [
        (1,), (2,), (3,), (99,)]


def test_registry_routing(tmp_path):
    from go_datax_ray.registry import SINKS

    ds = rd.from_arrow(pa.table({"id": [1]}))
    # network jdbcUrl routes to the DB-API pool -> loud driver error
    # from the driver-side connection probe, before any Ray actor
    # spawns (an actor pool whose constructor raises persistently
    # spins in restarts instead of failing) — with or without preSql
    with pytest.raises(RuntimeError, match="pymysql"):
        SINKS["mysqlwriter"](ds, {"jdbcUrl": "jdbc:mysql://h:3306/db",
                                  "table": "t", "preSql": ["SELECT 1"]})
    with pytest.raises(RuntimeError, match="pymysql"):
        SINKS["mysqlwriter"](ds, {"jdbcUrl": "jdbc:mysql://h:3306/db",
                                  "table": "t"})
    # non-network params keep the explicit collapse gate
    with pytest.raises(ValueError, match="allowCollapse"):
        SINKS["mysqlwriter"](ds, {"path": str(tmp_path), "table": "t"})
    # databend over its public MySQL-wire endpoint takes the same path
    with pytest.raises(RuntimeError, match="pymysql"):
        SINKS["databendwriter"](ds, {"jdbcUrl": "mysql://h:3307/db",
                                     "table": "t", "preSql": ["SELECT 1"]})


def test_poison_row_retry_commits_per_row(monkeypatch):
    """Postgres-style transaction-abort semantics: after a failed
    statement every later statement in the SAME transaction fails, so
    the degraded retry must commit/rollback per row or a poison row
    silently discards the rest of the batch."""

    class TxCon:
        def __init__(self):
            self.aborted = False
            self.committed: list = []
            self.pending: list = []

        def cursor(self):
            con = self

            class Cur:
                def executemany(self, sql, rows):
                    raise RuntimeError("duplicate key")

                def execute(self, sql, row=None):
                    if con.aborted:
                        raise RuntimeError(
                            "current transaction is aborted")
                    if row[0] == 2:
                        con.aborted = True
                        raise RuntimeError("duplicate key")
                    con.pending.append(row)

            return Cur()

        def commit(self):
            if self.aborted:
                raise RuntimeError("current transaction is aborted")
            self.committed.extend(self.pending)
            self.pending = []

        def rollback(self):
            self.aborted = False
            self.pending = []

        def close(self):
            pass

    con = TxCon()
    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "postgres",
                        lambda url: con)
    actor = DBWriteActor(dialect="postgres", url="postgres://h/db",
                         table="t", columns=["id"], mode="insert",
                         primary_keys=["id"])
    out = actor(pa.table({"id": [1, 2, 3]}))
    assert out.column("written").to_pylist() == [2]
    assert out.column("errors").to_pylist() == [1]
    assert con.committed == [(1,), (3,)]


def test_sqlserver_jdbc_property_url():
    # jdbc:sqlserver://host:port;DatabaseName=db (the reference's and
    # Microsoft's documented format) must not crash urlparse and must
    # carry the database into the ODBC string
    captured = []

    class FakePyodbc:
        @staticmethod
        def connect(s):
            captured.append(s)
            return _FakeCon([])

    import sys
    sys.modules["pyodbc"] = FakePyodbc
    try:
        sqldb._net_connect(
            "sqlserver", "sqlserver://h:3433;DatabaseName=mydb")
    finally:
        del sys.modules["pyodbc"]
    assert "SERVER=h,3433" in captured[0]
    assert "DATABASE=mydb" in captured[0]


def test_multi_url_split_keeps_network_driver(monkeypatch):
    opened = []

    def factory(url):
        opened.append(url)
        raise RuntimeError("stop here")  # prove the DB-API path was taken

    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "mysql", factory)
    with pytest.raises(RuntimeError, match="stop here"):
        sqldb.read({"connection": [{
            "jdbcUrl": ["mysql://h1:3306/db", "mysql://h2:3306/db"],
            "table": ["t"]}]}, channel=2)
    assert opened and opened[0].startswith("mysql://h1")


# ---- property: renderer invariants over random shapes ----

from hypothesis import given, settings, strategies as st

_ident = st.text(alphabet="abcdefghij_", min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(
    dialect=st.sampled_from(["mysql", "postgres", "sqlite", "oracle",
                             "sqlserver"]),
    mode=st.sampled_from(["insert", "skip", "update", "replace"]),
    cols=st.lists(_ident, min_size=1, max_size=6, unique=True),
    data=st.data(),
)
def test_row_sql_invariants(dialect, mode, cols, data):
    n_pk = data.draw(st.integers(min_value=1, max_value=len(cols)))
    pks = cols[:n_pk]
    sql = build_row_sql(dialect, "tbl", cols, mode=mode, primary_keys=pks)
    # balanced parens, single statement
    assert sql.count("(") == sql.count(")")
    assert ";" not in sql.rstrip(";")
    # every column name appears
    for c in cols:
        assert c in sql
    # each bind appears the expected number of times: merge forms bind
    # each column once; mysql/postgres/sqlite templates bind positionally
    if dialect == "oracle":
        assert all(f":col{i + 1}" in sql for i in range(len(cols)))
        if mode == "insert":
            assert sql.startswith("INSERT INTO")
        else:
            assert sql.startswith("MERGE INTO")
    elif dialect == "sqlserver":
        assert sql.count("?") == len(cols)
        assert all(f"[{c}]" in sql for c in cols)
    else:
        ph = {"mysql": "%s", "postgres": "%s", "sqlite": "?"}[dialect]
        assert sql.count(ph) == len(cols)
    # an all-PK key set must never render an UPDATE clause (scenario 2)
    if set(pks) == set(cols):
        assert "UPDATE SET" not in sql and "DO UPDATE" not in sql \
            and "ON DUPLICATE" not in sql
