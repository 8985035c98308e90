"""doris/starrocks/clickhouse readers on real network paths (VERDICT r4
next-round #2): Doris/StarRocks route onto the pymysql DB-API adapter
(their FEs speak the MySQL protocol, doris_reader.go:117-136,
starrocks_reader.go:464-478); ClickHouse reads over the server's public
HTTP interface with SELECT ... FORMAT TabSeparatedWithNamesAndTypes —
exercised against a loopback http.server playing the cluster."""

from __future__ import annotations

import re
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from go_datax_ray.registry import SOURCES
from go_datax_ray.sources import clickhouse_http as ch
from go_datax_ray.sources import sqldb


# ---------------------------------------------------------------- routing

def test_doris_starrocks_scheme_aliases():
    assert sqldb._driver({"jdbcUrl": "jdbc:doris://fe:9030/db"}) == "mysql"
    assert sqldb._driver({"jdbcUrl": "jdbc:starrocks://fe:9030/db"}) == "mysql"
    # the reference's documented URL shape
    assert sqldb._driver({"jdbcUrl": "jdbc:mysql://fe:9030/db"}) == "mysql"


@pytest.mark.parametrize("name", ["dorisreader", "starrocksreader"])
def test_doris_starrocks_route_to_dbapi_and_fail_loudly(name):
    """A network jdbcUrl routes to the DB-API source; with no pymysql in
    this container the read fails LOUDLY with the install hint."""
    param = {"jdbcUrl": "jdbc:mysql://fe:9030/shop", "table": "t",
             "column": ["id", "v"]}
    with pytest.raises(Exception, match="pymysql"):
        SOURCES[name](param, channel=1).take_all()


@pytest.mark.parametrize("name", ["dorisreader", "starrocksreader",
                                  "clickhousereader"])
def test_collapse_still_guarded(name):
    with pytest.raises(ValueError, match="allowCollapse"):
        SOURCES[name]({"path": "/tmp/t.parquet"})


def test_doris_split_through_fake_mysql_driver(tmp_path, monkeypatch):
    """The full splitPk machinery driver-side through a file-backed fake
    mysql driver — same integration shape as test_net_dbapi."""
    db = str(tmp_path / "fake_doris.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        [(i, f"v{i}") for i in range(60)])
    monkeypatch.setitem(
        sqldb.DBAPI_FACTORIES, "mysql",
        lambda url: sqlite3.connect(db, check_same_thread=False))
    queries = sqldb.build_queries(
        {"jdbcUrl": "jdbc:doris://fe:9030/db", "table": "t",
         "column": ["id", "v"], "splitPk": "id"},
        channel=3, min_max=(0, 59))
    assert len(queries) == 3
    con = sqlite3.connect(db)
    rows = [r for q in queries for r in con.execute(q).fetchall()]
    con.close()
    assert sorted(r[0] for r in rows) == list(range(60))


# --------------------------------------------------- clickhouse HTTP path

class _FakeClickHouse(BaseHTTPRequestHandler):
    """Loopback ClickHouse HTTP interface over an in-memory table."""

    ROWS = [(i, f"name\t{i}" if i % 10 == 0 else f"name{i}",
             None if i % 7 == 0 else float(i) / 2) for i in range(40)]

    def do_POST(self):  # noqa: N802
        sql = self.rfile.read(int(self.headers["Content-Length"])).decode()
        assert "FORMAT TabSeparatedWithNamesAndTypes" in sql
        if "MIN(id), MAX(id)" in sql:
            body = "MIN(id)\tMAX(id)\nInt64\tInt64\n0\t39\n"
        else:
            lo, hi = 0, 10 ** 9
            m = re.search(r"id >= (\d+) AND id < (\d+)", sql)
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
            m2 = re.search(r"id >= (\d+) AND id <= (\d+)", sql)
            if m2:
                lo, hi = int(m2.group(1)), int(m2.group(2)) + 1
            esc = lambda s: s.replace("\\", "\\\\").replace("\t", "\\t")
            lines = ["id\tname\tscore", "Int64\tString\tNullable(Float64)"]
            for i, nm, sc in self.ROWS:
                if lo <= i < hi:
                    lines.append(
                        f"{i}\t{esc(nm)}\t" + ("\\N" if sc is None else str(sc)))
            body = "\n".join(lines) + "\n"
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def ch_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeClickHouse)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_clickhouse_read_end_to_end(ray_session, ch_server):
    port = ch_server.rsplit(":", 1)[1]
    ds = SOURCES["clickhousereader"](
        {"jdbcUrl": f"jdbc:clickhouse://127.0.0.1:{port}/shop",
         "table": "t", "column": ["id", "name", "score"]}, channel=1)
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    assert len(rows) == 40
    assert rows[0] == {"id": 0, "name": "name\t0", "score": None}
    assert rows[1]["score"] == 0.5  # typed float, not string


def test_clickhouse_splitpk_range_read(ray_session, ch_server):
    ds = SOURCES["clickhousereader"](
        {"endpoint": ch_server, "database": "shop", "table": "t",
         "column": ["id", "name", "score"], "splitPk": "id"}, channel=4)
    rows = ds.take_all()
    assert sorted(r["id"] for r in rows) == list(range(40))


def test_clickhouse_unreachable_fails_loudly():
    with pytest.raises(RuntimeError, match="cannot reach ClickHouse"):
        ch.http_select("http://127.0.0.1:9", "db", "SELECT 1")


def test_tsv_parse_escapes_nulls_types():
    t = ch.parse_tsv_with_names_and_types(
        b"a\tb\nInt64\tNullable(String)\n1\tx\\ty\n2\t\\N\n3\tz\\\\w\n")
    assert t.column("a").to_pylist() == [1, 2, 3]
    assert t.column("b").to_pylist() == ["x\ty", None, "z\\w"]


def test_native_port_maps_to_http():
    ep, db = ch._endpoint({"jdbcUrl": "jdbc:clickhouse://h:9000/mydb"})
    assert ep == "http://h:8123" and db == "mydb"
    ep2, db2 = ch._endpoint({"jdbcUrl": "clickhouse://h/otherdb"})
    assert ep2 == "http://h:8123" and db2 == "otherdb"


def test_tsv_parse_bool_and_wrapped_types():
    """Review fixes: Bool decodes true/false (not int crash);
    LowCardinality(Nullable(T)) unwraps in either nesting order."""
    t = ch.parse_tsv_with_names_and_types(
        b"ok\tn\ts\nBool\tLowCardinality(Nullable(Int64))\t"
        b"Nullable(LowCardinality(String))\n"
        b"true\t5\tx\nfalse\t\\N\t\\N\n1\t7\ty\n")
    assert t.column("ok").to_pylist() == [True, False, True]
    assert t.column("n").to_pylist() == [5, None, 7]  # typed int, not string
    assert t.column("n").type == __import__("pyarrow").int64()
    assert t.column("s").to_pylist() == ["x", None, "y"]


def test_password_only_auth_sends_key_for_default_user():
    """A password without a username must still be sent — it targets
    ClickHouse's implicit 'default' user."""
    captured = {}

    class _H(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            captured["user"] = self.headers.get("X-ClickHouse-User")
            captured["key"] = self.headers.get("X-ClickHouse-Key")
            self.rfile.read(int(self.headers["Content-Length"]))
            body = b"x\nInt64\n1\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        ch.http_select(f"http://127.0.0.1:{srv.server_address[1]}", "db",
                       "SELECT 1", password="sekret")
    finally:
        srv.shutdown()
    assert captured == {"user": "default", "key": "sekret"}
