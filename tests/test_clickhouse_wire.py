"""clickhousewriter wire analogue: TabSeparated INSERT chunks over the
public HTTP interface, preSql/postSql as ordered query requests, replay
with the retrying HTTP client against a loopback server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.sinks.http_replay import replay_manifest
from go_datax_ray.sinks.wire import clickhouse_tsv, write_clickhouse


def _tbl():
    return pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "txt": pa.array(["plain", "tab\there\nand\\slash"]),
        "val": pa.array([1.5, None], pa.float64()),
    })


def test_tsv_escaping_golden():
    body = clickhouse_tsv(_tbl()).decode()
    lines = body.split("\n")
    assert lines[0] == "1\tplain\t1.5"
    # tab/newline/backslash escaped, NULL renders \N
    assert lines[1] == "2\ttab\\there\\nand\\\\slash\t\\N"
    assert body.endswith("\n")
    assert clickhouse_tsv(_tbl().slice(0, 0)) == b""


class _FakeCH(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *a):
        pass

    def do_POST(self):
        st = type(self).state
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n).decode()
        q = parse_qs(urlparse(self.path).query).get("query", [""])[0]
        if st.get("fail_next", 0) > 0:
            st["fail_next"] -= 1
            out = b"Code: 202. DB::Exception: Too many simultaneous queries"
            self.send_response(503)
        else:
            if q:  # INSERT ... FORMAT TabSeparated with TSV body
                st.setdefault("inserts", []).append((q, body))
            else:  # bare statement in the body (preSql/postSql)
                st.setdefault("statements", []).append(body)
            out = b""
            self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture()
def ch_srv():
    _FakeCH.state = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCH)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeCH.state
    srv.shutdown()


def test_write_and_replay_with_pre_post(tmp_path, ch_srv):
    endpoint, state = ch_srv
    res = write_clickhouse(rd.from_arrow(_tbl()), {
        "path": str(tmp_path / "ch"),
        "connection": [{"table": ["t1"], "database": "shop"}],
        "database": "shop",
        "endpoint": endpoint,
        "username": "default", "password": "pw",
        "preSql": ["TRUNCATE TABLE @table"],
        "postSql": ["OPTIMIZE TABLE @table"],
    })
    assert res["records"] == 2
    state["fail_next"] = 1  # exercise the retry loop on the first request
    out = replay_manifest(res["manifest"], backoff_s=0.01)
    assert out["max_attempts"] >= 2
    # preSql ran FIRST, postSql LAST, inserts in between
    assert state["statements"][0] == "TRUNCATE TABLE t1"
    assert state["statements"][-1] == "OPTIMIZE TABLE t1"
    (q, body), = state["inserts"]
    assert q == "INSERT INTO shop.t1 (id, txt, val) FORMAT TabSeparated"
    assert body.count("\n") == 2


def test_registry_routes_clickhousewriter(tmp_path, ch_srv):
    endpoint, _ = ch_srv
    from go_datax_ray.registry import SINKS

    res = SINKS["clickhousewriter"](rd.from_arrow(_tbl()), {
        "path": str(tmp_path / "ch"), "table": "t", "endpoint": endpoint,
    })
    assert res["records"] == 2
    with pytest.raises(ValueError, match="parameter.path"):
        SINKS["clickhousewriter"](rd.from_arrow(_tbl()), {"table": "t"})
    # the collapse opt-in still works
    res2 = SINKS["clickhousewriter"](rd.from_arrow(_tbl()), {
        "allowCollapse": True, "path": str(tmp_path / "lakeout"), "table": "t",
    })
    assert res2["records"] == 2
