"""neo4jwriter wire analogue (VERDICT r3 missing #4): user cypher +
$batch parameter rendered as HTTP transaction-API bodies, property-type
conversions per convertColumnValue, replayable with the retrying HTTP
client against a loopback /tx/commit endpoint."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.sinks.http_replay import ReplayError, replay_manifest
from go_datax_ray.sinks.wire import neo4j_tx_body, write_neo4j_tx

CYPHER = "UNWIND $batch AS row MERGE (n:Person {id: row.id}) SET n += row"
PROPS = [
    {"name": "id", "type": "LONG"},
    {"name": "name", "type": "STRING"},
    {"name": "score", "type": "DOUBLE"},
    {"name": "tags", "type": "LIST", "split": "|"},
    {"name": "active", "type": "BOOLEAN"},
]


def _tbl():
    return pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["ada", "bob"]),
        "score": pa.array([1.5, None], pa.float64()),
        "tags": pa.array(["a|b", ""]),
        "active": pa.array([True, False]),
    })


def test_tx_body_layout_and_conversions():
    body = json.loads(neo4j_tx_body(_tbl(), cypher=CYPHER, properties=PROPS))
    (stmt,) = body["statements"]
    assert stmt["statement"] == CYPHER
    rows = stmt["parameters"]["batch"]
    assert rows[0] == {"id": 1, "name": "ada", "score": 1.5,
                       "tags": ["a", "b"], "active": True}
    # null double stays null, empty LIST string -> [], bool False kept
    assert rows[1] == {"id": 2, "name": "bob", "score": None,
                       "tags": [], "active": False}


def test_tx_body_column_count_mismatch_is_loud():
    with pytest.raises(ValueError, match="columns do not match"):
        neo4j_tx_body(_tbl(), cypher=CYPHER, properties=PROPS[:2])


class _FakeNeo4j(BaseHTTPRequestHandler):
    state: dict = {}

    def log_message(self, *a):
        pass

    def do_POST(self):
        st = type(self).state
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n))
        if not self.path.endswith("/tx/commit"):
            code, obj = 404, {"errors": [{"code": "NotFound"}]}
        elif st.get("fail_next", 0) > 0:
            st["fail_next"] -= 1
            code, obj = 503, {"errors": [{"code": "Unavailable"}]}
        else:
            for stmt in body["statements"]:
                st.setdefault("rows", []).extend(stmt["parameters"]["batch"])
            code, obj = 200, {"results": [], "errors": []}
        out = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture()
def neo4j_srv():
    _FakeNeo4j.state = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeNeo4j)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeNeo4j.state
    srv.shutdown()


def test_write_and_replay_with_retry(tmp_path, neo4j_srv):
    endpoint, state = neo4j_srv
    res = write_neo4j_tx(rd.from_arrow(_tbl()), {
        "path": str(tmp_path / "tx"),
        "cypher": CYPHER,
        "properties": json.dumps(PROPS),  # reference passes JSON text
        "batchDataVariableName": "batch",
        "endpoint": endpoint, "database": "graphdb",
        "username": "neo4j", "password": "pw",
    })
    assert res["records"] == 2
    state["fail_next"] = 1  # first POST 503s -> retried
    out = replay_manifest(res["manifest"], backoff_s=0.01)
    assert out["max_attempts"] >= 2
    assert sorted(r["id"] for r in state["rows"]) == [1, 2]


def test_logical_tx_errors_surface(tmp_path, neo4j_srv):
    endpoint, _ = neo4j_srv
    res = write_neo4j_tx(rd.from_arrow(_tbl()), {
        "path": str(tmp_path / "tx"), "cypher": CYPHER,
        "properties": PROPS, "endpoint": endpoint,
    })
    # point at a wrong database path -> 404 body carries errors
    with open(res["manifest"]) as f:
        reqs = [json.loads(ln) for ln in f]
    reqs[0]["url"] = reqs[0]["url"].replace("/tx/commit", "/nope")
    with open(res["manifest"], "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    with pytest.raises(ReplayError):
        replay_manifest(res["manifest"], max_retries=1, backoff_s=0.01)


def test_registry_routes_neo4jwriter(tmp_path, neo4j_srv):
    endpoint, state = neo4j_srv
    from go_datax_ray.registry import SINKS

    res = SINKS["neo4jwriter"](rd.from_arrow(_tbl()), {
        "path": str(tmp_path / "tx"), "cypher": CYPHER,
        "properties": PROPS, "endpoint": endpoint,
    })
    assert res["records"] == 2
    with pytest.raises(ValueError, match="cypher is required"):
        SINKS["neo4jwriter"](rd.from_arrow(_tbl()), {"path": str(tmp_path / "t2")})
