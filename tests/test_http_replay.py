"""Loopback-HTTP smoke for the wire sinks (VERDICT r3 #5 / missing #2):
a stdlib http.server plays the ES / Doris cluster, the rendered
``_requests.jsonl`` manifests replay against it, and the retry loop the
reference has (doris_writer.go:484-548, elasticsearch_writer.go:807-870)
is exercised with injected 503s plus the label-dedup idempotency path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

import ray.data as rd

from go_datax_ray.sinks.http_replay import ReplayError, replay_manifest
from go_datax_ray.sinks.wire import write_es_bulk, write_stream_load


class _FakeCluster(BaseHTTPRequestHandler):
    """Minimal ES + Doris endpoints with failure injection.

    state (class-level, reset per test via fresh server):
    - fail_next[path_kind] = N -> respond 503 to the next N requests
    - seen_labels: stream-load label dedup (second PUT of a label ->
      'Label Already Exists')
    """

    state: dict = {}

    def log_message(self, *a):  # quiet
        pass

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def _reply(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st = type(self).state
        body = self._read_body()
        if not self.path.rstrip("/").endswith("_bulk"):
            return self._reply(404, {"error": "unknown path"})
        if st.get("fail_next_bulk", 0) > 0:
            st["fail_next_bulk"] -= 1
            return self._reply(503, {"error": "unavailable"})
        if self.headers.get("Content-Type") != "application/x-ndjson":
            return self._reply(400, {"error": "bad content type"})
        lines = [ln for ln in body.decode().split("\n") if ln]
        actions = [json.loads(ln) for ln in lines]
        # action metadata lines carry exactly one of these keys
        ops = [a for a in actions
               if set(a) & {"index", "create", "update", "delete"}]
        st.setdefault("bulk_ops", []).extend(ops)
        items = [{next(iter(a)): {"status": 200}} for a in ops]
        return self._reply(200, {"errors": False, "items": items})

    def do_PUT(self):
        st = type(self).state
        self._read_body()
        if "_stream_load" not in self.path:
            return self._reply(404, {"error": "unknown path"})
        if st.get("fail_next_load", 0) > 0:
            st["fail_next_load"] -= 1
            return self._reply(503, {"Status": "Fail", "Message": "be down"})
        if not self.headers.get("Authorization", "").startswith("Basic "):
            return self._reply(400, {"Status": "Fail", "Message": "no auth"})
        label = self.headers.get("label")
        seen = st.setdefault("seen_labels", set())
        if label in seen:
            return self._reply(200, {"Status": "Label Already Exists"})
        seen.add(label)
        st.setdefault("loads", []).append(self.path)
        return self._reply(200, {"Status": "Success"})


@pytest.fixture()
def fake_cluster():
    _FakeCluster.state = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeCluster)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}", _FakeCluster.state
    srv.shutdown()


def _docs_ds():
    return rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "name": pa.array(["a", None, "c", "d"]),
        "op": pa.array(["I", "U", "D", "I"]),
    }))


def test_es_bulk_replays_with_retry(tmp_path, fake_cluster):
    host, state = fake_cluster
    res = write_es_bulk(_docs_ds(), {
        "path": str(tmp_path / "bulk"),
        "index": "docs", "idColumn": "id", "opColumn": "op",
        "endpoint": f"http://{host}",
    })
    state["fail_next_bulk"] = 1  # first POST 503s -> retry must recover
    out = replay_manifest(res["manifest"], backoff_s=0.01)
    assert out["requests"] == len(res["files"])
    assert out["max_attempts"] >= 2  # the 503 was retried
    ops = state["bulk_ops"]
    assert len(ops) == 4
    kinds = sorted(next(iter(a)) for a in ops)
    assert kinds == ["delete", "index", "index", "index"]
    # delete action addressed the right id
    dels = [a["delete"]["_id"] for a in ops if "delete" in a]
    assert dels == ["3"]


def test_stream_load_replays_and_label_dedup(tmp_path, fake_cluster):
    host, state = fake_cluster
    res = write_stream_load(_docs_ds().select_columns(["id", "name"]), {
        "path": str(tmp_path / "load"),
        "connection": [{"table": ["t"], "selectedDatabase": "db",
                        "loadUrl": [host]}],
    })
    state["fail_next_load"] = 1
    out = replay_manifest(res["manifest"], backoff_s=0.01)
    assert out["requests"] == len(res["files"])
    assert out["already_loaded"] == 0
    assert out["max_attempts"] >= 2
    assert all(p == "/api/db/t/_stream_load" for p in state["loads"])
    # replaying the SAME manifest is a no-op: every label already loaded
    out2 = replay_manifest(res["manifest"], backoff_s=0.01)
    assert out2["already_loaded"] == out2["requests"] == out["requests"]
    assert len(state["loads"]) == out["requests"]  # nothing re-applied


def test_client_error_fails_fast(tmp_path, fake_cluster):
    host, _ = fake_cluster
    res = write_es_bulk(_docs_ds(), {
        "path": str(tmp_path / "bulk"),
        "index": "docs", "idColumn": "id",
        "endpoint": f"http://{host}",
    })
    # corrupt the manifest's content type -> server 400s -> NO retry
    with open(res["manifest"]) as f:
        reqs = [json.loads(ln) for ln in f]
    reqs[0]["headers"]["Content-Type"] = "text/plain"
    with open(res["manifest"], "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    with pytest.raises(ReplayError, match="not retried"):
        replay_manifest(res["manifest"], backoff_s=0.01)


def test_exhausted_retries_raise(tmp_path, fake_cluster):
    host, state = fake_cluster
    res = write_stream_load(_docs_ds().select_columns(["id", "name"]), {
        "path": str(tmp_path / "load"),
        "connection": [{"table": ["t"], "loadUrl": [host]}],
    })
    state["fail_next_load"] = 99
    with pytest.raises(ReplayError, match="failed after 2 attempts"):
        replay_manifest(res["manifest"], max_retries=2, backoff_s=0.01)
