"""Minimal loopback WebHDFS server for exercising the hdfsreader /
hdfswriter / lake paths over a REAL webhdfs:// REST connection (stdlib
http.server only — no Hadoop in this container). Implements exactly the
operation subset fsspec's WebHDFS issues (public WebHDFS REST API,
hadoop.apache.org/docs/stable/hadoop-project-dist/hadoop-hdfs/WebHDFS.html):

  GETFILESTATUS, LISTSTATUS, OPEN (offset/length, namenode 307 ->
  datanode GET), CREATE (307 -> datanode PUT) + APPEND (307 -> datanode
  POST) — the two-step redirect dance fsspec's WebHDFile performs on
  every write — MKDIRS, DELETE (recursive), RENAME.

Files live under a local root dir so tests can assert on-disk state
directly. RENAME is os.replace — atomic, exactly the semantics a real
HDFS namenode gives the lake's manifest swap.
"""

from __future__ import annotations

import json
import os
import posixpath
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit


def _status(path: str, suffix: str = "") -> dict:
    st = os.stat(path)
    return {
        "pathSuffix": suffix,
        "type": "DIRECTORY" if os.path.isdir(path) else "FILE",
        "length": 0 if os.path.isdir(path) else st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "accessTime": int(st.st_atime * 1000),
        "permission": "755",
        "owner": "loopback",
        "group": "loopback",
        "replication": 1,
        "blockSize": 134217728,
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "LoopbackWebHDFS/1"
    root: str  # set on the server class per instance
    base: str

    # -- plumbing ----------------------------------------------------------
    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self, hpath: str) -> None:
        self._json(404, {"RemoteException": {
            "exception": "FileNotFoundException",
            "javaClassName": "java.io.FileNotFoundException",
            "message": f"File does not exist: {hpath}",
        }})

    def _redirect(self, query: str) -> None:
        self.send_response(307)
        self.send_header("Location", f"{self.base}{self.hpath}?{query}&datanode=1")
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _parse(self) -> dict:
        u = urlsplit(self.path)
        assert u.path.startswith("/webhdfs/v1"), u.path
        self.hpath = u.path[len("/webhdfs/v1"):] or "/"
        rel = posixpath.normpath(self.hpath).lstrip("/")
        if rel.startswith(".."):
            raise ValueError(f"path escapes root: {self.hpath}")
        self.fspath = os.path.join(self.root, rel) if rel not in ("", ".") else self.root
        return {k: v[0] for k, v in parse_qs(u.query).items()}

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    # -- verbs -------------------------------------------------------------
    def do_GET(self) -> None:
        q = self._parse()
        op = q.get("op", "").upper()
        if op == "GETFILESTATUS":
            if not os.path.exists(self.fspath):
                return self._not_found(self.hpath)
            return self._json(200, {"FileStatus": _status(self.fspath)})
        if op == "LISTSTATUS":
            if not os.path.exists(self.fspath):
                return self._not_found(self.hpath)
            if os.path.isfile(self.fspath):
                return self._json(200, {"FileStatuses": {"FileStatus": [
                    _status(self.fspath, posixpath.basename(self.hpath))]}})
            return self._json(200, {"FileStatuses": {"FileStatus": [
                _status(os.path.join(self.fspath, n), n)
                for n in sorted(os.listdir(self.fspath))]}})
        if op == "OPEN":
            if not os.path.isfile(self.fspath):
                return self._not_found(self.hpath)
            if "datanode" not in q:
                keep = "&".join(f"{k}={v}" for k, v in q.items())
                return self._redirect(keep)
            offset = int(q.get("offset", 0))
            length = int(q["length"]) if "length" in q else None
            with open(self.fspath, "rb") as f:
                f.seek(offset)
                data = f.read(length) if length is not None else f.read()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        self._json(400, {"RemoteException": {"exception": "UnsupportedOperationException", "message": op}})

    def do_PUT(self) -> None:
        q = self._parse()
        op = q.get("op", "").upper()
        if op == "CREATE":
            if "datanode" not in q:
                return self._redirect("op=CREATE")
            os.makedirs(os.path.dirname(self.fspath), exist_ok=True)
            with open(self.fspath, "wb") as f:
                f.write(self._body())
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if op == "MKDIRS":
            os.makedirs(self.fspath, exist_ok=True)
            return self._json(200, {"boolean": True})
        if op == "RENAME":
            # Hadoop FileSystem.rename contract: FAILS (boolean false,
            # HTTP 200) when the destination exists — it is NOT an
            # overwriting os.replace. fsspec's WebHDFS.mv ignores the
            # boolean, so callers that assume overwrite silently no-op
            # on real HDFS; LakeFS.replace handles this explicitly.
            dst = q["destination"]
            rel = posixpath.normpath(dst).lstrip("/")
            dst_fs = os.path.join(self.root, rel)
            if os.path.exists(dst_fs) or not os.path.exists(self.fspath):
                return self._json(200, {"boolean": False})
            os.replace(self.fspath, dst_fs)
            return self._json(200, {"boolean": True})
        self._json(400, {"RemoteException": {"exception": "UnsupportedOperationException", "message": op}})

    def do_POST(self) -> None:
        q = self._parse()
        op = q.get("op", "").upper()
        if op == "APPEND":
            if "datanode" not in q:
                return self._redirect("op=APPEND")
            if not os.path.isfile(self.fspath):
                return self._not_found(self.hpath)
            with open(self.fspath, "ab") as f:
                f.write(self._body())
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self._json(400, {"RemoteException": {"exception": "UnsupportedOperationException", "message": op}})

    def do_DELETE(self) -> None:
        q = self._parse()
        op = q.get("op", "").upper()
        if op == "DELETE":
            if os.path.isdir(self.fspath):
                if q.get("recursive") == "true":
                    shutil.rmtree(self.fspath)
                else:
                    os.rmdir(self.fspath)
            elif os.path.exists(self.fspath):
                os.remove(self.fspath)
            return self._json(200, {"boolean": True})
        self._json(400, {"RemoteException": {"exception": "UnsupportedOperationException", "message": op}})


class LoopbackWebHdfsServer:
    """`with LoopbackWebHdfsServer(rootdir) as url:` — url is
    ``webhdfs://127.0.0.1:{port}`` (append the HDFS path)."""

    def __init__(self, root: str):
        handler = type("Handler", (_Handler,), {})
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        handler.root = root
        handler.base = f"http://127.0.0.1:{self.port}/webhdfs/v1"
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def __enter__(self) -> str:
        self._thread.start()
        return f"webhdfs://127.0.0.1:{self.port}"

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
