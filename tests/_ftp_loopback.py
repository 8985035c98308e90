"""Minimal loopback FTP server for exercising the ftpreader/ftpwriter
paths over a REAL ftp:// connection (stdlib sockets only — no pyftpdlib
in this container). Implements exactly the command subset fsspec's
FTPFileSystem (stdlib ftplib underneath) issues: USER/PASS, TYPE, PASV,
MLSD, RETR (with REST), STOR (with REST), DELE, MKD, RMD, RNFR/RNTO,
SIZE, CWD/PWD, ABOR, NOOP, QUIT. Files live under a local root dir so
tests can assert on-disk state directly. One thread per control
connection; every data transfer opens its own PASV listener.
"""

from __future__ import annotations

import os
import posixpath
import socket
import threading


class _Conn(threading.Thread):
    def __init__(self, sock: socket.socket, root: str, server):
        super().__init__(daemon=True)
        self.sock = sock
        self.root = root
        self.server = server
        self.rest = 0
        self.rnfr: str | None = None
        self.pasv: socket.socket | None = None

    # -- helpers ---------------------------------------------------------
    def send(self, line: str) -> None:
        self.sock.sendall((line + "\r\n").encode("utf-8"))

    def fspath(self, p: str) -> str:
        p = p.strip()
        rel = posixpath.normpath(p).lstrip("/")
        if rel.startswith(".."):
            raise ValueError(f"path escapes root: {p}")
        return os.path.join(self.root, rel) if rel and rel != "." else self.root

    def open_pasv(self) -> None:
        if self.pasv is not None:
            self.pasv.close()
        self.pasv = socket.socket()
        self.pasv.bind(("127.0.0.1", 0))
        self.pasv.listen(1)
        self.pasv.settimeout(10)
        port = self.pasv.getsockname()[1]
        self.send(f"227 Entering Passive Mode (127,0,0,1,{port // 256},{port % 256})")

    def accept_data(self) -> socket.socket:
        assert self.pasv is not None, "PASV not issued before data command"
        conn, _ = self.pasv.accept()
        self.pasv.close()
        self.pasv = None
        return conn

    # -- command loop ----------------------------------------------------
    def run(self) -> None:  # noqa: C901 - a protocol switch is a switch
        try:
            # ftplib.abort() marks its last byte TCP-urgent; inline it so
            # the command line arrives whole on the normal stream
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_OOBINLINE, 1)
            self.send("220 loopback ftp ready")
            buf = b""
            while True:
                while b"\r\n" not in buf:
                    chunk = self.sock.recv(4096)
                    if not chunk:
                        return
                    buf += chunk
                line, buf = buf.split(b"\r\n", 1)
                cmd, _, arg = line.decode("utf-8").partition(" ")
                cmd = cmd.upper()
                try:
                    if not self.dispatch(cmd, arg):
                        return
                except (OSError, ValueError) as e:
                    self.send(f"550 {type(e).__name__}: {e}")
        finally:
            if self.pasv is not None:
                self.pasv.close()
            self.sock.close()

    def dispatch(self, cmd: str, arg: str) -> bool:
        if cmd == "USER":
            self.send("331 password please")
        elif cmd == "PASS":
            self.send("230 logged in")
        elif cmd == "TYPE":
            self.send("200 type set")
        elif cmd in ("NOOP", "OPTS"):
            self.send("200 ok")
        elif cmd == "PWD":
            self.send('257 "/"')
        elif cmd == "CWD":
            self.send("250 ok")
        elif cmd == "PASV":
            self.open_pasv()
        elif cmd == "REST":
            self.rest = int(arg)
            self.send("350 restarting")
        elif cmd == "SIZE":
            self.send(f"213 {os.path.getsize(self.fspath(arg))}")
        elif cmd == "MLSD":
            self.mlsd(arg or "/")
        elif cmd == "RETR":
            self.retr(arg)
        elif cmd == "STOR":
            self.stor(arg)
        elif cmd == "DELE":
            os.remove(self.fspath(arg))
            self.send("250 deleted")
        elif cmd == "MKD":
            os.mkdir(self.fspath(arg))
            self.send(f'257 "{arg}" created')
        elif cmd == "RMD":
            os.rmdir(self.fspath(arg))
            self.send("250 removed")
        elif cmd == "RNFR":
            self.rnfr = self.fspath(arg)
            self.send("350 ready")
        elif cmd == "RNTO":
            assert self.rnfr is not None
            os.replace(self.rnfr, self.fspath(arg))
            self.rnfr = None
            self.send("250 renamed")
        elif cmd == "ABOR":
            # a prior broken transfer already answered 426; this is the
            # ABOR's own reply (ftplib reads one, fsspec one more line)
            self.send("226 abort ok")
        elif cmd == "QUIT":
            self.send("221 bye")
            return False
        else:
            self.send(f"502 {cmd} not implemented")
        return True

    # -- data-channel commands --------------------------------------------
    def mlsd(self, arg: str) -> None:
        d = self.fspath(arg)
        if not os.path.isdir(d):
            self.send("550 not a directory")
            return
        self.send("150 listing")
        data = self.accept_data()
        try:
            for name in sorted(os.listdir(d)):
                full = os.path.join(d, name)
                if os.path.isdir(full):
                    facts = "type=dir;size=0"
                else:
                    facts = f"type=file;size={os.path.getsize(full)}"
                data.sendall(f"{facts};modify=20260101000000; {name}\r\n".encode())
        finally:
            data.close()
        self.send("226 done")

    def retr(self, arg: str) -> None:
        p = self.fspath(arg)
        if not os.path.isfile(p):
            self.send("550 no such file")
            return
        rest, self.rest = self.rest, 0
        self.send("150 sending")
        data = self.accept_data()
        aborted = False
        try:
            with open(p, "rb") as f:
                f.seek(rest)
                while chunk := f.read(65536):
                    try:
                        data.sendall(chunk)
                    except OSError:
                        aborted = True  # client aborted a ranged read
                        break
        finally:
            data.close()
        self.send("426 aborted" if aborted else "226 done")

    def stor(self, arg: str) -> None:
        p = self.fspath(arg)
        rest, self.rest = self.rest, 0
        self.send("150 receiving")
        data = self.accept_data()
        try:
            mode = "r+b" if rest and os.path.exists(p) else "wb"
            with open(p, mode) as f:
                if rest:
                    f.seek(rest)
                while chunk := data.recv(65536):
                    f.write(chunk)
        finally:
            data.close()
        self.send("226 stored")


class LoopbackFtpServer:
    """`with LoopbackFtpServer(rootdir) as url:` — url is
    ``ftp://u:p@127.0.0.1:{port}``."""

    def __init__(self, root: str):
        self.root = root
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            _Conn(conn, self.root, self).start()

    def __enter__(self) -> str:
        self._thread.start()
        return f"ftp://u:p@127.0.0.1:{self.port}"

    def __exit__(self, *exc) -> None:
        self._stop = True
        self.sock.close()
