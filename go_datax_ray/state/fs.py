"""Filesystem indirection for the lake data plane.

Plain paths stay on the fast local-OS path (bit-identical behavior to
round 1); URI paths (``file://``, ``s3://``, ``memory://``, any fsspec
scheme) route every lake file operation through fsspec, so the lake can
live on object storage. The data plane needs NO renames (content-
addressed epoch files, manifest-decided visibility); the two tiny
manifest/commit JSON swaps use ``os.replace`` locally and ``fs.mv`` on
remote stores — on S3-class storage the final visibility flip should be
a conditional PUT, which fsspec maps ``mv`` onto for single objects.
"""

from __future__ import annotations

import os
import posixpath
from typing import Any


class LakeFS:
    """Tiny fs facade: local os.* fast path or an fsspec filesystem."""

    def __init__(self, base):
        self.base = base = str(base)
        self.local = "://" not in base
        if self.local:
            self.fs = None
            self.root = base
        else:
            import fsspec

            self.fs, self.root = fsspec.core.url_to_fs(base)

    # -- paths -----------------------------------------------------------
    def join(self, *parts: str) -> str:
        return (os.path.join if self.local else posixpath.join)(self.root, *parts)

    def relpath(self, p: str) -> str:
        return (os.path if self.local else posixpath).relpath(p, self.root)

    # -- predicates ------------------------------------------------------
    def exists(self, p: str) -> bool:
        return os.path.exists(p) if self.local else self.fs.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p) if self.local else self.fs.isdir(p)

    # -- ops -------------------------------------------------------------
    def makedirs(self, p: str) -> None:
        if self.local:
            os.makedirs(p, exist_ok=True)
        else:
            self.fs.makedirs(p, exist_ok=True)

    def open(self, p: str, mode: str = "rb"):
        if self.local:
            return open(p, mode)
        return self.fs.open(p, mode)

    def listdir(self, p: str) -> list[str]:
        if self.local:
            return sorted(os.listdir(p))
        return sorted(posixpath.basename(x.rstrip("/")) for x in self.fs.ls(p, detail=False))

    def remove(self, p: str) -> None:
        if self.local:
            os.remove(p)
        else:
            self.fs.rm(p)

    def rmtree(self, p: str) -> None:
        if self.local:
            import shutil

            shutil.rmtree(p, ignore_errors=True)
        elif self.fs.exists(p):
            self.fs.rm(p, recursive=True)

    def replace(self, src: str, dst: str) -> None:
        """Atomic swap locally; mv (last-writer-wins PUT) on remote."""
        if self.local:
            os.replace(src, dst)
        else:
            self.fs.mv(src, dst)

    def write_json_atomic(self, p: str, payload: str) -> None:
        tmp = p + ".tmp"
        with self.open(tmp, "w" if self.local else "wb") as f:
            data = payload if self.local else payload.encode()
            f.write(data)
            if self.local:
                f.flush()
                os.fsync(f.fileno())
        self.replace(tmp, p)

    # -- Arrow interop ---------------------------------------------------
    def pa_filesystem(self):
        """pyarrow FileSystem for ray.data read/write on this fs."""
        if self.local:
            return None
        from pyarrow.fs import FSSpecHandler, PyFileSystem

        return PyFileSystem(FSSpecHandler(self.fs))

    def read_parquet(self, p: str):
        import pyarrow.parquet as pq

        if self.local:
            return pq.read_table(p)
        with self.open(p, "rb") as f:
            return pq.read_table(f)

    def write_parquet(self, table: Any, p: str, **kwargs: Any) -> None:
        import pyarrow.parquet as pq

        if self.local:
            pq.write_table(table, p, **kwargs)
        else:
            with self.open(p, "wb") as f:
                pq.write_table(table, f, **kwargs)
