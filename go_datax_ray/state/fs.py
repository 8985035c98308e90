"""Filesystem indirection for the lake data plane.

Plain paths stay on the fast local-OS path (bit-identical behavior to
round 1); URI paths (``file://``, ``s3://``, ``memory://``, any fsspec
scheme) route every lake file operation through fsspec, so the lake can
live on object storage. The data plane needs NO renames (content-
addressed epoch files, manifest-decided visibility); the two tiny
manifest/commit JSON swaps use ``os.replace`` locally and ``fs.mv``
(copy+delete, last-writer-wins) on remote stores.

**Object-store lakes are HARD single-writer.** fsspec's ``mv`` is NOT a
conditional PUT: two concurrent committers on a remote lake can
last-writer-win the ``_manifest.json`` swap and silently drop the other
committer's epoch. Local lakes are protected by the flock in
``writer_lock``; remote lakes have no cross-process lock, so exactly
one replay/compact/gc job per remote lake is a deployment requirement
(enforce it in the scheduler). As a second line of defense the commit
protocol fences each epoch's commit record behind an atomic
create-if-absent where the store has one — ``os.link`` locally, a
conditional PUT (S3 ``If-None-Match``) on the boto-backed s3 path
(``write_json_if_absent`` below, ``Manifest._write_commit_record_fenced``)
— so a commit race is detected instead of silently lost; generic fsspec
filesystems without a conditional primitive keep last-writer-wins.
"""

from __future__ import annotations

import contextlib
import os
import posixpath
from typing import Any


@contextlib.contextmanager
def writer_lock(lake_dir: str):
    """Exclusive lake writer flock — the single mutual-exclusion point
    shared by replay, compact, gc-orphans, gc-history and delete-where
    (all of them rewrite epoch files or the manifest, so any pair racing
    corrupts an in-flight commit). Non-blocking: a second holder fails
    fast. The OS releases the flock on crash, so a dead writer never
    wedges the lake. Remote (URI) lakes have no cross-process lock —
    see the module docstring's hard single-writer requirement."""
    if "://" in str(lake_dir):
        yield  # remote: deployment-level single-writer (docstring)
        return
    import fcntl

    os.makedirs(lake_dir, exist_ok=True)
    lock_f = open(os.path.join(lake_dir, "_writer.lock"), "w")
    try:
        fcntl.flock(lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError as e:
        lock_f.close()
        raise RuntimeError(
            f"another job holds the lake writer lock on {lake_dir}"
        ) from e
    try:
        yield
    finally:
        fcntl.flock(lock_f, fcntl.LOCK_UN)
        lock_f.close()


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
        """Atomic swap locally; mv on remote (copy+delete on object
        stores, namenode rename on HDFS — last-writer-wins either way,
        see the module docstring's hard single-writer requirement).

        HDFS-semantics stores REJECT a rename onto an existing
        destination (Hadoop FileSystem.rename returns false; WebHDFS
        reports it as ``{"boolean": false}`` with HTTP 200, which
        fsspec's ``mv`` silently ignores) — without the check below the
        manifest swap would silently no-op on every save after the
        first. Detect the rejected overwrite by the src surviving the
        mv, then delete dst and retry once. The dst-missing window this
        opens is readers-see-no-manifest (fail-safe: an empty Manifest,
        never a partial one), only on rename-semantics stores, under
        the single-writer rule."""
        if self.local:
            os.replace(src, dst)
            return
        self.fs.mv(src, dst)
        if self.fs.exists(src):  # rename-refused-overwrite semantics
            self.fs.rm(dst)
            self.fs.mv(src, dst)
            if self.fs.exists(src):
                raise OSError(f"remote rename {src} -> {dst} failed twice")

    def write_json_atomic(self, p: str, payload: str) -> None:
        tmp = p + ".tmp"
        with self.open(tmp, "w" if self.local else "wb") as f:
            data = payload if self.local else payload.encode()
            f.write(data)
            if self.local:
                f.flush()
                os.fsync(f.fileno())
        self.replace(tmp, p)

    def read_json_tagged(self, p: str) -> tuple[str, str | None]:
        """Read a JSON file and an opaque swap tag for optimistic
        concurrency. Local and generic-fsspec files return tag None (the
        local manifest is protected by the writer flock instead); the
        boto s3 path returns the object's ETag, read in the same GET as
        the content."""
        if not self.local and hasattr(self.fs, "get_with_tag"):
            data, tag = self.fs.get_with_tag(p)
            return data.decode(), tag
        with self.open(p, "r" if self.local else "rb") as f:
            data = f.read()
        return (data if isinstance(data, str) else data.decode()), None

    def replace_json_if_match(
        self, p: str, payload: str, tag: str | None
    ) -> str | bool | None:
        """Optimistic-concurrency swap: replace ``p`` only if it still
        carries ``tag`` (``tag=None`` means "must not exist yet").
        Returns the NEW tag on success, False when the file moved
        underneath the caller (a concurrent writer swapped first), or
        None when this filesystem has no conditional primitive — the
        caller falls back to write_json_atomic (flock-protected locally,
        documented last-writer-wins on generic remotes)."""
        if self.local or not hasattr(self.fs, "put_if_match"):
            return None
        if tag is None:
            if not self.fs.put_if_absent(p, payload.encode()):
                return False
            # tag of the object we just created, for the NEXT swap; if a
            # racer replaces it in this window, our next If-Match simply
            # fails — conservative, never lost-update
            return self.fs.get_with_tag(p)[1]
        return self.fs.put_if_match(p, payload.encode(), tag)

    def write_json_if_absent(self, p: str, payload: str) -> bool | None:
        """Atomic create-if-absent: write ``payload`` to ``p`` only if no
        file exists there. Returns True (created), False (lost the race —
        a file already exists), or None (this filesystem has no atomic
        conditional create — caller falls back to last-writer-wins).

        Local: fsync a unique tmp then ``os.link`` it into place —
        link(2) fails with EEXIST atomically, and the data is durable
        before it becomes visible (no partial record can ever block the
        CAS). S3 (boto fallback): a conditional PUT (If-None-Match) —
        object PUTs are all-or-nothing, so no partial there either.
        Other fsspec filesystems: None (no portable primitive)."""
        if self.local:
            tmp = f"{p}.tmp.{os.getpid()}.{id(self)}"
            with open(tmp, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, p)
                return True
            except FileExistsError:
                return False
            finally:
                os.remove(tmp)
        if hasattr(self.fs, "put_if_absent"):
            return self.fs.put_if_absent(p, payload.encode())
        return None

    # -- Arrow interop ---------------------------------------------------
    def pa_filesystem(self):
        """pyarrow FileSystem for ray.data read/write on this fs."""
        if self.local:
            return None
        from pyarrow.fs import FSSpecHandler, PyFileSystem

        return PyFileSystem(FSSpecHandler(self.fs))

    def read_parquet(self, p: str, columns: list[str] | None = None):
        import pyarrow.parquet as pq

        if self.local:
            return pq.read_table(p, columns=columns)
        with self.open(p, "rb") as f:
            return pq.read_table(f, columns=columns)

    def read_parquet_schema(self, p: str):
        import pyarrow.parquet as pq

        if self.local:
            return pq.read_schema(p)
        with self.open(p, "rb") as f:
            return pq.read_schema(f)

    def write_parquet(self, table: Any, p: str, **kwargs: Any) -> None:
        import pyarrow.parquet as pq

        if self.local:
            pq.write_table(table, p, **kwargs)
        else:
            with self.open(p, "wb") as f:
                pq.write_table(table, f, **kwargs)
