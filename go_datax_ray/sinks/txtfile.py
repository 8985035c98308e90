"""txtfilewriter: Dataset -> CSV/text files, reference semantics.

Mirrors /root/reference/plugins/writer/txtfilewriter/txtfile_writer.go:
writeMode truncate (delete fileName* first) / append / nonConflict
(fail if files exist) (:96-131); header row; gzip; nullFormat; dateFormat
(Go layout); hex bytes; shortest-round-trip doubles (:327-359).

One deliberate deviation: the reference names files
``fileName + "_taskId_" + unixnano + suffix`` (:238-249) which makes
reruns non-idempotent; we use deterministic ``{fileName}_{taskIdx}``
names so a rerun overwrites instead of accumulating (SURVEY.md §7.4).
After a successful write the sink also deletes pattern-matching files
from a prior run that this run didn't rewrite, so a rerun that lands
on FEWER write tasks can't leave a stale high-index tail behind.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
from typing import Any

import pyarrow as pa
from ray.data import Datasink

from ..config import go_layout_to_strftime
from ..stages.render import render_table


def _fs_for(path: str):
    """(fs, root, join, tag) — fsspec for URI paths (ftp://, file://,
    s3://: the reference's ftpwriter writes the same txtfile layout over
    FTP, ftp_writer.go), local os fast path otherwise."""
    if "://" in path:
        import fsspec
        import posixpath
        from urllib.parse import urlsplit

        fs, root = fsspec.core.url_to_fs(path)
        proto = path.split("://", 1)[0]
        # re-attach connection-authority netloc (host/port/credentials)
        # so reported file URLs stay openable (see sources.txtfile)
        netloc = urlsplit(path).netloc if proto in (
            "ftp", "sftp", "ssh", "hdfs", "webhdfs", "http", "https") else ""

        def tag(x):
            x = str(x)
            if netloc:
                return f"{proto}://{netloc}{x if x.startswith('/') else '/' + x}"
            return f"{proto}://{x}"

        return fs, root, posixpath.join, tag
    return None, path, os.path.join, lambda x: x


def prepare(param: dict[str, Any]) -> None:
    """writeMode handling at job prepare (txtfile_writer.go:96-131)."""
    path = param["path"]
    file_name = param.get("fileName", "out")
    mode = param.get("writeMode", "append")
    fs, root, join, _tag = _fs_for(path)
    if fs is None:
        os.makedirs(root, exist_ok=True)
        existing = _glob.glob(join(root, file_name + "*"))
        rm = os.remove
    else:
        fs.makedirs(root, exist_ok=True)
        existing = fs.glob(join(root, file_name + "*"))
        rm = fs.rm
    if mode == "truncate":
        for f in existing:
            rm(f)
    elif mode == "nonConflict" and existing:
        raise FileExistsError(
            f"writeMode=nonConflict but {len(existing)} files match {file_name}* in {path}"
        )


class ChunkFileSink(Datasink):
    """One output file per WRITE TASK — the reference's one-file-per-
    channel writer model (txtfile_writer.go:238-249) expressed as a Ray
    ``Datasink``: each write task renders its blocks and writes ONE
    deterministic task-indexed file (``{fileName}_{task_idx:05d}{suffix}``);
    the driver only aggregates tiny (file, records, bytes) stat returns.
    Data batches never funnel through the driver process (the r4
    driver-side ``iter_batches`` loop serialized the whole corpus through
    one process at scale).

    ``render_payload(tables) -> bytes`` produces the FULL file body for
    one task's blocks (header included if the format has one), so the
    golden rendering stays byte-identical per file.
    """

    def __init__(self, path: str, file_name: str, suffix: str,
                 render_payload, *, gzip_payload: bool = False,
                 min_rows_per_file: int = 65536):
        self._path = path
        self._file_name = file_name
        self._suffix = suffix
        self._render = render_payload
        self._gzip = gzip_payload
        self._min_rows = min_rows_per_file
        self.stats: list[dict[str, Any]] = []

    @property
    def min_rows_per_write(self) -> int:
        # coalesce tiny blocks so small jobs emit one well-sized file
        # per task instead of one file per micro-block
        return self._min_rows

    def write(self, blocks, ctx) -> dict[str, Any] | None:
        tables = [b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
                  for b in blocks]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return None
        data = self._render(tables)
        if self._gzip:
            # fixed mtime: identical content -> identical bytes on rerun
            data = gzip.compress(data, mtime=0)
        fs, root, join, tag = _fs_for(self._path)
        fpath = join(root, f"{self._file_name}_{ctx.task_idx:05d}{self._suffix}")
        opener = open if fs is None else fs.open
        with opener(fpath, "wb") as f:
            f.write(data)
        return {"file": tag(fpath) if fs is not None else fpath,
                "records": sum(t.num_rows for t in tables),
                "bytes": len(data)}

    def on_write_complete(self, write_result) -> None:
        self.stats = [r for r in write_result.write_returns if r]
        self._cleanup_stale()

    def _cleanup_stale(self) -> None:
        """Delete task-indexed files from a PRIOR run that this run did
        not (re)write. Without this, a rerun that lands on fewer write
        tasks (smaller cluster, different block structure) would
        overwrite indices 0..k-1 but leave stale k..n-1 behind — a
        reader globbing ``fileName*`` would mix fresh and stale rows.
        Only files matching this sink's deterministic
        ``{fileName}_{NNNNN}{suffix}`` pattern are touched; name-only
        metadata, never data."""
        import re

        fs, root, join, tag = _fs_for(self._path)
        pat = re.compile(
            re.escape(self._file_name) + r"_\d{5}"
            + re.escape(self._suffix) + r"$")
        written = {r["file"] for r in self.stats}
        if fs is None:
            candidates = _glob.glob(join(root, self._file_name + "_*"))
            rm = os.remove
        else:
            candidates = fs.glob(join(root, self._file_name + "_*"))
            rm = fs.rm
        for f in candidates:
            name = (tag(f) if fs is not None else f)
            if pat.search(os.path.basename(str(f))) and name not in written:
                rm(f)

    def result(self) -> dict[str, Any]:
        return {"files": sorted(r["file"] for r in self.stats),
                "records": int(sum(r["records"] for r in self.stats)),
                "bytes": int(sum(r["bytes"] for r in self.stats))}


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """Consume the Dataset into text files; returns {files, records}.

    Task-parallel: N channels/blocks emit N files (header rendered into
    EVERY file, as each reference writer task renders its own — a
    reader with skipHeader drops it per file)."""
    prepare(param)
    delim = param.get("fieldDelimiter", ",")
    null_format = param.get("nullFormat", "\\N")
    date_format = param.get("dateFormat", "")
    strf = go_layout_to_strftime(date_format) if date_format else None
    header = param.get("header")
    compress = param.get("compress")
    encoding = param.get("encoding", "UTF-8").lower()
    suffix = ".csv" if param.get("fileFormat", "csv") == "csv" else ".txt"
    if compress == "gzip":
        suffix += ".gz"

    def render_payload(tables: list[pa.Table]) -> bytes:
        parts: list[str] = []
        if header:
            parts.append(delim.join(header))
        for t in tables:
            parts.extend(render_table(
                t, profile="txtfile", null_format=null_format,
                date_format=strf, delimiter=delim,
            ))
        return ("\n".join(parts) + ("\n" if parts else "")).encode(encoding)

    sink = ChunkFileSink(param["path"], param.get("fileName", "out"),
                         suffix, render_payload,
                         gzip_payload=(compress == "gzip"),
                         min_rows_per_file=int(param.get("minRowsPerFile")
                                               or 65536))
    ds.write_datasink(sink)
    return sink.result()
