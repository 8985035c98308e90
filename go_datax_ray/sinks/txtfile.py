"""txtfilewriter: Dataset -> CSV/text files, reference semantics.

Mirrors /root/reference/plugins/writer/txtfilewriter/txtfile_writer.go:
writeMode truncate (delete fileName* first) / append / nonConflict
(fail if files exist) (:96-131); header row; gzip; nullFormat; dateFormat
(Go layout); hex bytes; shortest-round-trip doubles (:327-359).

One deliberate deviation: the reference names files
``fileName + "_taskId_" + unixnano + suffix`` (:238-249) which makes
reruns non-idempotent; we use deterministic ``{fileName}_{blockIdx}``
names so a rerun overwrites instead of accumulating (SURVEY.md §7.4).
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
from typing import Any

import pyarrow as pa

from ..config import go_layout_to_strftime
from ..stages.render import render_table


def _fs_for(path: str):
    """(fs, root, join, tag) — fsspec for URI paths (ftp://, file://,
    s3://: the reference's ftpwriter writes the same txtfile layout over
    FTP, ftp_writer.go), local os fast path otherwise."""
    if "://" in path:
        import fsspec
        import posixpath

        fs, root = fsspec.core.url_to_fs(path)
        proto = path.split("://", 1)[0]
        return fs, root, posixpath.join, lambda x: f"{proto}://{x}"
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


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """Consume the Dataset into text files; returns {files, records}."""
    prepare(param)
    path = param["path"]
    file_name = param.get("fileName", "out")
    delim = param.get("fieldDelimiter", ",")
    null_format = param.get("nullFormat", "\\N")
    date_format = param.get("dateFormat", "")
    strf = go_layout_to_strftime(date_format) if date_format else None
    header = param.get("header")
    compress = param.get("compress")
    suffix = ".csv" if param.get("fileFormat", "csv") == "csv" else ".txt"
    if compress == "gzip":
        suffix += ".gz"

    fs, root, join, tag = _fs_for(path)
    files: list[str] = []
    records = 0
    byts = 0
    # streaming consumption: one output file per iterated batch-block
    for bi, batch in enumerate(ds.iter_batches(batch_size=65536, batch_format="pyarrow")):
        lines = render_table(
            batch, profile="txtfile", null_format=null_format,
            date_format=strf, delimiter=delim,
        )
        records += batch.num_rows
        fpath = join(root, f"{file_name}_{bi:05d}{suffix}")
        payload = ""
        if header and bi == 0:
            payload += delim.join(header) + "\n"
        payload += "\n".join(lines) + ("\n" if lines else "")
        data = payload.encode(param.get("encoding", "UTF-8").lower().replace("utf-8", "utf-8"))
        if compress == "gzip":
            data = gzip.compress(data)
        opener = open if fs is None else fs.open
        with opener(fpath, "wb") as f:
            f.write(data)
        byts += len(data)
        files.append(tag(fpath) if fs is not None else fpath)
    return {"files": files, "records": records, "bytes": byts}
