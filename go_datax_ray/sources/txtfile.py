"""txtfilereader: CSV/TSV files -> Dataset, reference semantics.

Mirrors /root/reference/plugins/reader/txtfilereader/txtfile_reader.go:
glob/dir path resolution (:116-164), gzip/bzip2 decompression by
extension (:278-310), skipHeader, fieldDelimiter, nullFormat (default
"\\N"), per-column config {index,type,format,value} including constant
columns (value without index, :403-407) and wildcard "*" (all fields as
string, :83-91), lenient conversion (:434-486 — see stages.render).

Ray-Data shape: the resolved file list becomes a Dataset of paths; one
map_batches task per file parses it with pyarrow.csv (C++ vectorised)
and emits a typed Arrow table — the reference's file-count split
(:170-208) is exactly Ray's block-per-file parallelism.
"""

from __future__ import annotations

import bz2
import glob as _glob
import gzip
import io
import os
from typing import Any

import pyarrow as pa
import pyarrow.csv as pacsv

from ..stages.render import strings_to_typed


def _resolve_uri(p: str) -> list[str]:
    """fsspec resolution for URI paths (ftp://, file://, memory://,
    s3://, ...): the reference's ftpreader walks dirs and globs exactly
    like the local reader (ftp_reader.go:61-301) — fsspec's FTP
    filesystem (stdlib ftplib underneath) gives the same traversal, so
    one code path serves local disk and every remote scheme."""
    import fsspec
    from urllib.parse import urlsplit

    fs, root = fsspec.core.url_to_fs(p)
    proto = p.split("://", 1)[0]
    # connection-authority schemes carry host/port/credentials in the
    # netloc which fs-native paths (absolute, "/dir/file") don't retain;
    # re-attach it so the per-task fsspec.open() can reconnect. Bucket
    # schemes (s3://bucket/key) keep the bucket IN the path — untouched.
    netloc = urlsplit(p).netloc if proto in (
        "ftp", "sftp", "ssh", "hdfs", "webhdfs", "http", "https") else ""

    def tag(x: str) -> str:
        x = str(x)
        if netloc:
            return f"{proto}://{netloc}{x if x.startswith('/') else '/' + x}"
        return f"{proto}://{x}"

    if any(c in root for c in "*?["):
        return [tag(x) for x in sorted(fs.glob(root))]
    if fs.isdir(root):
        return [
            tag(x) for x in sorted(fs.ls(root, detail=False)) if fs.isfile(x)
        ]
    if fs.exists(root):
        return [tag(root)]
    return []


def resolve_paths(path: str | list[str]) -> list[str]:
    """Glob / dir / literal path resolution (txtfile_reader.go:116-164);
    URI paths route through fsspec (see _resolve_uri)."""
    paths = [path] if isinstance(path, str) else list(path)
    out: list[str] = []
    for p in paths:
        if "://" in p:
            out.extend(_resolve_uri(p))
        elif os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if os.path.isfile(os.path.join(p, f))
            )
        elif any(c in p for c in "*?["):
            out.extend(sorted(_glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no files match {path!r}")
    return out


def _open_decompressed(fpath: str, compress: str | None) -> bytes:
    comp = compress
    if comp is None:
        if fpath.endswith(".gz"):
            comp = "gzip"
        elif fpath.endswith(".bz2"):
            comp = "bzip2"
    if "://" in fpath:
        import fsspec

        with fsspec.open(fpath, "rb") as f:
            raw = f.read()
    else:
        with open(fpath, "rb") as f:
            raw = f.read()
    if comp == "gzip":
        return gzip.decompress(raw)
    if comp == "bzip2":
        return bz2.decompress(raw)
    return raw


def parse_csv_file(
    fpath: str,
    *,
    field_delimiter: str = ",",
    skip_header: bool = False,
    null_format: str = "\\N",
    columns: list[dict[str, Any]] | None = None,
    encoding: str = "UTF-8",
    compress: str | None = None,
) -> pa.Table:
    """Parse one file into a typed Arrow table per the column config."""
    data = _open_decompressed(fpath, compress)
    if encoding.upper() not in ("UTF-8", "UTF8", ""):
        data = data.decode(encoding).encode("utf-8")
    raw = pacsv.read_csv(
        io.BytesIO(data),
        read_options=pacsv.ReadOptions(autogenerate_column_names=True),
        parse_options=pacsv.ParseOptions(delimiter=field_delimiter),
        convert_options=pacsv.ConvertOptions(
            column_types={},  # we convert ourselves (lenient semantics)
            strings_can_be_null=False,
        ),
    )
    # force every parsed column back to string for the lenient converter
    raw = pa.table(
        {name: raw.column(name).cast(pa.string()) for name in raw.column_names}
    )
    if skip_header and raw.num_rows > 0:
        raw = raw.slice(1)

    n = raw.num_rows
    def _is_wild(c: Any) -> bool:
        return c == "*" or (isinstance(c, dict) and (c.get("index") == "*" or c.get("wildcard")))

    wildcard = not columns or (len(columns) == 1 and _is_wild(columns[0]))
    if wildcard:
        cols, names = [], []
        for i, name in enumerate(raw.column_names):
            cols.append(strings_to_typed(raw.column(name), "string", null_format=null_format))
            names.append(f"column_{i}")
        return pa.table(dict(zip(names, cols)))

    out_cols, out_names = [], []
    for ci, cfg in enumerate(columns):
        ctype = cfg.get("type", "string")
        fmt = cfg.get("format", "")
        name = cfg.get("name", f"column_{ci}")
        if "value" in cfg and "index" not in cfg:
            const = pa.array([str(cfg["value"])] * n, pa.string())
            out_cols.append(strings_to_typed(const, ctype, fmt, null_format))
        else:
            idx = int(cfg["index"])
            if idx < 0 or idx >= raw.num_columns:
                # out-of-range -> null column (reference :425-428)
                out_cols.append(
                    strings_to_typed(pa.array([None] * n, pa.string()), ctype, fmt, null_format)
                )
            else:
                out_cols.append(
                    strings_to_typed(raw.column(idx), ctype, fmt, null_format)
                )
        out_names.append(name)
    return pa.table(dict(zip(out_names, out_cols)))


def read(param: dict[str, Any], *, channel: int = 1):
    """Build the Dataset for a txtfilereader job parameter block."""
    import ray.data as rd

    files = resolve_paths(param["path"])
    kwargs = dict(
        field_delimiter=param.get("fieldDelimiter", ","),
        skip_header=bool(param.get("skipHeader", False)),
        null_format=param.get("nullFormat", "\\N"),
        columns=param.get("column"),
        encoding=param.get("encoding", "UTF-8"),
        compress=param.get("compress"),
    )

    def parse_batch(batch: dict) -> pa.Table:
        tables = [parse_csv_file(p, **kwargs) for p in batch["path"]]
        return pa.concat_tables(tables)

    return rd.from_items(
        [{"path": p} for p in files], override_num_blocks=min(len(files), max(channel, 1))
    ).map_batches(parse_batch, batch_format="numpy", batch_size=1)
