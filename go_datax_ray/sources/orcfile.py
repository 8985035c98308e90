"""orcfilereader: ORC columnar source.

The reference's hdfsreader enumerates TEXT/ORC/CSV file types but its
ORC path is `not yet implemented`
(/root/reference/plugins/reader/hdfsreader — SURVEY.md §2.3; hdfswriter
likewise TEXT-only, hdfs_writer.go:566-576). This implements the ORC
half for real via ``pyarrow.orc``: block-per-file reads (the same
split-by-file strategy as txtfilereader), column pruning pushed into the
ORC stripe reader, and the parquet reader's ``where`` triplet filter
applied per batch.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.dataset as pads

from .parquet import build_filter
from .txtfile import resolve_paths


def read(param: dict[str, Any], *, channel: int = 1):
    import ray.data as rd

    files = resolve_paths(param["path"])
    cols = param.get("column")
    if cols == ["*"]:
        cols = None
    where = param.get("where")
    schema = None
    if where and files:
        # Metadata-only probe of the first file so string filter values
        # bind with the bound column's real type (parquet._coerce).
        import pyarrow.orc as orc

        schema = orc.ORCFile(files[0]).schema
    expr = build_filter(where, schema)

    def read_files(batch: dict) -> pa.Table:
        import pyarrow.orc as orc

        tables = []
        for p in batch["path"]:
            if "://" in p:
                import fsspec

                f = orc.ORCFile(fsspec.open(p, "rb").open())
            else:
                f = orc.ORCFile(p)
            t = f.read(columns=list(cols) if cols else None)
            if expr is not None:
                t = pads.dataset(t).to_table(filter=expr)
            tables.append(t)
        return pa.concat_tables(tables)

    return rd.from_items(
        [{"path": p} for p in files],
        override_num_blocks=min(len(files), max(channel, 1)),
    ).map_batches(read_files, batch_format="numpy", batch_size=1)


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """orcfilewriter: distributed block-per-task ORC write with
    content-hash names (deterministic bytes -> retried tasks overwrite
    the same file, mirroring the lake's idempotent-write discipline)."""
    import hashlib
    import os

    path = param["path"]
    mode = param.get("writeMode", "append")
    if mode in ("truncate", "overwrite"):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    elif mode == "nonConflict" and os.path.isdir(path) and os.listdir(path):
        raise FileExistsError(f"writeMode=nonConflict but {path} is not empty")
    os.makedirs(path, exist_ok=True)
    file_name = param.get("fileName", "out")

    def write_block(t: pa.Table) -> pa.Table:
        import io

        import pyarrow.orc as orc

        buf = io.BytesIO()
        orc.write_table(t, buf)
        data = buf.getvalue()
        tag = hashlib.md5(data).hexdigest()[:16]
        fp = os.path.join(path, f"{file_name}-{tag}.orc")
        with open(fp, "wb") as f:
            f.write(data)
        return pa.table(
            {
                "file": pa.array([fp], pa.string()),
                "records": pa.array([t.num_rows], pa.int64()),
                "bytes": pa.array([len(data)], pa.int64()),
            }
        )

    stats = ds.map_batches(write_block, batch_format="pyarrow", batch_size=256 * 1024).take_all()
    return {
        "records": int(sum(r["records"] for r in stats)),
        "bytes": int(sum(r["bytes"] for r in stats)),
        "files": [r["file"] for r in stats],
    }
