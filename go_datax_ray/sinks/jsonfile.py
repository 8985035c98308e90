"""jsonfilewriter: Dataset -> JSON / JSONL files.

Mirrors /root/reference/plugins/writer/jsonfilewriter/jsonfile_writer.go:
format json (array) or jsonl, truncate glob-delete prepare (:122-143),
fields named by column name (or column_i when unnamed). Deterministic
file names (deviation from the reference's time-based names, see
sinks.txtfile)."""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd

from .txtfile import _fs_for, prepare


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    prepare(param)
    path = param["path"]
    file_name = param.get("fileName", "out")
    fmt = param.get("fileFormat", param.get("format", "jsonl"))
    fs, root, join, tag = _fs_for(path)
    files: list[str] = []
    records = 0
    byts = 0
    for bi, batch in enumerate(ds.iter_batches(batch_size=65536, batch_format="pandas")):
        rows = json.loads(batch.to_json(orient="records", date_format="iso"))
        records += len(batch)
        suffix = ".json" if fmt == "json" else ".jsonl"
        fpath = join(root, f"{file_name}_{bi:05d}{suffix}")
        if fmt == "json":
            payload = json.dumps(rows, ensure_ascii=False)
        else:
            payload = "".join(json.dumps(r, ensure_ascii=False) + "\n" for r in rows)
        data = payload.encode("utf-8")
        opener = open if fs is None else fs.open
        with opener(fpath, "wb") as f:
            f.write(data)
        byts += len(data)
        files.append(tag(fpath) if fs is not None else fpath)
    return {"files": files, "records": records, "bytes": byts}
