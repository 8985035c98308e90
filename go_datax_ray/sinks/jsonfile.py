"""jsonfilewriter: Dataset -> JSON / JSONL files.

Mirrors /root/reference/plugins/writer/jsonfilewriter/jsonfile_writer.go:
format json (array) or jsonl, truncate glob-delete prepare (:122-143),
fields named by column name (or column_i when unnamed). Deterministic
file names (deviation from the reference's time-based names, see
sinks.txtfile)."""

from __future__ import annotations

from typing import Any

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
        # single C-level serialization — no parse/re-dump round trip
        # through Python objects (the conversion cost flagged in r3)
        payload = batch.to_json(orient="records", date_format="iso",
                                force_ascii=False,
                                lines=(fmt != "json"))
        records += len(batch)
        suffix = ".json" if fmt == "json" else ".jsonl"
        fpath = join(root, f"{file_name}_{bi:05d}{suffix}")
        data = payload.encode("utf-8")
        opener = open if fs is None else fs.open
        with opener(fpath, "wb") as f:
            f.write(data)
        byts += len(data)
        files.append(tag(fpath) if fs is not None else fpath)
    return {"files": files, "records": records, "bytes": byts}
