"""jsonfilewriter: Dataset -> JSON / JSONL files.

Mirrors /root/reference/plugins/writer/jsonfilewriter/jsonfile_writer.go:
format json (array) or jsonl, truncate glob-delete prepare (:122-143),
fields named by column name (or column_i when unnamed). Deterministic
file names (deviation from the reference's time-based names, see
sinks.txtfile)."""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .txtfile import ChunkFileSink, prepare


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    """Task-parallel JSON/JSONL sink: one file per write task (see
    ChunkFileSink), each a self-contained JSON array or JSONL stream."""
    prepare(param)
    fmt = param.get("fileFormat", param.get("format", "jsonl"))
    as_array = fmt == "json"

    def render_payload(tables: list[pa.Table]) -> bytes:
        # single C-level serialization per task — no parse/re-dump round
        # trip through Python objects (the conversion cost flagged in r3)
        whole = tables[0] if len(tables) == 1 else pa.concat_tables(
            tables, promote_options="permissive")
        return whole.to_pandas().to_json(
            orient="records", date_format="iso", force_ascii=False,
            lines=not as_array).encode("utf-8")

    sink = ChunkFileSink(param["path"], param.get("fileName", "out"),
                         ".json" if as_array else ".jsonl", render_payload,
                         min_rows_per_file=int(param.get("minRowsPerFile")
                                               or 65536))
    ds.write_datasink(sink)
    return sink.result()
