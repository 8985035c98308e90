"""streamwriter: console/debug sink with the reference's TSV rendering.

Mirrors /root/reference/plugins/writer/streamwriter/stream_writer.go:
205-255 — "%.6f" doubles, "2006-01-02 15:04:05" dates, hex bytes,
null -> "". ``print=False`` collects the rendered lines instead (golden-
output parity checks)."""

from __future__ import annotations

from typing import Any

from ..stages.render import render_table


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    delim = param.get("fieldDelimiter", "\t")
    do_print = param.get("print", True)
    limit = param.get("printLimit")  # cap console spam; None = all
    lines: list[str] = []
    records = 0
    byts = 0
    for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        rendered = render_table(batch, profile="stream", delimiter=delim)
        records += batch.num_rows
        byts += sum(len(ln.encode()) for ln in rendered)
        lines.extend(rendered)
        if do_print:
            for ln in rendered if limit is None else rendered[: max(0, limit - (records - batch.num_rows))]:
                print(ln)
    return {"records": records, "lines": lines, "bytes": byts}
