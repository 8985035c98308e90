"""parquetwriter: plain columnar sink + the upsert lake sink.

``write`` (mode=append/overwrite) is the Ray-native collapse of the 8
reference batch-INSERT RDBMS writers; ``write_upsert`` is their
PK-conflict path (PG ON CONFLICT DO UPDATE / MySQL ON DUPLICATE KEY,
/root/reference/common/database/rdbms/writer/common.go:518-616)
routed through the exactly-once CDC lake (sinks.lake + state.manifest):
``writeMode=upsert`` with a key column set behaves like the reference's
conflict-duplicate test configs — loading the same batch twice is a
no-op (idempotent replay)."""

from __future__ import annotations

import os
import shutil
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    path = param["path"]
    mode = param.get("writeMode", "append")
    if mode == "truncate" or mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    elif mode == "nonConflict" and os.path.isdir(path) and os.listdir(path):
        raise FileExistsError(f"writeMode=nonConflict but {path} is not empty")
    if mode == "upsert":
        return write_upsert(ds, param)
    n = ds.count()
    ds.write_parquet(path)
    return {"records": n, "path": path}


def write_upsert(ds, param: dict[str, Any]) -> dict[str, Any]:
    """Keyed upsert through the CDC lake machinery: rows become I events
    keyed by ``primaryKey`` ordered by a ``version`` column (or arrival
    order), LWW-merged into the lake at ``path``."""
    from ..pipelines.cdc_replay import DatasetEventSource, ReplayConfig, replay
    from ..state.manifest import Manifest

    key = param.get("primaryKey", "url")
    version_col = param.get("versionColumn")
    man = Manifest.load(param["path"])
    base_lsn = man.watermark_lsn + 1

    def to_events(batch: pa.Table, start: int) -> pa.Table:
        n = batch.num_rows
        lsn = pa.array(range(start, start + n), pa.int64())
        out = batch
        if key != "url":
            out = out.append_column("url", pc.cast(out.column(key), pa.string()))
        if version_col:
            out = out.append_column("warc_ts", out.column(version_col).cast(pa.timestamp("us")))
        elif "warc_ts" not in out.column_names:
            out = out.append_column(
                "warc_ts", pa.array([0] * n, pa.timestamp("us"))
            )
        out = out.append_column("lsn", lsn)
        out = out.append_column("src_offset", lsn)
        out = out.append_column("op", pa.array(["U"] * n, pa.string()))
        return out

    # NOTE(scale): batch-upsert without explicit versions needs a global
    # arrival order, so this convenience path materialises the batch to
    # assign dense lsns — intended for the reference's conflict-test-sized
    # loads. Large-scale upserts should arrive as real CDC events with
    # source lsns (the flagship replay path, fully streaming).
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    ) if ds.count() else None
    if tbl is None or tbl.num_rows == 0:
        return {"records": 0, "path": param["path"]}
    events = to_events(tbl, base_lsn)
    import ray.data as rd

    res = replay(
        DatasetEventSource(rd.from_arrow(events), base_lsn, base_lsn + tbl.num_rows),
        ReplayConfig(
            lake_dir=param["path"],
            num_partitions=int(param.get("numPartitions", 16)),
        ),
    )
    return {"records": res.events, "path": param["path"]}
