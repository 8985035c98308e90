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


def _apply_mappings(ds, colspec: list[dict[str, Any]], lenient: bool):
    """ES index-mapping analogue (elasticsearch_writer.go:404-500): the
    writer's declared column list becomes an enforced output schema —
    each batch is cast through the §1.1 casting matrix and projected to
    exactly the declared columns, in order."""
    from ..stages.cast import cast_column

    names = [c["name"] for c in colspec]
    types = {c["name"]: c.get("type", "string") for c in colspec}

    def conform_batch(t: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in t.column_names:
                cols.append(cast_column(t.column(n), types[n], lenient=lenient))
            else:
                from ..schema import REF_TYPE_MAP

                cols.append(pa.nulls(t.num_rows, REF_TYPE_MAP[types[n]]))
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(conform_batch, batch_format="pyarrow", zero_copy_batch=True)


def write(ds, param: dict[str, Any]) -> dict[str, Any]:
    path = param["path"]
    mode = param.get("writeMode", "append")
    if mode == "truncate" or mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    elif mode == "nonConflict" and os.path.isdir(path) and os.listdir(path):
        raise FileExistsError(f"writeMode=nonConflict but {path} is not empty")
    colspec = param.get("column")
    if colspec and colspec != ["*"] and isinstance(colspec[0], dict):
        ds = _apply_mappings(ds, colspec, bool(param.get("lenientCast", False)))
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
    # ES routing analogue (elasticsearch_writer.go:1361-1378): placement
    # follows hash(routing column) instead of the key. Same contract as
    # ES: a key's routing value must be stable across its versions, or
    # the versions land in different partitions and won't merge.
    routing = param.get("routing")
    man = Manifest.load(param["path"])
    base_lsn = man.watermark_lsn + 1

    def to_events(batch: pa.Table, start: int) -> pa.Table:
        n = batch.num_rows
        lsn = pa.array(range(start, start + n), pa.int64())
        out = batch
        if key != "url":
            out = out.append_column("url", pc.cast(out.column(key), pa.string()))
        if routing:
            out = out.append_column("_routing", pc.cast(out.column(routing), pa.string()))
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
    # loads. The maxDriverRows bound ENFORCES that scope: an oversize
    # batch-upsert fails loudly instead of silently materialising the
    # corpus on the driver. Large-scale upserts should arrive as real CDC
    # events with source lsns (the flagship replay path, fully streaming).
    n_rows = ds.count()
    max_rows = int(param.get("maxDriverRows", 1_000_000))
    if n_rows > max_rows:
        raise ValueError(
            f"writeMode=upsert materialises the batch on the driver to "
            f"assign dense lsns; {n_rows} rows exceeds maxDriverRows="
            f"{max_rows}. Ship large loads as CDC events with source lsns "
            "through pipelines.cdc_replay.replay (fully streaming), or "
            "raise maxDriverRows explicitly if the driver can hold them."
        )
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")]
    ) if n_rows else None
    if tbl is None or tbl.num_rows == 0:
        return {"records": 0, "path": param["path"]}
    events = to_events(tbl, base_lsn)
    import ray.data as rd

    res = replay(
        DatasetEventSource(rd.from_arrow(events), base_lsn, base_lsn + tbl.num_rows),
        ReplayConfig(
            lake_dir=param["path"],
            num_partitions=int(param.get("numPartitions", 16)),
            key="_routing" if routing else "url",
        ),
    )
    return {"records": res.events, "path": param["path"]}
