"""Merge-apply upsert into the partitioned Parquet lake.

Semantics are the reference's RDBMS writer upsert — batch INSERT with
PK conflict resolution, PG ``ON CONFLICT (pk) DO UPDATE`` / MySQL
``ON DUPLICATE KEY UPDATE`` (/root/reference/common/database/rdbms/
writer/common.go:518-616) — plus the elasticsearchwriter's per-event
action model insert/update/delete keyed by _id
(/root/reference/plugins/writer/elasticsearchwriter/
elasticsearch_writer.go:33-41,1288-1359), re-expressed as a
copy-on-write partition merge:

    read committed partition file (if any)
    -> additive-evolve schemas -> concat with this epoch's LWW winners
    -> LWW again (old rows carry their own (warc_ts, lsn))
    -> sort by url (byte-deterministic file content)
    -> write the content-addressed final path part-{pid}/...-epoch-{e}

Visibility is decided by the manifest commit (state.manifest): the
written epoch file is invisible garbage until the manifest points at it,
so retried tasks (deterministic bytes, same path) are harmless and NO
rename is needed on data files — the data plane is S3-compatible.

The merge runs inside ``groupby("part_id").map_groups`` after the
key-hash shuffle: each invocation sees exactly one partition's events.
At 100 TB scale the per-partition rewrite amortises because P is sized
so a partition is a few GB (copy-on-write upsert, Hudi/Delta-style);
the hot path stays vectorised Arrow end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import conform, evolve
from ..stages.lww import lww_indices, lww_sorted, lww_table
from ..state.fs import LakeFS
from ..state.manifest import final_path

# columns that belong to the engine, not the payload
_ENGINE_COLS = ("part_id", "salt", "_n_ev")

_TYPE_TO_STR = {
    pa.int64(): "int64",
    pa.int32(): "int32",
    pa.float64(): "float64",
    pa.string(): "string",
    pa.large_string(): "large_string",
    pa.binary(): "binary",
    pa.large_binary(): "large_binary",
    pa.bool_(): "bool",
    pa.timestamp("us"): "timestamp_us",
}
_STR_TO_TYPE = {v: k for k, v in _TYPE_TO_STR.items()}


def schema_to_json(schema: pa.Schema) -> str:
    return json.dumps([[f.name, _TYPE_TO_STR[f.type]] for f in schema])


def schema_from_json(s: str) -> pa.Schema:
    return pa.schema([pa.field(n, _STR_TO_TYPE[t]) for n, t in json.loads(s)])


def _strip_engine_cols(t: pa.Table) -> pa.Table:
    drop = [c for c in _ENGINE_COLS if c in t.column_names and c != "part_id"]
    return t.drop_columns(drop) if drop else t


def _fill_text(t: pa.Table) -> pa.Table:
    """Derive text = extract_text(html) for rows that lack it.

    Called on the post-LWW winner set, NOT the raw event stream: derived
    columns are computed once per surviving key instead of once per event
    (10x fewer extractions at a 10:1 update ratio), and the shuffle/delta
    exchange never carries the derived payload. Committed rows keep their
    existing bytes untouched (byte-identity invariant)."""
    from ..synth import extract_text_batch

    html = t.column("html")
    if "text" not in t.column_names:
        return t.append_column(pa.field("text", pa.large_string()), extract_text_batch(html))
    text = t.column("text")
    need = pa.compute.and_(pa.compute.is_null(text), pa.compute.is_valid(html))
    if not pa.compute.any(need).as_py():
        return t
    idx = np.flatnonzero(need.combine_chunks().to_numpy(zero_copy_only=False))
    vals = extract_text_batch(html.take(pa.array(idx))).to_pylist()
    full = text.to_pylist()
    for i, v in zip(idx, vals):
        full[i] = v
    return t.set_column(
        t.column_names.index("text"), "text", pa.array(full, text.type)
    )


def make_partition_merger(
    lake_dir: str,
    epoch: int,
    committed: dict[int, str],
    metrics: Any | None = None,
    extract_missing_text: bool = False,
    view_specs: tuple = (),
) -> Callable[[pa.Table], pa.Table]:
    """Build the map_groups merge fn for one epoch.

    ``committed`` is the driver's manifest snapshot (pid -> absolute file
    path) — a small dict captured in the task closure, shipped once per
    task (broadcast), never per batch.
    """

    def merge(group: pa.Table) -> pa.Table:
        fsh = LakeFS(lake_dir)  # per-task; fsspec caches filesystems
        pid = int(group.column("part_id")[0].as_py())
        # events = RAW event count: the combiner rolls superseded rows'
        # counts into winners (_n_ev), so this is deterministic per
        # (epoch, partition) regardless of batch structure
        if "_n_ev" in group.column_names:
            events = int(pa.compute.sum(group.column("_n_ev")).as_py() or 0)
        else:
            events = group.num_rows
        new = _strip_engine_cols(group)
        old_path = committed.get(pid)
        old = None
        if old_path is not None and fsh.exists(old_path):
            old = fsh.read_parquet(old_path)
            target = evolve(old.schema, new.schema)
            merged = lww_sorted(
                pa.concat_tables([conform(old, target), conform(new, target)])
            )
        else:
            merged = lww_sorted(new)
        if extract_missing_text:
            merged = _fill_text(merged)
        if view_specs:
            # incremental view maintenance: old & merged are already in
            # memory here — two local aggregates, no extra lake IO
            from .views import write_view_deltas

            write_view_deltas(fsh, lake_dir, view_specs, old, merged, epoch, pid)
        out = final_path(lake_dir, pid, epoch)
        fsh.makedirs(out.rsplit("/", 1)[0] if not fsh.local else os.path.dirname(out))
        fsh.write_parquet(merged, out, compression="zstd", compression_level=1,
                          row_group_size=64 * 1024)
        if metrics is not None:
            metrics.inc.remote(f"partition/{pid}/events", events)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "events": pa.array([events], pa.int64()),
                "max_lsn": pa.array(
                    [int(pa.compute.max(group.column("lsn")).as_py())], pa.int64()
                ),
                "schema_json": pa.array([schema_to_json(merged.schema)], pa.string()),
            }
        )

    return merge


# Delta-merge LWW assembly strategy: "skinny" (winner selection over
# zero-copy key-column views, per-source winner takes — round-5 default)
# or "concat" (round-4 full-payload conform+concat+take, kept for A/B).
DELTA_MERGE_MODE = "skinny"


def make_delta_merger(
    lake_dir: str,
    epoch: int,
    committed: dict[int, str],
    delta_dir: str,
    metrics: Any | None = None,
    extract_missing_text: bool = False,
    view_specs: tuple = (),
) -> Callable[[dict], pa.Table]:
    """Merge fn for the delta exchange: input batches carry partition ids;
    each pid's delta files (written by the partition-pruned
    ``write_parquet(partition_cols=["part_id"])`` stage) are read, LWW'd
    against the committed partition file, and written to the epoch's
    content-addressed final path (invisible until the manifest commit). Duplicate delta rows from retried upstream write tasks are
    harmless — LWW collapses them (idempotent reduction)."""
    import glob as _glob

    merge_mode = DELTA_MERGE_MODE  # captured at epoch start (A/B knob)

    def _finish_pid(fsh, pid: int, new: pa.Table, old, events: int) -> pa.Table:
        """Shared merge tail: text fill, view deltas, final write, entry."""
        if extract_missing_text:
            new = _fill_text(new)
        if view_specs:
            from .views import write_view_deltas

            write_view_deltas(fsh, lake_dir, view_specs, old, new, epoch, pid)
        outp = final_path(lake_dir, pid, epoch)
        fsh.makedirs(outp.rsplit("/", 1)[0] if not fsh.local else os.path.dirname(outp))
        fsh.write_parquet(new, outp, compression="zstd", compression_level=1,
                          row_group_size=64 * 1024)
        if metrics is not None:
            metrics.inc.remote(f"partition/{pid}/events", events)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "rows": pa.array([new.num_rows], pa.int64()),
                "events": pa.array([events], pa.int64()),
                "max_lsn": pa.array(
                    [int(pa.compute.max(new.column("lsn")).as_py())], pa.int64()
                ),
                "schema_json": pa.array([schema_to_json(new.schema)], pa.string()),
            }
        )

    def merge_pids(batch: dict) -> pa.Table:
        from ..stages.lww import LWW_ORDER

        fsh = LakeFS(lake_dir)
        out: list[pa.Table] = []
        for pid in batch["pid"]:
            pid = int(pid)
            pat = (os.path.join if fsh.local else __import__("posixpath").join)(
                delta_dir, f"part_id={pid}", "*.parquet"
            )
            files = sorted(_glob.glob(pat) if fsh.local else fsh.fs.glob(pat))
            if not files:
                continue
            if merge_mode == "concat":
                # round-4 shape kept for A/B: conform+concat every full
                # delta row, then one big LWW take
                parts = [fsh.read_parquet(f) for f in files]
                target = parts[0].schema
                for p in parts[1:]:
                    target = evolve(target, p.schema)
                new = pa.concat_tables([conform(p, target) for p in parts])
                if "_n_ev" in new.column_names:
                    events = int(pa.compute.sum(new.column("_n_ev")).as_py() or 0)
                    new = new.drop_columns(["_n_ev"])
                else:
                    events = new.num_rows
                new = new.append_column(
                    "part_id", pa.array(np.full(new.num_rows, pid), pa.int64())
                )
                old_path = committed.get(pid)
                old = None
                if old_path is not None and fsh.exists(old_path):
                    old = fsh.read_parquet(old_path)
                    t2 = evolve(old.schema, new.schema)
                    new = lww_sorted(
                        pa.concat_tables([conform(old, t2), conform(new, t2)]))
                else:
                    new = lww_sorted(new)
                out.append(_finish_pid(fsh, pid, new, old, events))
                continue
            # SKINNY-FIRST merge (round 5, 8->32 bandwidth work): each
            # source is read ONCE, but winner selection runs over only
            # its zero-copy (url, warc_ts, lsn) column views — the html
            # payload of superseded rows is never concatenated or moved.
            # The former shape conformed+concatenated every delta row's
            # full payload before one big LWW take (~10x the winner
            # bytes of memcpy per epoch at the bench's 10:1 update
            # ratio); here each source contributes exactly its winner
            # rows via one small take.
            old_path = committed.get(pid)
            old = None
            if old_path is not None and fsh.exists(old_path):
                old = fsh.read_parquet(old_path)  # small: committed winners
            parts = [fsh.read_parquet(f) for f in files]
            target = parts[0].schema
            for p in parts[1:]:
                target = evolve(target, p.schema)
            events = 0
            for p in parts:
                events += (int(pa.compute.sum(p.column("_n_ev")).as_py() or 0)
                           if "_n_ev" in p.column_names else p.num_rows)
            # concat order mirrors the former full-table path (old first,
            # then delta files in sorted order) so stable-sort
            # tie-breaking is bit-identical
            skinny_cols = [k for k, _ in LWW_ORDER]
            sources = ([old] if old is not None else []) + parts
            skinny_schema = sources[0].select(["url", *skinny_cols]).schema
            allk = pa.concat_tables(
                [conform(s.select(["url", *skinny_cols]), skinny_schema)
                 for s in sources])  # zero-copy column views, tiny concat
            # the ONE winner-selection kernel (stages.lww) — keeping a
            # second inline copy here risked the merge silently
            # desynchronizing from the combiner if tie-breaking changes
            winners = np.sort(lww_indices(allk))
            # map global winner positions back to (source, local row)
            lens = np.array([s.num_rows for s in sources], dtype=np.int64)
            offs = np.concatenate([[0], np.cumsum(lens)])
            new_schema = pa.schema(
                [f for f in target if f.name != "_n_ev"]
            ).append(pa.field("part_id", pa.int64()))
            t2 = evolve(old.schema, new_schema) if old is not None else new_schema
            chunks: list[pa.Table] = []
            src_of = np.searchsorted(offs, winners, side="right") - 1
            pid_field = pa.field("part_id", pa.int64())
            for si in range(len(sources)):
                rows = winners[src_of == si] - offs[si]
                if rows.size == 0:
                    continue
                w = sources[si].take(pa.array(rows))
                if not (old is not None and si == 0):
                    if "_n_ev" in w.column_names:
                        w = w.drop_columns(["_n_ev"])
                    w = w.append_column(
                        pid_field, pa.array(np.full(w.num_rows, pid), pa.int64())
                    )
                chunks.append(conform(w, t2))
            new = pa.concat_tables(chunks)
            # winners sorted by key, as lww_sorted emitted
            new = new.take(pa.compute.sort_indices(new.column("url")))
            out.append(_finish_pid(fsh, pid, new, old, events))
        if not out:
            return pa.table(
                {
                    "pid": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                    "events": pa.array([], pa.int64()),
                    "max_lsn": pa.array([], pa.int64()),
                    "schema_json": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(out)

    return merge_pids


def read_lake(lake_dir: str, *, columns: list[str] | None = None, final_state: bool = True,
              asof_epoch: int | None = None, keys: list | None = None,
              where: list[list] | None = None):
    """Read the committed lake as a Dataset (manifest-listed files only —
    uncommitted tmp/garbage files are invisible). ``final_state`` filters
    delete tombstones, yielding the upsert-resolved table state.
    ``asof_epoch`` reads the state as of an earlier committed epoch
    (requires a lake written with retain_history=True).

    ``keys``: point-lookup values of the lake's key column. The lake is
    hash-placed (part_id = hash(key) % P, recorded in the manifest), so
    the read PRUNES to the partitions those keys map to — k lookups
    touch at most k of P files instead of scanning the lake (the
    data-skipping read; at 100 TB / 64k partitions a key lookup is one
    file). An exact is_in filter then drops same-partition cohabitants.

    ``where``: ``[["col", op, value], ...]`` conjunction pushed into the
    parquet scan (row-group statistics pruning + scan-level filtering —
    the same triplet grammar as the parquet reader plugin). Applied
    BEFORE the tombstone filter, so a filtered read still resolves
    final state correctly for the rows it returns."""
    import ray.data as rd

    from ..state.manifest import Manifest

    man = Manifest.load(lake_dir)
    files = man.files_asof(asof_epoch) if asof_epoch is not None else man.committed_files()
    key_col = man.key
    if keys is not None and key_col is None:
        raise ValueError(
            "read_lake(keys=...): this lake's manifest predates key "
            "metadata (key column unknown); re-commit once to backfill, "
            "or filter with where=[[col, '=', v]] instead"
        )
    if keys is not None and asof_epoch is None:
        files = man.files_for_keys(keys)
    if not files:
        schema = schema_from_json(man.schema_json) if man.schema_json else pa.schema([])
        return rd.from_arrow(schema.empty_table())
    read_cols = columns
    drop_op = False
    if final_state and columns is not None and "op" not in columns:
        read_cols = list(columns) + ["op"]  # needed for the tombstone filter
        drop_op = True
    if keys is not None and read_cols is not None and key_col not in read_cols:
        read_cols = list(read_cols) + [key_col]
    pafs = man.fsh.pa_filesystem()
    kw = {}
    if pafs is not None:
        kw["filesystem"] = pafs
    if where:
        from ..sources.parquet import build_filter

        schema = schema_from_json(man.schema_json) if man.schema_json else None
        kw["filter"] = build_filter(where, schema)
    ds = rd.read_parquet(files, columns=read_cols, **kw)
    if keys is not None:
        key_set = pa.array(list(keys))

        def _lookup(t: pa.Table) -> pa.Table:
            # cast the value set to the key column's type: files_for_keys
            # hashes str(k), but is_in is type-strict — int keys against a
            # string key column would raise after pruning correctly (ADVICE r3)
            vs = key_set
            if vs.type != t.column(key_col).type:
                vs = vs.cast(t.column(key_col).type)
            t = t.filter(pa.compute.is_in(t.column(key_col), value_set=vs))
            if columns is not None and key_col not in columns:
                t = t.drop_columns([key_col])
            return t

        ds = ds.map_batches(_lookup, batch_format="pyarrow", zero_copy_batch=True)
    if final_state:
        def _final(t: pa.Table) -> pa.Table:
            t = t.filter(pa.compute.not_equal(t.column("op"), pa.scalar("D")))
            return t.drop_columns(["op"]) if drop_op else t

        ds = ds.map_batches(_final, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def compact(lake_dir: str, *, drop_tombstones_below_lsn: int | None = None,
            retain_history: bool = False) -> dict[str, int]:
    """Compaction: rewrite partitions dropping delete tombstones with
    lsn < the horizon (default: the committed watermark).

    SAFETY CONTRACT (documented per SURVEY.md §7.4 tombstone/resume
    interaction): dropping a tombstone is only safe when no future event
    for that key can carry a LOWER (warc_ts, lsn) than the tombstone —
    i.e. the source replays only offsets > watermark AND event
    timestamps are monotone per key. Callers that cannot guarantee
    per-key ts monotonicity should pass a horizon older than their
    maximum expected timestamp disorder. Runs through the same
    tmp -> commit_epoch path, so it is atomic and resumable."""
    import pyarrow.compute as pc

    from ..state.manifest import Manifest

    man = Manifest.load(lake_dir)
    horizon = drop_tombstones_below_lsn if drop_tombstones_below_lsn is not None else man.watermark_lsn
    epoch = man.epoch + 1
    entries = []
    dropped = 0
    for pid_s, ent in man.partitions.items():
        pid = int(pid_s)
        t = man.fsh.read_parquet(man.fsh.join(ent["file"]))
        is_dead_tomb = pc.and_(
            pc.equal(t.column("op"), pa.scalar("D")),
            pc.less(t.column("lsn"), pa.scalar(horizon, pa.int64())),
        )
        keep = pc.invert(pc.fill_null(is_dead_tomb, False))
        out = t.filter(keep)
        dropped += t.num_rows - out.num_rows
        outp = final_path(lake_dir, pid, epoch)
        man.fsh.makedirs(outp.rsplit("/", 1)[0] if not man.fsh.local else os.path.dirname(outp))
        man.fsh.write_parquet(out, outp, compression="zstd", compression_level=1,
                              row_group_size=64 * 1024)
        entries.append(
            {
                "pid": pid,
                "rows": out.num_rows,
                "events": 0,
                "max_lsn": ent["max_lsn"],
            }
        )
    if entries:
        man.commit_epoch(
            epoch,
            lsn_lo=man.watermark_lsn,
            lsn_hi=man.watermark_lsn,
            entries=entries,
            schema_json=man.schema_json or "",
            wall_s=0.0,
            retain_history=retain_history,  # keep time-travel across compaction
        )
    return {"dropped_tombstones": dropped, "epoch": epoch}


def delete_where(lake_dir: str, where: list[list], *,
                 retain_history: bool = False) -> dict[str, int]:
    """ES deleteByConditions analogue (elasticsearch_writer.go:1257-1286):
    flip every committed row matching the ``where`` conjunction
    ([["col", op, value], ...], the parquet-reader filter grammar) to a
    delete tombstone, in one atomically-committed epoch. Rows keep their
    own (warc_ts, lsn), so the delete is exactly as durable as the state
    it deleted — a later CDC event with a newer version key still wins
    (the same semantics as deleteBy-then-index in the reference)."""
    import pyarrow.compute as pc

    from ..sources.parquet import build_filter
    from ..state.manifest import Manifest

    if not where:
        raise ValueError("delete_where needs at least one condition")
    man = Manifest.load(lake_dir)
    epoch = man.epoch + 1
    entries = []
    flipped = 0
    expr = None
    for pid_s, ent in man.partitions.items():
        pid = int(pid_s)
        t = man.fsh.read_parquet(man.fsh.join(ent["file"]))
        if expr is None:
            # Bind string values against the lake's actual column types
            # (parquet._coerce) — built once, from the first partition's
            # schema (all partitions share the manifest schema).
            expr = build_filter(where, t.schema)
        import pyarrow.dataset as pads

        # evaluate the expression as a boolean mask over the partition
        mask_tbl = pads.dataset(t).scanner(columns={"_m": expr}).to_table()
        mask = pc.fill_null(mask_tbl.column("_m"), False)
        flips = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if flips:
            new_op = pc.if_else(mask, pa.scalar("D"), t.column("op"))
            t = t.set_column(t.column_names.index("op"), "op", new_op)
            flipped += flips
        outp = final_path(lake_dir, pid, epoch)
        man.fsh.makedirs(outp.rsplit("/", 1)[0] if not man.fsh.local else os.path.dirname(outp))
        man.fsh.write_parquet(t, outp, compression="zstd", compression_level=1,
                              row_group_size=64 * 1024)
        entries.append({"pid": pid, "rows": t.num_rows, "events": 0,
                        "max_lsn": ent["max_lsn"]})
    if entries:
        man.commit_epoch(
            epoch, lsn_lo=man.watermark_lsn, lsn_hi=man.watermark_lsn,
            entries=entries, schema_json=man.schema_json or "", wall_s=0.0,
            retain_history=retain_history,
        )
    return {"deleted": flipped, "epoch": epoch}


def read_lake_table(lake_dir: str, *, final_state: bool = True) -> pa.Table:
    """Driver-side small read of the whole lake (tests/golden checks only)."""
    from ..state.manifest import Manifest

    man = Manifest.load(lake_dir)
    files = man.committed_files()
    if not files:
        return pa.schema([]).empty_table()
    tables = [man.fsh.read_parquet(f) for f in files]
    target = tables[0].schema
    for tb in tables[1:]:
        target = evolve(target, tb.schema)
    t = pa.concat_tables([conform(tb, target) for tb in tables])
    if final_state:
        t = t.filter(pa.compute.not_equal(t.column("op"), pa.scalar("D")))
    return t.sort_by([("part_id", "ascending"), ("url", "ascending")])
