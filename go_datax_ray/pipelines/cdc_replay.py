"""The flagship pipeline: CDC replay into the Parquet lake.

go-datax's whole job model — JobContainer phases init/prepare/split/
schedule/post driving reader->channel->writer goroutine pairs
(/root/reference/core/job/jobcontainer.go:61-138, /root/reference/core/
task/taskgroupcontainer.go:39-239) — collapses into one Ray Data
streaming pipeline per epoch:

    source.read(lo, hi)                      # split: lsn-range read tasks
      .map_batches(add_part_id)              # key-hash partitioner
      .map_batches(lww_combine_batch)        # combiner: shrink the shuffle
      [.groupby(part_id, salt).map_groups(lww)]   # salted pre-reduce (skew)
      .groupby(part_id).map_groups(merge)    # shuffle + merge-apply
    -> driver commits the epoch atomically (manifest + rename)

The epoch loop is the checkpoint unit: a crash between epochs resumes
from the manifest watermark; a crash mid-epoch replays the whole epoch,
which is idempotent (deterministic tmp names + LWW + manifest gate).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Protocol

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import evolve
from ..sinks.lake import make_partition_merger, schema_from_json
from ..stages.lww import lww_combine_batch, lww_table, lww_combine_counted
from ..stages.partition import add_part_id, add_salt
from ..state.manifest import Manifest
from ..synth import EventGen, SynthConfig


class EventSource(Protocol):
    """A WAL/binlog tail abstraction: total extent + range read."""

    def lsn_bounds(self) -> tuple[int, int]:  # [lo, hi) of available events
        ...

    def read(self, lo: int, hi: int) -> Any:  # ray.data.Dataset of CDC events
        ...


class SynthEventSource:
    """Deterministic generator tail (streamreader analogue, seeded)."""

    def __init__(self, n_events: int, cfg: SynthConfig | None = None):
        self.n_events = n_events
        self.cfg = cfg or SynthConfig()

    def lsn_bounds(self) -> tuple[int, int]:
        return (0, self.n_events)

    def read(self, lo: int, hi: int):
        import ray.data as rd

        return rd.range(hi - lo).map_batches(
            EventGen,
            fn_constructor_args=(self.cfg, lo),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=(1, 16),
        )


class DatasetEventSource:
    """Replay an existing Dataset (or list of datasets, e.g. a v2-schema
    continuation) that carries an ``lsn`` column."""

    def __init__(self, ds, lsn_lo: int, lsn_hi: int):
        self.ds = ds
        self._bounds = (lsn_lo, lsn_hi)

    def lsn_bounds(self) -> tuple[int, int]:
        return self._bounds

    def read(self, lo: int, hi: int):
        lo_s, hi_s = pa.scalar(lo, pa.int64()), pa.scalar(hi, pa.int64())
        return self.ds.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t.column("lsn"), lo_s), pc.less(t.column("lsn"), hi_s))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )


def _scan_wal_footer(path: str, lo: int, hi: int) -> list[dict]:
    """One segment's (path, rg) fragments overlapping [lo, hi), pruned
    by the lsn column's row-group statistics."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    try:
        lsn_i = md.schema.names.index("lsn")
    except ValueError:
        lsn_i = None
    out: list[dict] = []
    for rg in range(md.num_row_groups):
        if lsn_i is not None:
            st = md.row_group(rg).column(lsn_i).statistics
            if st is not None and st.has_min_max and (
                st.max < lo or st.min >= hi
            ):
                continue
        out.append({"path": path, "rg": rg})
    return out


class ParquetWalSource:
    """Replay WAL segments persisted as Parquet, with lsn row-group pushdown."""

    def __init__(self, paths: list[str] | str, lsn_lo: int, lsn_hi: int):
        self.paths = paths
        self._bounds = (lsn_lo, lsn_hi)

    def lsn_bounds(self) -> tuple[int, int]:
        return self._bounds

    def _files(self) -> list[str]:
        import glob as _g
        import os as _os

        paths = self.paths
        if isinstance(paths, str):
            if _os.path.isdir(paths):
                return sorted(_g.glob(_os.path.join(paths, "*.parquet")))
            if any(c in paths for c in "*?["):
                return sorted(_g.glob(paths))
            return [paths]
        return list(paths)

    # above this many WAL segments the per-epoch footer scan runs as a
    # distributed task stage instead of a serial driver loop (a 100 TB
    # WAL is easily 10^5+ segments; 10^5 serial footer reads per epoch
    # on the driver would dominate the epoch)
    distribute_scan_after: int = 256

    def fragments(self, lo: int, hi: int) -> list[dict]:
        """(file, row-group) splits overlapping [lo, hi), pruned by the
        lsn column statistics. This powers the FUSED read path: Ray 2.49
        never fuses ReadParquet with downstream map_batches, so the
        replay's raw payload (html) would round-trip the object store
        between the read operator and the partition/LWW maps — reading
        row groups INSIDE the map task removes that extra full-corpus
        hop (measured: the map chain was the worst-scaling phase of the
        epoch). Footer metadata is scanned driver-side for small WALs
        and through a parallel task stage past ``distribute_scan_after``
        files — only the tiny (path, rg) rows return to the driver."""
        files = self._files()
        if len(files) <= self.distribute_scan_after:
            out: list[dict] = []
            for p in files:
                out.extend(_scan_wal_footer(p, lo, hi))
            return out

        import ray.data as rd

        def scan(batch: dict) -> dict:
            paths, rgs = [], []
            for p in batch["item"]:
                for frag in _scan_wal_footer(str(p), lo, hi):
                    paths.append(frag["path"])
                    rgs.append(frag["rg"])
            return {"path": paths, "rg": rgs}

        rows = rd.from_items(files).map_batches(
            scan, batch_size=64, batch_format="numpy"
        ).take_all()  # metadata rows only — never data
        # restore the serial path's order: _files() list position, then
        # row group — NOT lexicographic (paths may be an explicit list in
        # caller-chosen order; the two code paths must read identically)
        order = {p: i for i, p in enumerate(files)}
        rows.sort(key=lambda r: (order[str(r["path"])], int(r["rg"])))
        return [{"path": r["path"], "rg": int(r["rg"])} for r in rows]

    def read(self, lo: int, hi: int):
        import ray.data as rd

        return rd.read_parquet(
            self.paths, filter=(pc.field("lsn") >= lo) & (pc.field("lsn") < hi)
        )


def _fragment_prepared_ds(source, lo: int, hi: int, cfg: "ReplayConfig",
                          rows_per_task: int = 32768):
    """FUSED epoch preparation: read + transform + drop-text +
    add_part_id + LWW-combine in ONE map task per row-group bundle.

    Ray 2.49 never fuses ReadParquet with downstream map_batches, so the
    separate-stage path round-trips the raw payload (html) through the
    object store between the read operator and the partition/LWW maps —
    measured as the epoch's worst-scaling phase at 8->32 cpus (memory
    bandwidth, not CPU). Doing the read INSIDE the processing function
    removes that full-corpus hop; only the LWW-combined winners enter
    the object store. Fragments are bundled to ~rows_per_task so each
    output block spans ~128 MB of pages and the delta write emits
    few-per-partition files (the merge's open cost stays bounded).
    NOTE: the stages must be fused MANUALLY in one function — composing
    map_batches stages with a batch_size on the tail makes Ray's fusion
    unify the batch size across the whole fused operator, coalescing the
    tiny path-items input into ONE serial task (measured 22 s vs 3 s).

    Returns None when the source has no fragment support or no
    overlapping data."""
    if not hasattr(source, "fragments"):
        return None
    frags = source.fragments(lo, hi)
    if not frags:
        return None
    import json as _json

    import ray.data as rd

    # bundle consecutive fragments to ~rows_per_task rows per task
    per = max(1, rows_per_task // 8192)
    bundles = [
        _json.dumps(frags[i : i + per]) for i in range(0, len(frags), per)
    ]
    transform = cfg.transform
    drop_text = cfg.extract_text
    key, nparts, hash_fn = cfg.key, cfg.num_partitions, cfg.hash_fn
    min_red = cfg.combine_min_reduction

    def read_and_prepare(batch: dict) -> pa.Table:
        import pyarrow.parquet as pq

        tables = []
        for b in batch["b"]:
            for frag in _json.loads(b):
                t = pq.ParquetFile(frag["path"]).read_row_group(int(frag["rg"]))
                lsn = t.column("lsn")
                t = t.filter(
                    pc.and_(pc.greater_equal(lsn, pa.scalar(lo)),
                            pc.less(lsn, pa.scalar(hi)))
                )
                if t.num_rows:
                    tables.append(t)
        if not tables:
            return None  # filtered-empty bundle -> no block
        t = pa.concat_tables(tables)
        if transform is not None:
            t = transform(t)
        if drop_text and "text" in t.column_names:
            t = t.drop_columns(["text"])
        t = add_part_id(t, key=key, num_partitions=nparts, hash_fn=hash_fn)
        return lww_combine_counted(t, min_reduction=min_red)

    def safe(batch: dict):
        out = read_and_prepare(batch)
        if out is not None:
            yield out

    return rd.from_items(
        [{"b": b} for b in bundles], override_num_blocks=len(bundles)
    ).map_batches(safe, batch_format="numpy", batch_size=1)


@dataclass
class ReplayConfig:
    lake_dir: str
    num_partitions: int = 32
    num_salts: int = 0  # 0/1 disables the salted pre-reduce (groupby mode)
    epoch_size: int = 1_000_000
    key: str = "url"
    # Partition hash family: "crc32" (reference-exact CRC32(pk)%N hot
    # path) or "md5" (DuckDB md5_number_lower-checkable placement — final
    # table state is identical either way, only placement moves; pick md5
    # when lineage/placement must be SQL-auditable).
    hash_fn: str = "crc32"
    use_metrics: bool = False
    report: bool = False  # print per-epoch speed lines
    # Partition exchange strategy:
    #   "delta"    — write-side partitioning: combined winners are written
    #                straight into per-partition delta files
    #                (write_parquet(partition_cols=[part_id])), then P
    #                embarrassingly-parallel merge tasks compact each
    #                partition (LSM/Hudi-style write-then-compact). No
    #                shuffle operator at all; measured ~5x faster than the
    #                sort-based groupby locally and the natural shape for
    #                multi-node CDC ingest (deltas land on shared storage).
    #   "repartition" — hash repartition by part_id through the object
    #                store, then per-block multi-partition merge.
    #   "groupby"  — groupby(part_id).map_groups merge (supports the
    #                salted two-phase pre-reduce for hot keys).
    exchange: str = "delta"
    # Derive text = extract_text(html) inside the engine instead of
    # trusting/carrying the source's text column. The incoming text column
    # (if any) is dropped BEFORE the exchange and extraction runs on the
    # post-LWW winner set inside the merge: derived payload never enters
    # the shuffle, and extraction cost is per surviving key, not per event
    # (the realistic profile of webtext CDC ingest — events arrive as raw
    # html; byte-identity of the extractor is enforced by tests).
    extract_text: bool = False
    # Keep superseded partition files so any committed epoch remains
    # readable (read_lake(asof_epoch=...) time travel — the ES alias-swap
    # analogue); GC old views later with Manifest.gc_history().
    retain_history: bool = False
    # Optional per-batch transform (pa.Table -> pa.Table) applied after the
    # read — the dx_* transformer-chain hook (stages.transforms
    # .build_transformer_chain output plugs in here).
    transform: Any | None = None
    # Incrementally-maintained aggregate views (sinks.views.ViewSpec):
    # per-partition deltas computed INSIDE the merge (old/new state are
    # already in memory there), committed-epoch visibility via the
    # manifest; read with sinks.views.read_view.
    views: tuple = ()
    # Codec for the intra-epoch delta temporaries (the exchange's entire
    # byte volume — html-dominated). Round-5 A/B (BASELINE.md §3g):
    # zstd-1 writes 24% fewer bytes than lz4 (455 vs 601 MB/epoch at
    # sf0.1) but is consistently SLOWER wall-to-wall at both 8 and 32
    # cpus — on tmpfs the exchange is encode-CPU-bound, not byte-bound,
    # so lz4 stays the default. Deployments whose delta dir is a real
    # network object store (where bytes ARE the constraint) should flip
    # to ("zstd", 1) — the knob exists for exactly that.
    delta_compression: str = "lz4"
    delta_compression_level: int = 1
    # Shuffle-combiner cost gate: a within-batch LWW take copies the
    # whole (html-wide) batch, so batches whose in-batch duplicate ratio
    # is below this threshold pass through uncombined (the merge LWWs
    # anyway; only exchange bytes change). See stages.lww.
    combine_min_reduction: float = 0.05


@dataclass
class ReplayResult:
    lake_dir: str
    events: int = 0
    epochs: int = 0
    wall_s: float = 0.0
    epoch_stats: list[dict] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events / self.wall_s if self.wall_s > 0 else 0.0


def _delta_dir_bytes(fsh, delta_dir: str) -> int:
    """Total bytes of the epoch's delta temporaries — the exchange's
    byte volume (local fast path; 0 when the fs can't stat cheaply)."""
    import os

    if not fsh.local:
        return 0
    total = 0
    for root, _dirs, files in os.walk(delta_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _exchange_and_merge(ds, cfg: ReplayConfig, man: Manifest, epoch: int,
                        committed: dict[int, str], metrics,
                        exchange_stats: dict | None = None) -> list[dict]:
    """Run the configured partition exchange + merge; return manifest rows.
    ``exchange_stats`` (when given) receives byte-accounting for the
    exchange: {"delta_bytes": N} on the delta path."""
    import os
    import shutil

    import ray.data as rd

    from ..sinks.lake import make_delta_merger

    if cfg.exchange == "delta":
        from ..state.fs import LakeFS

        fsh = LakeFS(cfg.lake_dir)
        delta_dir = fsh.join("_delta", f"epoch-{epoch:06d}")
        fsh.rmtree(delta_dir)  # idempotent epoch restart
        pafs = fsh.pa_filesystem()
        comp = {"compression": cfg.delta_compression}
        if cfg.delta_compression == "zstd":
            comp["compression_level"] = cfg.delta_compression_level
        ds.write_parquet(delta_dir, partition_cols=["part_id"], **comp,
                         **({"filesystem": pafs} if pafs is not None else {}))
        pids = sorted(
            int(d.split("=", 1)[1])
            for d in fsh.listdir(delta_dir)
            if d.startswith("part_id=")
        ) if fsh.isdir(delta_dir) else []
        if exchange_stats is not None and pids:
            exchange_stats["delta_bytes"] = _delta_dir_bytes(fsh, delta_dir)
        if not pids:
            return []
        merge = make_delta_merger(
            cfg.lake_dir, epoch, committed, delta_dir, metrics,
            extract_missing_text=cfg.extract_text, view_specs=cfg.views,
        )
        pid_ds = rd.from_items([{"pid": p} for p in pids], override_num_blocks=len(pids))
        entries = pid_ds.map_batches(merge, batch_format="numpy", batch_size=1).take_all()
        fsh.rmtree(delta_dir)
        return entries

    if cfg.exchange == "repartition":
        merge = make_partition_merger(
            cfg.lake_dir, epoch, committed, metrics,
            extract_missing_text=cfg.extract_text, view_specs=cfg.views,
        )

        def merge_multi(batch: pa.Table) -> pa.Table:
            outs = []
            for pid in pc.unique(batch.column("part_id")).to_pylist():
                outs.append(
                    merge(batch.filter(pc.equal(batch.column("part_id"), pa.scalar(pid))))
                )
            if not outs:
                return pa.table(
                    {
                        "pid": pa.array([], pa.int64()),
                        "rows": pa.array([], pa.int64()),
                        "events": pa.array([], pa.int64()),
                        "max_lsn": pa.array([], pa.int64()),
                        "schema_json": pa.array([], pa.string()),
                    }
                )
            return pa.concat_tables(outs)

        from ray.data.context import ShuffleStrategy

        # keyed repartition requires the hash-shuffle strategy; datasets
        # snapshot their DataContext at creation, so set it on this
        # dataset's own context copy.
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ds = ds.repartition(cfg.num_partitions, keys=["part_id"])
        return ds.map_batches(
            merge_multi, batch_format="pyarrow", batch_size=None
        ).take_all()

    if cfg.exchange == "groupby":
        if cfg.num_salts and cfg.num_salts > 1:
            ds = ds.map_batches(
                add_salt,
                fn_kwargs={"num_salts": cfg.num_salts},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ds = (
                ds.groupby(["part_id", "salt"])
                .map_groups(lww_table, batch_format="pyarrow")
                .map_batches(
                    lambda t: t.drop_columns(["salt"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        merge = make_partition_merger(
            cfg.lake_dir, epoch, committed, metrics,
            extract_missing_text=cfg.extract_text, view_specs=cfg.views,
        )
        return ds.groupby("part_id").map_groups(merge, batch_format="pyarrow").take_all()

    raise ValueError(f"unknown exchange {cfg.exchange!r}")


def replay(source: EventSource, cfg: ReplayConfig) -> ReplayResult:
    """Run the CDC replay from the source's current extent into the lake,
    resuming after the committed watermark. Exactly-once: re-running with
    the same source is a no-op past the watermark. Holds an exclusive
    writer lock on the lake — two concurrent replays would race the
    manifest, so the second fails fast (flock is released by the OS even
    on crash, so a dead writer never wedges the lake)."""
    metrics = None
    if cfg.use_metrics:
        from ..state.metrics import get_metrics_actor

        metrics = get_metrics_actor()

    from ..state.fs import LakeFS, writer_lock

    fsh = LakeFS(cfg.lake_dir)
    if not fsh.local:
        # no POSIX flock on object stores: single-writer coordination is
        # the deployment's job there (HARD requirement — state/fs.py
        # docstring); the manifest watermark still makes sequential
        # re-runs exactly-once
        fsh.makedirs(fsh.root)
    with writer_lock(cfg.lake_dir):
        return _replay_locked(source, cfg, metrics)


def _replay_locked(source: EventSource, cfg: ReplayConfig, metrics) -> ReplayResult:
    man = Manifest.load(cfg.lake_dir)
    if man.num_partitions and man.num_partitions != cfg.num_partitions:
        raise ValueError(
            f"lake has {man.num_partitions} partitions; config says {cfg.num_partitions}"
        )
    # key/hash_fn None = pre-metadata manifest: placement unknown, so don't
    # reject the very config the lake may have been built with — backfill
    # below and let the next commit record it (ADVICE r3)
    if (man.num_partitions and man.key is not None and man.hash_fn is not None
            and (man.key, man.hash_fn) != (cfg.key, cfg.hash_fn)):
        raise ValueError(
            f"lake is keyed/placed by ({man.key}, {man.hash_fn}); "
            f"config says ({cfg.key}, {cfg.hash_fn})"
        )
    man.num_partitions = cfg.num_partitions
    man.key, man.hash_fn = cfg.key, cfg.hash_fn

    src_lo, src_hi = source.lsn_bounds()
    start = max(src_lo, man.watermark_lsn + 1)
    res = ReplayResult(lake_dir=cfg.lake_dir)
    t_total = time.perf_counter()
    epoch = man.epoch
    lo = start
    while lo < src_hi:
        hi = min(lo + cfg.epoch_size, src_hi)
        epoch += 1
        t0 = time.perf_counter()
        ds = _fragment_prepared_ds(source, lo, hi, cfg)
        if ds is None:
            # generic EventSource path: separate (auto-fused) map stages
            ds = source.read(lo, hi)
            if cfg.transform is not None:
                ds = ds.map_batches(cfg.transform, batch_format="pyarrow", zero_copy_batch=True)
            if cfg.extract_text:
                ds = ds.map_batches(
                    lambda t: t.drop_columns(["text"]) if "text" in t.column_names else t,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            ds = ds.map_batches(
                add_part_id,
                fn_kwargs={"key": cfg.key, "num_partitions": cfg.num_partitions,
                           "hash_fn": cfg.hash_fn},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            # batch_size here also COALESCES blocks: the delta write emits
            # one file per (block, partition), so larger blocks -> ~P
            # fewer, larger delta files -> the merge's per-file open
            # overhead stays bounded. 32k rows x ~4KB pages ~ 128MB blocks.
            ds = ds.map_batches(
                lww_combine_counted, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=32768,
                fn_kwargs={"min_reduction": cfg.combine_min_reduction},
            )
        committed = {
            int(pid): man.partition_file(int(pid)) for pid in man.partitions
        }
        ex_stats: dict = {}
        entries = _exchange_and_merge(ds, cfg, man, epoch, committed, metrics,
                                      exchange_stats=ex_stats)
        wall = time.perf_counter() - t0
        if entries:
            sch = schema_from_json(entries[0]["schema_json"])
            for e in entries[1:]:
                sch = evolve(sch, schema_from_json(e["schema_json"]))
            from ..sinks.lake import schema_to_json

            schema_json = schema_to_json(sch)
        else:
            # an epoch whose events were all filtered/absent still COMMITS
            # (with no partition entries) so the watermark advances — else a
            # tail/rerun would reprocess the empty range forever
            schema_json = man.schema_json or ""
        man.commit_epoch(
            epoch,
            lsn_lo=lo,
            lsn_hi=hi - 1,
            entries=entries,
            schema_json=schema_json,
            wall_s=wall,
            retain_history=cfg.retain_history,
        )
        # events consumed from the WAL this epoch = the offset span advanced;
        # per-partition entry counts are post-combiner applied rows.
        n_events = hi - lo
        n_applied = sum(int(e["events"]) for e in entries)
        res.events += n_events
        res.epochs += 1
        stat = {
            "epoch": epoch,
            "lsn_lo": lo,
            "lsn_hi": hi - 1,
            "events": n_events,
            "applied": n_applied,
            "wall_s": wall,
            "events_per_sec": n_events / wall if wall > 0 else 0.0,
            **ex_stats,  # delta_bytes: exchange byte volume (delta path)
        }
        res.epoch_stats.append(stat)
        if cfg.report:
            per_part = ", ".join(
                f"p{int(e['pid'])}={int(e['events']) / wall:.0f}/s" for e in entries[:8]
            )
            print(
                f"epoch {epoch}: {n_events} events in {wall:.2f}s "
                f"({stat['events_per_sec']:.0f} events/s) | per-partition: {per_part}"
            )
        lo = hi
    res.wall_s = time.perf_counter() - t_total
    return res
