"""Lake admin CLI: inspect and maintain a partitioned CDC lake.

    python -m go_datax_ray.lake_cli status  LAKE_DIR
    python -m go_datax_ray.lake_cli lineage LAKE_DIR
    python -m go_datax_ray.lake_cli count   LAKE_DIR [--asof-epoch N]
    python -m go_datax_ray.lake_cli get     LAKE_DIR --keys k1,k2[,...]
    python -m go_datax_ray.lake_cli compact LAKE_DIR [--horizon LSN]
    python -m go_datax_ray.lake_cli gc-orphans LAKE_DIR
    python -m go_datax_ray.lake_cli gc-history LAKE_DIR --keep-after N
    python -m go_datax_ray.lake_cli delete-where LAKE_DIR --where '[["col","op",value],...]'
    python -m go_datax_ray.lake_cli fold-view LAKE_DIR --view NAME --group-cols a,b [--sum-cols x,y]

Owns its own Ray session (only for ``count``); every other command is
pure manifest/filesystem work. LAKE_DIR may be a local path or any
fsspec URI (file://, s3://, ...).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="go_datax_ray.lake_cli")
    p.add_argument("cmd", choices=["status", "lineage", "count", "get",
                                   "compact", "gc-orphans", "gc-history",
                                   "delete-where", "fold-view"])
    p.add_argument("lake_dir")
    p.add_argument("--keys", type=str, default=None)
    p.add_argument("--asof-epoch", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--keep-after", type=int, default=None)
    p.add_argument("--where", type=str, default=None)
    p.add_argument("--view", type=str, default=None)
    p.add_argument("--group-cols", type=str, default=None)
    p.add_argument("--sum-cols", type=str, default="")
    args = p.parse_args(argv)

    from .state.manifest import Manifest

    man = Manifest.load(args.lake_dir)

    if args.cmd == "status":
        print(json.dumps({
            "lake_dir": args.lake_dir,
            "epoch": man.epoch,
            "watermark_lsn": man.watermark_lsn,
            "num_partitions": man.num_partitions,
            "committed_partitions": len(man.partitions),
            "rows": sum(int(e["rows"]) for e in man.partitions.values()),
        }, indent=2))
        return 0

    if args.cmd == "lineage":
        for rec in man.lineage():
            print(json.dumps(rec))
        return 0

    if args.cmd == "count":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from .sinks.lake import read_lake

        n = read_lake(args.lake_dir, asof_epoch=args.asof_epoch).count()
        print(json.dumps({"rows": n, "asof_epoch": args.asof_epoch}))
        ray.shutdown()
        return 0

    if args.cmd == "get":
        # point lookup: reads ONLY the partitions the keys hash to
        # (Manifest.files_for_keys), never the lake — no Ray session
        # needed, the k files read driver-side
        if not args.keys:
            p.error("get requires --keys")
        import pyarrow as pa
        import pyarrow.compute as pc

        keys = args.keys.split(",")
        if man.key is None:
            p.error("lake manifest predates key metadata; 'get' cannot "
                    "determine the key column (re-commit once to backfill)")
        tables = [man.fsh.read_parquet(f) for f in man.files_for_keys(keys)]
        for t in tables:
            vs = pa.array(keys)
            if vs.type != t.column(man.key).type:
                vs = vs.cast(t.column(man.key).type)  # int keys (ADVICE r3)
            t = t.filter(pc.is_in(t.column(man.key), value_set=vs))
            t = t.filter(pc.not_equal(t.column("op"), pa.scalar("D")))
            for row in t.to_pylist():
                row = {k: (v if not isinstance(v, bytes) else f"<{len(v)}B>")
                       for k, v in row.items()}
                print(json.dumps(row, default=str))
        return 0

    # Every mutating command takes the same exclusive flock the replay
    # pipeline takes — gc-orphans racing an in-flight replay would delete
    # the uncommitted epoch's freshly written merge outputs and fail its
    # commit_epoch with FileNotFoundError (manifest.py documents gc is
    # only safe under the writer lock).
    from .state.fs import writer_lock

    if args.cmd == "compact":
        from .sinks.lake import compact

        with writer_lock(args.lake_dir):
            print(json.dumps(compact(args.lake_dir,
                                     drop_tombstones_below_lsn=args.horizon)))
        return 0

    if args.cmd == "gc-orphans":
        with writer_lock(args.lake_dir):
            print(json.dumps({"removed": man.gc_orphans()}))
        return 0

    if args.cmd == "gc-history":
        if args.keep_after is None:
            p.error("gc-history requires --keep-after")
        with writer_lock(args.lake_dir):
            print(json.dumps({"removed": man.gc_history(args.keep_after)}))
        return 0

    if args.cmd == "fold-view":
        # Folding only touches measure sums, so the CLI spec needs the
        # column lists but never the (non-serialisable) derive hook —
        # derived measure columns already live inside the delta files.
        if not args.view or not args.group_cols:
            p.error("fold-view requires --view and --group-cols")
        from .sinks.views import ViewSpec, fold_view_deltas

        spec = ViewSpec(
            name=args.view,
            group_cols=tuple(c for c in args.group_cols.split(",") if c),
            sum_cols=tuple(c for c in args.sum_cols.split(",") if c),
        )
        with writer_lock(args.lake_dir):
            print(json.dumps(fold_view_deltas(args.lake_dir, spec)))
        return 0

    if args.cmd == "delete-where":
        if not args.where:
            p.error("delete-where requires --where")
        from .sinks.lake import delete_where

        with writer_lock(args.lake_dir):
            print(json.dumps(delete_where(args.lake_dir, json.loads(args.where))))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
