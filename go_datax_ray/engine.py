"""Job engine: DataX JSON job -> Ray Data pipeline -> sink.

The reference's JobContainer phase machine init -> prepare -> split ->
schedule -> post (/root/reference/core/job/jobcontainer.go:61-138) and
its goroutine-pair TaskGroupContainers collapse into: resolve plugins
from the registry, build the lazy Dataset (split = Ray blocks), apply
the transformer chain (one fused map_batches), and hand the stream to
the sink (schedule = streaming executor). Governance: errorLimit
(/root/reference/common/statistics/error_limiter.go:24-113) becomes a
dead-letter-counting wrapper around the transform chain; the final
stats line mirrors jobcontainer.go:322-338.

CLI: ``python -m go_datax_ray.engine job.json`` (owns its Ray session).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from .config import JobConfig
from .registry import SINKS, SOURCES
from .stages.transforms import build_transformer_chain
from .state.metrics import check_error_limit, format_job_stats


@dataclass
class JobResult:
    records: int = 0
    error_records: int = 0
    byts: int = 0
    wall_s: float = 0.0
    sink_result: dict[str, Any] = field(default_factory=dict)

    @property
    def stats_line(self) -> str:
        return format_job_stats(self.records, self.byts, self.wall_s, self.error_records)


def run_job(cfg: JobConfig | dict | str,
            variables: dict[str, str] | None = None) -> JobResult:
    """Execute one job. Ray must already be initialised by the caller
    (the CLI below owns a session; tests use the shared fixture).
    ``variables`` feeds ${name} substitution in the job JSON (the
    reference documents this for incremental syncs; we implement it)."""
    if isinstance(cfg, str):
        cfg = JobConfig.from_file(cfg, variables=variables)
    elif isinstance(cfg, dict):
        cfg = JobConfig.from_dict(cfg, variables=variables)

    if cfg.reader_name not in SOURCES:
        raise KeyError(f"unknown reader {cfg.reader_name!r}")
    if cfg.writer_name not in SINKS:
        raise KeyError(f"unknown writer {cfg.writer_name!r}")

    t0 = time.perf_counter()
    ds = SOURCES[cfg.reader_name](cfg.reader_param, channel=cfg.channel)

    dead_letter = None
    if cfg.transformers:
        from .state.metrics import get_dead_letter_actor, table_to_ipc

        chain = build_transformer_chain(cfg.transformers, ds.schema().base_schema)
        import uuid

        dead_letter = get_dead_letter_actor(f"gdr_dl_{uuid.uuid4().hex[:8]}")

        def guarded(t: pa.Table) -> pa.Table:
            # rows dropped by dx_filter are FILTERED, not errors; a row the
            # chain RAISES on is a poison row -> retried individually and
            # routed to the dead-letter actor (per-row degraded fallback,
            # tdengine_writer.go:304-355; errorLimit counts these)
            try:
                return chain(t)
            except Exception:  # noqa: BLE001
                ok, dead = [], []
                for i in range(t.num_rows):
                    row = t.slice(i, 1)
                    try:
                        ok.append(chain(row))
                    except Exception:  # noqa: BLE001
                        dead.append(row)
                if dead:
                    import ray

                    bad = pa.concat_tables(dead)
                    # synchronous append: the task must not complete before
                    # the actor recorded the rows (count read at job end)
                    ray.get(dead_letter.append.remote(table_to_ipc(bad), bad.num_rows))
                if ok:
                    return pa.concat_tables(ok)
                try:
                    return chain(t.slice(0, 0))  # empty table, output schema
                except Exception:  # noqa: BLE001
                    return t.slice(0, 0)  # chain broken for the whole schema

        ds = ds.map_batches(guarded, batch_format="pyarrow", zero_copy_batch=True)

    if cfg.speed_record or cfg.speed_byte:
        # ENFORCED speed.record / speed.byte (the reference documents but
        # never enforces them — state/metrics.make_rate_limiter)
        from .state.metrics import make_rate_limiter, throttle_stage

        limiter = make_rate_limiter(cfg.speed_record, cfg.speed_byte)
        ds = ds.map_batches(
            throttle_stage(limiter), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=1024,
        )

    res = JobResult()
    sink_out = SINKS[cfg.writer_name](ds, cfg.writer_param)
    res.sink_result = sink_out
    res.records = int(sink_out.get("records", 0))
    res.byts = int(sink_out.get("bytes", 0))
    if dead_letter is not None:
        import ray

        res.error_records = ray.get(dead_letter.count.remote())
    # writer-side degraded-retry failures (poison rows the sink skipped)
    res.error_records += int(sink_out.get("error_records", 0))
    res.wall_s = time.perf_counter() - t0

    check_error_limit(
        res.records + res.error_records,
        res.error_records,
        record_limit=cfg.error_limit_record,
        percentage=cfg.error_limit_percentage,
    )
    return res


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="go_datax_ray.engine")
    p.add_argument("job", help="DataX-style job JSON file")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("-p", "--param", action="append", default=[],
                   help="job variable KEY=VALUE for ${KEY} substitution")
    args = p.parse_args(argv)
    variables = dict(kv.split("=", 1) for kv in args.param)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        res = run_job(args.job, variables=variables)
        print(res.stats_line)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
