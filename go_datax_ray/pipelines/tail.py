"""WAL tail follower: continuous incremental ingest.

The reference explicitly does NOT support realtime sync
(/root/reference/README.md:224 — its "incremental" mode is WHERE-predicate
re-query, docs/USER_GUIDE.md:31-68). This is the engine's real tail: poll the
WAL for new extent past the committed watermark, replay the delta through
the exactly-once path, repeat. Because every cycle is just ``replay`` (a
watermark-filtered, manifest-gated, idempotent epoch loop), a crashed
tailer resumes exactly where the manifest says — no extra state.
"""

from __future__ import annotations

import time
from typing import Callable

from .cdc_replay import EventSource, ReplayConfig, ReplayResult, replay


def tail(
    source_fn: Callable[[], EventSource],
    cfg: ReplayConfig,
    *,
    poll_interval_s: float = 1.0,
    max_cycles: int | None = None,
    idle_cycles_to_stop: int | None = None,
    on_cycle: Callable[[ReplayResult], None] | None = None,
) -> dict:
    """Follow a growing WAL.

    ``source_fn`` re-opens the source each cycle (its lsn_bounds reflect
    new segments); consumption is driven purely by the lake watermark.
    Stop after ``max_cycles`` cycles or ``idle_cycles_to_stop``
    consecutive cycles with no new events (None = run forever).
    """
    cycles = 0
    idle = 0
    total_events = 0
    t0 = time.perf_counter()
    while True:
        res = replay(source_fn(), cfg)
        cycles += 1
        total_events += res.events
        if on_cycle is not None:
            on_cycle(res)
        idle = idle + 1 if res.events == 0 else 0
        if max_cycles is not None and cycles >= max_cycles:
            break
        if idle_cycles_to_stop is not None and idle >= idle_cycles_to_stop:
            break
        if res.events == 0:
            time.sleep(poll_interval_s)
    wall = time.perf_counter() - t0
    return {
        "cycles": cycles,
        "events": total_events,
        "wall_s": wall,
        "events_per_sec": total_events / wall if wall > 0 else 0.0,
    }
