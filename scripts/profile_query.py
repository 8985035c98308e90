"""Per-stage profile of one driver query: runs queries()[name](sf_dir)
and prints Ray Data's execution stats (per-operator wall time, rows,
memory) — the feedback loop for "wall-time dominated by useful compute"
tuning.

Usage: python scripts/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as m

    fn = m.queries()[name]
    t0 = time.perf_counter()
    out = fn(sf_dir)
    if hasattr(out, "materialize"):
        out = out.materialize()
        n = out.count()
    else:
        n = len(out)
    wall = time.perf_counter() - t0
    print(f"== {name}: {n} rows in {wall:.2f}s ==")
    if hasattr(out, "stats"):
        print(out.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
