"""WAL tail follower: growing-log consumption, exactly-once across cycles."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from go_datax_ray.pipelines.cdc_replay import ParquetWalSource, ReplayConfig
from go_datax_ray.pipelines.tail import tail
from go_datax_ray.sinks.lake import read_lake_table
from go_datax_ray.synth import EventGen, SynthConfig

CFG = SynthConfig(seed=21, n_urls=150)


def _write_segment(wal_dir, lo, hi):
    t = EventGen(CFG)(pa.table({"id": np.arange(lo, hi, dtype=np.int64)}))
    wal_dir.mkdir(exist_ok=True)
    pq.write_table(t, wal_dir / f"seg-{lo:08d}.parquet")


def test_tail_follows_growing_wal(tmp_path):
    wal = tmp_path / "wal"
    lake = str(tmp_path / "lake")
    _write_segment(wal, 0, 1000)
    written = {"hi": 1000}

    def source():
        return ParquetWalSource(str(wal), 0, written["hi"])

    seen = []

    def on_cycle(res):
        seen.append(res.events)
        # the log grows while we tail it (first two cycles)
        if len(seen) == 1:
            _write_segment(wal, 1000, 1800)
            written["hi"] = 1800
        elif len(seen) == 2:
            _write_segment(wal, 1800, 2000)
            written["hi"] = 2000

    out = tail(
        source,
        ReplayConfig(lake_dir=lake, num_partitions=4, epoch_size=5000),
        poll_interval_s=0.01,
        idle_cycles_to_stop=2,
        on_cycle=on_cycle,
    )
    assert out["events"] == 2000  # every event consumed exactly once
    assert seen[0] == 1000 and seen[1] == 800 and seen[2] == 200
    # final state equals a one-shot replay of the full log
    import duckdb

    events = EventGen(CFG)(pa.table({"id": np.arange(2000, dtype=np.int64)}))
    want = duckdb.sql(
        """
        SELECT url, lsn FROM (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) rn
          FROM events) WHERE rn = 1 AND op <> 'D' ORDER BY url
        """
    ).arrow()
    got = read_lake_table(lake).select(["url", "lsn"]).sort_by("url")
    assert got.column("lsn").to_pylist() == want.column("lsn").to_pylist()
