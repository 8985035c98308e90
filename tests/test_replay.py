"""End-to-end CDC replay: final state vs DuckDB oracle, exactly-once
idempotent re-run, checkpoint resume equivalence, parallelism
independence, tombstone persistence, salting equivalence, schema
evolution, lineage."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from go_datax_ray.pipelines.cdc_replay import (
    DatasetEventSource,
    ReplayConfig,
    SynthEventSource,
    replay,
)
from go_datax_ray.sinks.lake import read_lake, read_lake_table
from go_datax_ray.state.manifest import Manifest
from go_datax_ray.synth import EventGen, SynthConfig

N_EVENTS = 4000
CFG = SynthConfig(seed=11, n_urls=300, ts_range_s=600)  # coarse ts -> LWW ties


def _oracle_final(n_events: int, cfg: SynthConfig) -> pa.Table:
    """DuckDB oracle: LWW winner per url, tombstones filtered."""
    events = EventGen(cfg)(pa.table({"id": np.arange(n_events, dtype=np.int64)}))
    return duckdb.sql(
        """
        SELECT url, lsn, warc_ts, op, text FROM (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) rn
          FROM events
        ) WHERE rn = 1 AND op <> 'D' ORDER BY url
        """
    ).arrow()


def _final_cols(lake_dir) -> pa.Table:
    t = read_lake_table(lake_dir)
    return t.select(["url", "lsn", "warc_ts", "op", "text"]).sort_by("url")


@pytest.fixture(scope="module")
def oracle():
    return _oracle_final(N_EVENTS, CFG)


def _run(tmp, *, num_partitions=8, num_salts=0, epoch_size=N_EVENTS, n_events=N_EVENTS,
         exchange="delta"):
    cfg = ReplayConfig(
        lake_dir=str(tmp), num_partitions=num_partitions, num_salts=num_salts,
        epoch_size=epoch_size, exchange=exchange,
    )
    return replay(SynthEventSource(n_events, CFG), cfg)


def _assert_matches_oracle(lake_dir, oracle):
    got = _final_cols(lake_dir)
    assert got.num_rows == oracle.num_rows
    for col in ("url", "lsn", "text"):
        assert got.column(col).to_pylist() == oracle.column(col).to_pylist(), col


def test_single_epoch_matches_oracle(tmp_path, oracle):
    res = _run(tmp_path / "lake")
    assert res.events == N_EVENTS
    _assert_matches_oracle(tmp_path / "lake", oracle)


def test_multi_epoch_matches_oracle(tmp_path, oracle):
    _run(tmp_path / "lake", epoch_size=700)
    _assert_matches_oracle(tmp_path / "lake", oracle)


def test_rerun_is_noop(tmp_path, oracle):
    lake = tmp_path / "lake"
    _run(lake)
    before = _final_cols(lake)
    res2 = _run(lake)  # replay same source again: watermark skips everything
    assert res2.events == 0 and res2.epochs == 0
    assert _final_cols(lake).equals(before)


def test_resume_mid_stream_equals_full_replay(tmp_path, oracle):
    """Crash-and-resume: apply first 40%, then resume the full log —
    final state identical to a one-shot replay (byte-level)."""
    lake = tmp_path / "lake"
    _run(lake, n_events=int(N_EVENTS * 0.4), epoch_size=900)
    man = Manifest.load(str(lake))
    assert man.watermark_lsn == int(N_EVENTS * 0.4) - 1
    _run(lake, n_events=N_EVENTS, epoch_size=900)
    _assert_matches_oracle(lake, oracle)


def test_parallelism_independent(tmp_path, oracle):
    """Same log at different partition counts/epoch sizes -> same state."""
    a, b = tmp_path / "a", tmp_path / "b"
    _run(a, num_partitions=4, epoch_size=1300)
    _run(b, num_partitions=16, epoch_size=N_EVENTS)
    ta = _final_cols(a)
    tb = _final_cols(b)
    assert ta.equals(tb)


def test_salting_equivalence(tmp_path, oracle):
    """Salted two-phase LWW (groupby exchange) produces the identical
    final state."""
    _run(tmp_path / "lake", num_salts=4, exchange="groupby")
    _assert_matches_oracle(tmp_path / "lake", oracle)


def test_exchange_modes_equivalent(tmp_path, oracle):
    """delta / repartition / groupby exchanges all yield the same state."""
    outs = []
    for mode in ("delta", "repartition", "groupby"):
        _run(tmp_path / mode, epoch_size=1500, exchange=mode)
        outs.append(_final_cols(tmp_path / mode))
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])
    _assert_matches_oracle(tmp_path / "delta", oracle)


def test_tombstones_persist_and_resume_no_resurrection(tmp_path):
    """A url deleted late in the log stays deleted after a resume that
    replays only the tail (tombstone must persist in partition state)."""
    lake = str(tmp_path / "lake")
    events = EventGen(CFG)(pa.table({"id": np.arange(N_EVENTS, dtype=np.int64)}))
    # find a url whose LWW winner is a delete
    win = duckdb.sql(
        """
        SELECT url, op FROM (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) rn
          FROM events) WHERE rn = 1 AND op = 'D' LIMIT 1
        """
    ).fetchall()
    assert win, "synth config should produce at least one final-delete url"
    dead_url = win[0][0]
    _run(lake, epoch_size=1000)
    finals = _final_cols(lake)
    assert dead_url not in set(finals.column("url").to_pylist())
    # raw partition state (not final view) still holds the tombstone row
    raw = read_lake_table(lake, final_state=False)
    dead_rows = raw.filter(pa.compute.equal(raw.column("url"), pa.scalar(dead_url)))
    assert dead_rows.num_rows == 1 and dead_rows.column("op")[0].as_py() == "D"


def test_schema_evolution_v2_tail(tmp_path):
    """v1 events then a v2 tail with additive fetch_status: old rows get
    nulls, new rows carry values, no type errors."""
    lake = str(tmp_path / "lake")
    cfg_v1 = SynthConfig(seed=5, n_urls=100)
    cfg_v2 = SynthConfig(seed=5, n_urls=100, v2=True)
    _ = replay(SynthEventSource(1000, cfg_v1), ReplayConfig(lake_dir=lake, num_partitions=4))
    import ray.data as rd

    tail = EventGen(cfg_v2, offset=1000)(pa.table({"id": np.arange(500, dtype=np.int64)}))
    res = replay(
        DatasetEventSource(rd.from_arrow(tail), 1000, 1500),
        ReplayConfig(lake_dir=lake, num_partitions=4),
    )
    assert res.events == 500
    t = read_lake_table(lake)
    assert "fetch_status" in t.column_names
    new = t.filter(pa.compute.greater_equal(t.column("lsn"), pa.scalar(1000)))
    old = t.filter(pa.compute.less(t.column("lsn"), pa.scalar(1000)))
    assert old.column("fetch_status").null_count == old.num_rows
    assert new.filter(pa.compute.equal(new.column("op"), pa.scalar("I"))).column(
        "fetch_status"
    ).null_count == 0 or new.num_rows == 0


def test_extract_in_engine_equivalent(tmp_path, oracle):
    """Replaying raw-html events (text dropped; engine derives text post-LWW
    inside the merge) yields byte-identical text per url vs carrying it."""
    import ray.data as rd

    events = EventGen(CFG)(pa.table({"id": np.arange(N_EVENTS, dtype=np.int64)}))
    raw = events.drop_columns(["text"])  # WAL carries html only
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(lake_dir=lake, num_partitions=8, epoch_size=900, extract_text=True)
    replay(DatasetEventSource(rd.from_arrow(raw), 0, N_EVENTS), cfg)
    _assert_matches_oracle(lake, oracle)


def test_extract_text_batch_equivalence():
    """Vectorized extractor == canonical per-row extractor, including
    adversarial inputs (entities, unicode ws, control chars, bad utf-8)."""
    from go_datax_ray.synth import extract_text, extract_text_batch

    cases = [
        b"<html><body><p>plain ascii text</p></body></html>",
        b"<p>a&amp;b &lt;tag&gt; &#65;</p>",
        "<p>café  nbsp　ideo</p>".encode(),
        b"<p>ctrl\x1c\x1d\x1e\x1fchars\x0bvtab</p>",
        b"  <b>lead</b>\t\n trail  ",
        b"",
        b"<p></p>",
        b"no tags at all",
        b"\xff\xfe invalid utf8 <b>x</b>",
        None,
    ]
    arr = pa.array(cases, pa.large_binary())
    got = extract_text_batch(arr).to_pylist()
    want = [None if c is None else extract_text(c) for c in cases]
    assert got == want


def test_lineage_and_manifest(tmp_path):
    lake = str(tmp_path / "lake")
    res = _run(tmp_path / "lake", epoch_size=1500)
    man = Manifest.load(lake)
    lin = man.lineage()
    assert len(lin) == res.epochs
    # offsets chain with no gaps and cover the log
    assert lin[0]["lsn_lo"] == 0 and lin[-1]["lsn_hi"] == N_EVENTS - 1
    for a, b in zip(lin, lin[1:]):
        assert b["lsn_lo"] == a["lsn_hi"] + 1
    # every committed file exists; every partition entry points at one file
    for f in man.committed_files():
        assert os.path.exists(f)
    # per-partition lineage carries events + rows
    for rec in lin:
        for pid, ent in rec["partitions"].items():
            assert ent["events"] >= 0 and "file" in ent


def test_stale_tmp_and_delta_garbage_ignored(tmp_path, oracle):
    """Crash debris — stale _tmp files, leftover _delta dirs, an alien file
    in a partition dir — must be invisible (manifest decides visibility)
    and must not corrupt a subsequent resume."""
    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake", n_events=int(N_EVENTS * 0.5), epoch_size=900)
    # plant garbage: a fake tmp file, a stale delta dir, an orphan parquet
    os.makedirs(f"{lake}/_tmp", exist_ok=True)
    with open(f"{lake}/_tmp/part-00099-epoch-999999.parquet", "wb") as f:
        f.write(b"garbage")
    os.makedirs(f"{lake}/_delta/epoch-000000/part_id=3", exist_ok=True)
    with open(f"{lake}/_delta/epoch-000000/part_id=3/x.parquet", "wb") as f:
        f.write(b"junk")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"url": ["alien"], "lsn": [999999]}), f"{lake}/part-00000/alien.parquet"
    )
    _run(tmp_path / "lake", n_events=N_EVENTS, epoch_size=900)  # resume
    _assert_matches_oracle(tmp_path / "lake", oracle)  # alien rows invisible


def test_empty_epoch_advances_watermark(tmp_path):
    """An epoch whose events are all filtered still commits (watermark
    advances) — a tailing rerun must not reprocess the empty range."""
    import pyarrow.compute as pc_

    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(
        lake_dir=lake,
        num_partitions=4,
        transform=lambda t: t.filter(pc_.less(t.column("lsn"), pa.scalar(0))),  # drop all
    )
    res = replay(SynthEventSource(1000, CFG), cfg)
    assert res.events == 1000
    man = Manifest.load(lake)
    assert man.watermark_lsn == 999  # advanced despite zero applied rows
    res2 = replay(SynthEventSource(1000, CFG), cfg)
    assert res2.events == 0 and res2.epochs == 0  # no reprocessing


def test_concurrent_writer_lock(tmp_path):
    """Second replay into a locked lake fails fast instead of racing."""
    import fcntl

    lake = tmp_path / "lake"
    lake.mkdir()
    holder = open(lake / "_writer.lock", "w")
    fcntl.flock(holder, fcntl.LOCK_EX | fcntl.LOCK_NB)
    with pytest.raises(RuntimeError, match="writer lock"):
        _run(lake, n_events=100)
    fcntl.flock(holder, fcntl.LOCK_UN)
    holder.close()
    res = _run(lake, n_events=500)  # released -> proceeds
    assert res.events == 500


def test_read_lake_streaming_matches_table(tmp_path):
    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake")
    ds = read_lake(lake)
    t = read_lake_table(lake)
    assert ds.count() == t.num_rows
    # column pruning without 'op' still tombstone-filters (and drops op)
    pruned = read_lake(lake, columns=["url", "lsn"])
    assert pruned.count() == t.num_rows
    assert [f.name for f in pruned.schema().base_schema] == ["url", "lsn"]


def test_read_lake_point_lookup_prunes_partitions(tmp_path):
    """keys= point lookup: the reader prunes to the hash partitions the
    keys map to (manifest-recorded key column + hash_fn) and returns
    exactly the full-scan rows for those keys."""
    from go_datax_ray.hashing import partition_ids

    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake", num_partitions=8)
    full = read_lake_table(lake)
    keys = sorted(set(full.column("url").to_pylist()))[:3]
    want = full.filter(pc.is_in(full.column("url"), value_set=pa.array(keys)))
    ds = read_lake(lake, keys=keys)
    got = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("url")
    assert got.sort_by("url").column("url").to_pylist() == \
        want.sort_by("url").column("url").to_pylist()
    assert got.num_rows == want.num_rows
    # pruning: only the keys' partitions are read, not all 8 files
    n_pids = len(set(partition_ids(keys, 8).tolist()))
    man = Manifest.load(lake)
    assert len(man.files_for_keys(keys)) == n_pids < len(man.committed_files())
    # column pruning composes with the lookup (key col requested
    # internally for the filter, then dropped from the output)
    narrow = read_lake(lake, keys=keys, columns=["lsn"])
    assert narrow.count() == want.num_rows
    assert [f.name for f in narrow.schema().base_schema] == ["lsn"]
    # a key the lake never saw returns 0 rows via 1 file
    assert read_lake(lake, keys=["https://nope.example/x"]).count() == 0


def test_lake_cli_get_point_lookup(tmp_path, capsys):
    """lake_cli get: manifest-pruned point lookup, no Ray session,
    tombstones filtered, binary columns summarised."""
    import json as _json

    from go_datax_ray.lake_cli import main as cli_main

    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake")
    key = read_lake_table(lake).column("url")[0].as_py()
    rc = cli_main(["get", lake, "--keys", key])
    assert rc == 0
    rows = [_json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert len(rows) == 1 and rows[0]["url"] == key
    assert rows[0]["html"].startswith("<")  # binary summarised, not dumped


def test_read_lake_where_pushdown(tmp_path):
    """where triplets push into the parquet scan and compose with the
    tombstone filter; string values against numeric columns coerce via
    the committed schema (the parquet-reader grammar, shared)."""
    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake")
    full = read_lake_table(lake)
    want = full.filter(pc.equal(full.column("lang"), pa.scalar("en"))).num_rows
    got = read_lake(lake, where=[["lang", "==", "en"]]).count()
    assert got == want and 0 < got < full.num_rows
    # numeric coercion: lsn bound arrives as a string (job-JSON shape)
    mid = int(pc.mean(full.column("lsn")).as_py())
    want2 = full.filter(pc.greater(full.column("lsn"), pa.scalar(mid))).num_rows
    assert read_lake(lake, where=[["lsn", ">", str(mid)]]).count() == want2


def test_streaming_read_across_partial_evolution(tmp_path):
    """After a v2 tail that touches only SOME partitions, the streaming
    read_lake unifies mixed file schemas and v2 values survive when their
    events win LWW."""
    import ray.data as rd

    from go_datax_ray.schema import CDC_EVENT_SCHEMA_V2
    from go_datax_ray.sinks.lake import read_lake

    lake = str(tmp_path / "lake")
    _run(tmp_path / "lake", n_events=2000, num_partitions=8)
    ev = pa.Table.from_pydict(
        {
            "lsn": pa.array([2005], pa.int64()),
            "src_offset": pa.array([2005], pa.int64()),
            "op": pa.array(["U"], pa.string()),
            "url": pa.array(["https://evolved.example.org/x"], pa.string()),
            "warc_ts": pa.array([9_000_000_000_000_000], pa.timestamp("us")),
            "html": pa.array([b"<p>v2</p>"], pa.large_binary()),
            "text": pa.array(["v2"], pa.large_string()),
            "lang": pa.array(["en"], pa.string()),
            "fetch_status": pa.array([200], pa.int64()),
        },
        schema=CDC_EVENT_SCHEMA_V2,
    )
    replay(
        DatasetEventSource(rd.from_arrow(ev), 2005, 2006),
        ReplayConfig(lake_dir=lake, num_partitions=8),
    )
    df = read_lake(lake).to_pandas()
    assert "fetch_status" in df.columns  # unified across mixed-schema files
    row = df[df["url"] == "https://evolved.example.org/x"]
    assert row["fetch_status"].iloc[0] == 200 and row["text"].iloc[0] == "v2"
    # v1-era rows null-filled
    assert df["fetch_status"].notna().sum() == 1
