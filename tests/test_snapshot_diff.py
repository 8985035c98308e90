"""Snapshot differ: I/U/D derivation + full loop back through the lake."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _snapshots():
    old = pa.table(
        {
            "pk": pa.array([1, 2, 3, 4], pa.int64()),
            "v": ["a", "b", "c", "d"],
            "x": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    new = pa.table(
        {
            "pk": pa.array([2, 3, 4, 5], pa.int64()),
            "v": ["b", "C!", "d", "e"],  # 3 changed, 5 inserted, 1 deleted
            "x": pa.array([20, 30, 41, 50], pa.int64()),  # 4 changed via x
        }
    )
    return old, new


def test_diff_ops_match_sql():
    from go_datax_ray.pipelines.snapshot_diff import diff_snapshots

    old, new = _snapshots()
    out = (
        diff_snapshots(rd.from_arrow(old), rd.from_arrow(new), key="pk", n_buckets=4)
        .to_pandas()
        .sort_values("pk")
    )
    got = dict(zip(out["pk"], out["op"]))
    assert got == {1: "D", 3: "U", 4: "U", 5: "I"}
    # payloads: U/I carry NEW values, D carries nulls
    assert out[out["pk"] == 3]["v"].iloc[0] == "C!"
    assert out[out["pk"] == 4]["x"].iloc[0] == 41
    assert pd.isna(out[out["pk"] == 1]["v"].iloc[0])
    # oracle: full outer join semantics (o/n registered from locals)
    o, n = old.to_pandas(), new.to_pandas()  # noqa: F841 — duckdb scans locals
    want = duckdb.sql(
        """
        SELECT * FROM (
          SELECT COALESCE(n.pk, o.pk) pk,
                 CASE WHEN o.pk IS NULL THEN 'I'
                      WHEN n.pk IS NULL THEN 'D'
                      WHEN o.v <> n.v OR o.x <> n.x THEN 'U' END op
          FROM o FULL OUTER JOIN n ON o.pk = n.pk
        ) WHERE op IS NOT NULL ORDER BY pk
        """
    ).df()
    assert dict(zip(want["pk"], want["op"])) == got


def test_diff_roundtrip_through_lake(tmp_path):
    """old snapshot loaded, then diff events applied -> lake final state
    equals the new snapshot exactly (the CDC bootstrap loop)."""
    import pyarrow.compute as pc

    from go_datax_ray.pipelines.cdc_replay import DatasetEventSource, ReplayConfig, replay
    from go_datax_ray.pipelines.snapshot_diff import diff_snapshots
    from go_datax_ray.sinks.lake import read_lake_table

    old, new = _snapshots()
    diff = diff_snapshots(rd.from_arrow(old), rd.from_arrow(new), key="pk", n_buckets=4).to_pandas()

    def to_events(df: pd.DataFrame, base_lsn: int, base_ts: int) -> pa.Table:
        df = df.sort_values(["op", "pk"]).reset_index(drop=True)
        n = len(df)
        return pa.table(
            {
                "lsn": pa.array(range(base_lsn, base_lsn + n), pa.int64()),
                "src_offset": pa.array(range(base_lsn, base_lsn + n), pa.int64()),
                "op": pa.array(df["op"], pa.string()),
                "url": pa.array(df["pk"].astype(str), pa.string()),
                "warc_ts": pa.array([base_ts] * n, pa.timestamp("us")),
                "v": pa.array(df["v"].where(pd.notna(df["v"]), None), pa.string()),
                "x": pa.array(
                    [None if pd.isna(x) else int(x) for x in df["x"]], pa.int64()
                ),
            }
        )

    # epoch 1: the old snapshot as inserts
    old_df = old.to_pandas()
    old_df["op"] = "I"
    ev1 = to_events(old_df.rename(columns={}), 0, 1_000_000)
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(lake_dir=lake, num_partitions=4)
    replay(DatasetEventSource(rd.from_arrow(ev1), 0, len(old_df)), cfg)
    # epoch 2: the diff
    ev2 = to_events(diff, len(old_df), 2_000_000)
    replay(DatasetEventSource(rd.from_arrow(ev2), len(old_df), len(old_df) + len(diff)), cfg)

    final = read_lake_table(lake)
    got = {
        int(u): (v, x)
        for u, v, x in zip(
            final.column("url").to_pylist(),
            final.column("v").to_pylist(),
            final.column("x").to_pylist(),
        )
    }
    want = {
        int(pk): (v, x)
        for pk, v, x in zip(
            new.column("pk").to_pylist(), new.column("v").to_pylist(), new.column("x").to_pylist()
        )
    }
    assert got == want
